"""Mini-driver: run every __spark_entry__ query against its DuckDB oracle the
same way the real driver does (row count + schema + order-insensitive value
comparison) at sf0.001 (sf0.01 is the driver's scale; 0.001 keeps CI fast —
the queries are scale-free self-checks).
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r.within for r in rows), rows


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, oracle_con, name):
    q = entrymod.queries()[name]
    spark_df = q(spark, SF_DIR).toPandas()
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"{name} has no oracle"
    oracle_df = oracle_con.execute(sql).fetchdf()
    s, o = _normalize(spark_df), _normalize(oracle_df)
    assert list(s.columns) == list(o.columns), f"{name}: columns {list(s.columns)} != {list(o.columns)}"
    assert len(s) == len(o), f"{name}: row count {len(s)} != {len(o)}"
    for col in s.columns:
        sv, ov = s[col], o[col]
        if sv.dtype.kind in "fc" or ov.dtype.kind in "fc":
            pd.testing.assert_series_equal(
                sv.astype(float), ov.astype(float), check_names=False, atol=1e-9
            )
        else:
            assert (
                sv.astype(str).tolist() == ov.astype(str).tolist()
            ), f"{name}: value mismatch in {col}"
