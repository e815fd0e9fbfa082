"""Local emulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark AND its
``oracle_sql()`` on DuckDB at sf0.01, sorts columns by name and rows by
value, and compares. Usage:

    python scripts/check_oracles.py [query ...]   # default: all queries
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
from guava_probably_spark.sources import TESTDATA_TABLES as TABLES  # noqa: E402


def _canon(v):
    if isinstance(v, float):
        # 9 SIGNIFICANT digits, not 9 decimals: parallel-vs-sequential
        # summation order legitimately differs at ~1e-15 relative, which an
        # absolute round cannot absorb on large-magnitude aggregates
        return float(f"{v:.9g}")
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _norm_arrow_type(t) -> str:
    """Collapse an Arrow type to the coarse tag the driver's value hash is
    sensitive to.  DuckDB returns HUGEINT (arrow decimal128(38,0)) for
    ``sum(BIGINT)`` while Spark returns bigint — identical values, different
    hash.  This check catches that class locally (VERDICT r2 item 1)."""
    import pyarrow as pa

    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_norm_arrow_type(t.value_type)}>"
    return str(t)


def _norm_spark_type(t) -> str:
    from pyspark.sql import types as T

    if isinstance(t, T.LongType):
        return "int64"
    if isinstance(t, T.IntegerType):
        return "int32"
    if isinstance(t, T.ShortType):
        return "int16"
    if isinstance(t, T.ByteType):
        return "int8"
    if isinstance(t, T.DoubleType):
        return "double"
    if isinstance(t, T.FloatType):
        return "float"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.TimestampType):
        return "timestamp"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, T.DecimalType):
        return f"decimal({t.precision},{t.scale})"
    if isinstance(t, T.ArrayType):
        return f"list<{_norm_spark_type(t.elementType)}>"
    return t.simpleString()


_ARROW_TO_SPARK = {"int64": "int64", "int32": "int32", "int16": "int16",
                   "int8": "int8", "float": "float", "halffloat": "float",
                   "double": "double", "bool": "bool"}


def _type_mismatches(spark_schema, arrow_schema):
    """Columns whose normalized type tags differ between the two sides."""
    s = {f.name: _norm_spark_type(f.dataType) for f in spark_schema.fields}
    bad = []
    for field in arrow_schema:
        d = _norm_arrow_type(field.type)
        d = _ARROW_TO_SPARK.get(d, d)
        sp = s.get(field.name)
        if sp is not None and sp != d:
            bad.append((field.name, sp, d))
    return bad


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: ANY total order works (both sides get the same
    # treatment), and repr never raises on None-vs-value comparisons the
    # way tuple ordering does on nullable columns
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in data), key=repr
    )


def main() -> int:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    failed = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, SF_DIR)
        s_cols = df.columns
        s_rows = _rows(s_cols, [tuple(r) for r in df.collect()])
        dt = time.time() - t0
        if name not in oracles:
            print(f"  {name:40s} rows-only ({len(s_rows)} rows, {dt:.1f}s)")
            continue
        res = con.execute(oracles[name])
        d_tbl = res.fetch_arrow_table()
        d_cols = d_tbl.column_names
        d_rows = _rows(
            d_cols,
            list(zip(*(c.to_pylist() for c in d_tbl.columns)))
            if d_tbl.num_columns
            else [],
        )
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_rows = s_rows == d_rows
        ty_bad = _type_mismatches(df.schema, d_tbl.schema) if ok_cols else []
        status = "OK" if (ok_cols and ok_rows and not ty_bad) else "MISMATCH"
        print(f"  {name:40s} {status} ({len(s_rows)} rows, {dt:.1f}s)")
        if ty_bad:
            failed.append(name)
            for col, sp, du in ty_bad:
                print(f"    type mismatch on '{col}': spark={sp} duckdb={du}")
            continue
        if not ok_cols:
            failed.append(name)
            print(f"    spark cols: {sorted(s_cols)}\n    duck  cols: {sorted(d_cols)}")
        elif not ok_rows:
            failed.append(name)
            sset, dset = set(s_rows), set(d_rows)
            for r in list(sset - dset)[:3]:
                print(f"    spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"    duck-only : {r}")
            if len(s_rows) != len(d_rows):
                print(f"    row counts: spark={len(s_rows)} duck={len(d_rows)}")
    spark.stop()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("all queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
