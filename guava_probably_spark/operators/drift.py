"""Blob-only drift reports between two grouped sketch tables.

The weekly-snapshot question at 100-TB scale — "which sources / languages /
tools shifted distribution between snapshot A and snapshot B?" — should
never rescan either corpus.  Both snapshots already have grouped sketch
tables (``grouped_kll`` / ``grouped_dd`` / ``build_grouped`` → one KB blob
per key), so the report is a KEY-ALIGNED JOIN OF BLOBS:

- :func:`ks_drift_report` — per-key Kolmogorov–Smirnov distance between
  two quantile-blob tables (``functions.ks_distance`` semantics: error ≤
  bound_a + bound_b + 2/grid).  A key present on only one side reports a
  NULL distance (the honest answer: there is nothing to compare) with the
  ``in_a``/``in_b`` flags saying which side is missing.
- :func:`share_drift_report` — per-(key, item) CERTIFIED share-change
  brackets between two Misra–Gries blob tables
  (``functions.mg_share_drift`` interval arithmetic: lo > 0 ⇒ the shift is
  real, not summary error).

Scale shape: keys are profiling dimensions (sources, langs, shards) — the
join is blob-rows only (KB × |keys|), never raw data; with high-cardinality
keys the join shuffles KB blobs per key, still no rescan.  The pair
computation is a pandas UDF over the two blob columns: decode cost per
Arrow batch amortizes through the module-level byte-keyed sketch cache.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)


def _aligned(a: DataFrame, b: DataFrame, key_cols: list[str], sketch_col: str):
    """Full-outer key-aligned blob pairs: (keys…, __a blob, __b blob)."""
    left = a.select(*key_cols, F.col(sketch_col).alias("__gp_a"))
    right = b.select(*key_cols, F.col(sketch_col).alias("__gp_b"))
    return left.join(right, key_cols, "full_outer")


def ks_drift_report(
    a: DataFrame,
    b: DataFrame,
    key_cols: str | list[str] = "key",
    sketch_col: str = "sketch",
) -> DataFrame:
    """(keys…, in_a, in_b, ks) per key — KS distance between the two
    snapshots' quantile blobs; NULL ks where either side is missing.
    Sort by ks descending and read the top as "what moved this week"."""
    from ..functions import sketch_ks

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    pairs = _aligned(a, b, keys, sketch_col)
    return pairs.select(
        *keys,
        F.col("__gp_a").isNotNull().alias("in_a"),
        F.col("__gp_b").isNotNull().alias("in_b"),
        sketch_ks()(F.col("__gp_a"), F.col("__gp_b")).alias("ks"),
    )


_SHARE_ROW = StructType(
    [
        StructField("item", StringType()),
        StructField("lo", DoubleType()),
        StructField("hi", DoubleType()),
    ]
)


@pandas_udf(ArrayType(_SHARE_ROW))
def _share_drift_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
    from ..functions import _cached_sketch, mg_share_drift

    out = []
    for ba, bb in zip(a, b):
        if ba is None or bb is None:
            out.append(None)  # one-sided key: nothing certifiable
            continue
        rows = mg_share_drift(_cached_sketch(bytes(ba)), _cached_sketch(bytes(bb)))
        out.append([(str(item), float(lo), float(hi)) for item, lo, hi in rows])
    return pd.Series(out, dtype="object")


def share_drift_report(
    a: DataFrame,
    b: DataFrame,
    key_cols: str | list[str] = "key",
    sketch_col: str = "sketch",
    min_hi: float = 0.0,
) -> DataFrame:
    """(keys…, item, lo, hi) — certified per-item share-change brackets
    between two grouped Misra–Gries blob tables, one row per (key, item)
    retained on either side, filtered to hi ≥ ``min_hi``.  Keys present on
    only one side are dropped (no certifiable bracket without both
    summaries — check membership with :func:`ks_drift_report`'s
    in_a/in_b or an anti-join first)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    pairs = _aligned(a, b, keys, sketch_col).filter(
        F.col("__gp_a").isNotNull() & F.col("__gp_b").isNotNull()
    )
    exploded = pairs.select(
        *keys,
        F.explode(_share_drift_pairs(F.col("__gp_a"), F.col("__gp_b"))).alias("__gp_d"),
    )
    out = exploded.select(
        *keys,
        F.col("__gp_d.item").alias("item"),
        F.col("__gp_d.lo").alias("lo"),
        F.col("__gp_d.hi").alias("hi"),
    )
    if min_hi > 0.0:
        out = out.filter(F.col("hi") >= F.lit(min_hi))
    return out
