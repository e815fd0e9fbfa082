"""Bucketed sketch store: persist grouped sketch tables pre-partitioned by
key so later merges/joins are co-located — no Exchange at read time.

The rollup/re-merge pattern over a 10^8-conv sketch table is join- and
merge-heavy: every `groupBy(key)` or key-join over a plain parquet sketch
table re-shuffles the blobs. Spark's bucketing (`bucketBy` + `saveAsTable`)
persists the hash-partitioning INTO the table layout, so reading two tables
bucketed the same way and joining/merging them by key produces a
SortMergeJoin with **zero Exchange operators** — the shuffle was paid once at
write time and amortizes over every subsequent pass (incremental daily sketch
merges, ANN codebook refreshes, per-conv rollups).

This matters at 10^12-turn scale: a day's incremental per-conv sketches
(~10^8 rows of KB blobs) merged into yesterday's store costs one co-located
merge-join instead of shuffling both sides every day.

Catalyst/Tungsten do the work: we only declare the layout. Bucket pruning
(`spark.sql.sources.bucketing.enabled`, on by default) also applies for
point lookups on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sketches import Sketch


def write_bucketed_sketches(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 64,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a (key, sketch, n, …) DataFrame bucketed+sorted by key.

    `buckets` fixes the layout contract: two tables written with the same
    (key, buckets) merge/join with no shuffle. Size it to the production
    cluster (buckets ≈ 2-4× executors), not the data. `path` makes the table
    external (data at an explicit location instead of the warehouse dir)."""
    w = (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def merge_sketch_tables(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
) -> DataFrame:
    """Merge two bucketed sketch tables by key: full outer co-located join,
    blob-merge where both sides present (vectorized pandas UDF over the
    joined rows), pass-through otherwise. With matching bucket layouts the
    physical plan contains no Exchange."""
    import pandas as pd

    from pyspark.sql.types import BinaryType

    def _merge_blobs(a, b):
        out = []
        for x, y in zip(a, b):
            if x is None:
                out.append(y)
            elif y is None:
                out.append(x)
            else:
                out.append(Sketch.from_bytes(x).merge(Sketch.from_bytes(y)).to_bytes())
        return pd.Series(out)

    merge_blobs = F.pandas_udf(_merge_blobs, BinaryType())

    left = spark.table(left_table).select(
        F.col(key), F.col("sketch").alias("_ls"), F.col("n").alias("_ln")
    )
    right = spark.table(right_table).select(
        F.col(key), F.col("sketch").alias("_rs"), F.col("n").alias("_rn")
    )
    joined = left.join(right, key, "full_outer")
    return joined.select(
        F.col(key),
        merge_blobs(F.col("_ls"), F.col("_rs")).alias("sketch"),
        (F.coalesce(F.col("_ln"), F.lit(0)) + F.coalesce(F.col("_rn"), F.lit(0))).alias("n"),
    )
