"""Sequence packing: assign documents to fixed token-budget bins.

Training pipelines pack documents into context windows ("fill each 8k-token
sequence with documents back to back").  The streamed-packing formulation is
deterministic and shuffle-cheap: fix a global document order, take the
running token total, and a document's bin is ``floor(exclusive_prefix /
budget)`` — each bin is a contiguous run of the order, full up to the
budget boundary (the standard concat-and-chunk packing; a bin's last
document may straddle into the next bin's budget, which the trainer's
chunker handles).

The primitive underneath is an EXACT GLOBAL PREFIX SUM — the classic
two-phase formulation, not a single-partition ``Window``:

  1. ``repartitionByRange(order)`` + ``sortWithinPartitions`` — one range
     shuffle of narrow rows; equal keys land in one partition so the global
     order is well-defined (callers pass a unique tiebreak column).
  2. per-partition totals: one tiny job over the checkpointed shuffle
     output (one long per partition to the driver).
  3. one ``mapInArrow`` pass adds the broadcast partition offset to the
     partition-local cumsum — vectorized, no Python per row.

A single-partition ``Window ORDER BY`` — what the naive SQL translation
produces — serializes 10^12 rows through one task; this plan's critical
path is one range shuffle plus an O(#partitions) driver exchange.

Reference parity: no counterpart in guava-probably (sketch library); this
is part of the prompt's training-data pipeline tier.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` in (``order_cols``)
    order, as a new BIGINT column; input column order is preserved.

    Null values count as 0.  The global order must be total — include a
    unique tiebreak column or equal-key rows receive an arbitrary (but
    deterministic per shuffle layout) relative order.
    """
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    arranged = (
        # try_cast: NULL and NaN weights both count as 0 (ANSI cast throws on NaN)
        df.withColumn("__gps_v", F.expr(f"coalesce(try_cast({value_col} as bigint), 0)"))
        .repartitionByRange(parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint()  # phase 2 + 3 both read this shuffle output
    )
    totals_rows = (
        arranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("__gps_v").alias("t"))
        .collect()
    )
    totals = {r.pid: r.t for r in totals_rows}
    n_parts = arranged.rdd.getNumPartitions()
    offsets = np.zeros(n_parts + 1, dtype=np.int64)
    for p in range(n_parts):
        offsets[p + 1] = offsets[p] + totals.get(p, 0)
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    out_fields = [f for f in arranged.schema.fields if f.name != "__gps_v"]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out_fields
    ) + f", {out_col} bigint"

    def add_offset(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        off = int(bc.value[TaskContext.get().partitionId()])
        acc = off
        for batch in batches:
            v = batch.column("__gps_v").to_numpy(zero_copy_only=False)
            run = acc + np.cumsum(v, dtype=np.int64)
            acc = int(run[-1]) if len(run) else acc
            cols = [batch.column(f.name) for f in out_fields]
            cols.append(pa.array(run, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                cols, names=[f.name for f in out_fields] + [out_col]
            )

    return arranged.mapInArrow(add_offset, schema)


def pack_sequences(
    df: DataFrame,
    order_cols: list[str],
    token_col: str,
    budget: int,
    bin_col: str = "bin",
    partitions: int | None = None,
) -> DataFrame:
    """Streamed packing: bin = exclusive-prefix-tokens div budget over the
    given deterministic order.  Bins are contiguous runs of the order,
    each full up to the budget boundary."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    run = prefix_sum(df, order_cols, token_col, out_col="__gps_run", partitions=partitions)
    # integer division, not float floor: running totals at 10^12-token scale
    # exceed double's 2^53 exact-integer range
    excl = f"(__gps_run - coalesce(try_cast({token_col} as bigint), 0))"
    return run.withColumn(bin_col, F.expr(f"{excl} div {budget}")).drop("__gps_run")


def concat_group_texts(
    df: DataFrame,
    key: str,
    order_col: str,
    text_col: str,
    sep: str = "\n",
    out_col: str = "text",
) -> DataFrame:
    """Flatten a group of rows into one ordered text per key — the
    multi-turn-transcript → single-training-sequence step (key=conv_id,
    order=turn_idx): (key, n_rows, text).

    One hash aggregation: ``collect_list(struct(order, text))`` builds the
    group unordered (partial aggregation runs map-side), ``sort_array``
    orders by the leading struct field, then a transform + array_join —
    all JVM, no window and no per-group Python.  Per-row text bytes pass
    through untouched, preserving the per-turn equality invariant under
    stable (key, order) ordering.

    Skew note: one group's turns must meet in one task (the output row IS
    the group) — bound the worst key's payload, not the key count; a
    10^5-turn conversation is ~10 MB, fine.
    """
    pair = F.struct(F.col(order_col).alias("o"), F.col(text_col).alias("t"))
    ordered = F.sort_array(F.collect_list(pair))
    return df.groupBy(key).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.array_join(F.transform(ordered, lambda x: x["t"]), sep).alias(out_col),
    )
