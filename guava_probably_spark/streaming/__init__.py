"""Structured Streaming sketch operators (SURVEY.md §7 phase 9).

Sketches are natural streaming state: fixed-size, mergeable, order-
insensitive.  Two patterns:

1. ``incremental_sketch_sink`` — the foreachBatch workhorse: every micro-
   batch builds partial sketches (same mapInArrow pipeline as batch) and
   merges them into a persisted running sketch blob.  Restart-safe: the blob
   on disk is the state; merge idempotence (bloom/HLL) tolerates batch
   replays.

2. ``windowed_sketch_stream`` — event-time tumbling windows via
   ``applyInPandasWithState``: state = serialized sketch per window, updated
   per trigger, emitted in update mode; late data handled by the watermark.
"""

from __future__ import annotations

import os
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..sketches import Sketch, SketchSpec


def incremental_sketch_sink(
    stream_df: DataFrame,
    col: str,
    spec: SketchSpec,
    state_path: str,
    query_name: str = "sketch_stream",
    on_update: Callable[[Sketch, int], None] | None = None,
):
    """writeStream.foreachBatch sink that folds every micro-batch into one
    running sketch persisted at state_path (atomic rename per update)."""
    from ..operators.build import collect_sketch

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        part, n, _ = collect_sketch(batch_df, col, spec)
        if n == 0:
            return
        if os.path.exists(state_path):
            with open(state_path, "rb") as f:
                acc = Sketch.from_bytes(f.read())
            acc.merge(part)
        else:
            acc = part
        tmp = state_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(acc.to_bytes())
        os.replace(tmp, state_path)
        if on_update is not None:
            on_update(acc, n)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .outputMode("update")
    )


_OUT_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("sketch", BinaryType()),
        StructField("n", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("sketch", BinaryType()), StructField("n", LongType())]
)


def windowed_sketch_stream(
    stream_df: DataFrame,
    ts_col: str,
    col: str,
    spec: SketchSpec,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-event-time-window sketches as a streaming DataFrame
    (window_start, sketch binary, n) — update mode, custom state via
    applyInPandasWithState (the custom stateful operator of SURVEY.md §2.3)."""

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            blob, n = state.get
            sk = Sketch.from_bytes(bytes(blob))
        else:
            sk, n = spec.create(), 0
        for pdf in pdfs:
            vals = pdf[col].dropna()
            if len(vals):
                sk.update(vals)
                n += int(len(vals))
        state.update((sk.to_bytes(), n))
        yield pd.DataFrame(
            {"window_start": [key[0]], "sketch": [sk.to_bytes()], "n": [n]}
        )

    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("_w", F.window(F.col(ts_col), window).getField("start"))
        .select("_w", col)
        .groupBy("_w")
    )
    return keyed.applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
