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

3. ``session_sketch_stream`` — per-key SESSION windows (inactivity gap) via
   ``applyInPandasWithState`` + EventTimeTimeout: a session's sketch grows
   while events keep arriving within `gap` of the last one; when the
   watermark passes last_event + gap the timeout fires, the closed session
   (key, start, end, sketch, n) is emitted in append mode and its state is
   removed. "Distinct tools used in each conversation session" at
   transcript scale.
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
    weight_col: str | None = None,
):
    """writeStream.foreachBatch sink that folds every micro-batch into one
    running sketch persisted at state_path (atomic rename per update).

    ``weight_col`` routes to the two-column weighted build — the live
    sliding-distinct counter: ``incremental_sketch_sink(stream, "user_id",
    SketchSpec("shll", {"p": 14}), path, weight_col="ts_epoch")`` maintains
    ONE blob from which ``shll_window(sketch, W)`` answers "distinct users
    in the last W" at ANY moment (tuple-sketch running totals work the
    same way). Merge associativity makes the fold restart-safe: replayed
    micro-batches re-merge idempotently for the byte-canonical kinds."""
    from ..operators.build import collect_sketch, collect_weighted_sketch

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if weight_col is not None:
            part, n, _ = collect_weighted_sketch(batch_df, col, weight_col, spec)
        else:
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

    win_ms = int(pd.to_timedelta(window).total_seconds() * 1000)

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # the watermark passed this window's end: no on-time row can
            # arrive anymore, so evict the state (update mode has already
            # emitted the window's latest sketch). Without eviction the
            # state store grows by one window key forever — unbounded on
            # an unbounded stream.
            state.remove()
            return
        if state.exists:
            blob, n = state.get
            sk = Sketch.from_bytes(bytes(blob))
        else:
            sk, n = spec.create(), 0
        # arbitrary-stateful operators do NOT auto-drop late input rows (the
        # watermark only drives timeouts/eviction) — enforce the late-data
        # contract explicitly against the current watermark
        wm_ms = state.getCurrentWatermarkMs()
        updated = False
        for pdf in pdfs:
            if wm_ms > 0:
                ts_ms = pd.to_datetime(pdf[ts_col]).astype("int64") // 10**6
                pdf = pdf[ts_ms >= wm_ms]
            vals = pdf[col].dropna()
            if len(vals):
                sk.update(vals)
                n += int(len(vals))
                updated = True
        if not (updated or state.exists):
            return  # all rows were late for a window with no prior state
        state.update((sk.to_bytes(), n))
        end_ms = int(pd.Timestamp(key[0]).value // 10**6) + win_ms
        # timeout must sit strictly past the current watermark
        state.setTimeoutTimestamp(max(end_ms, wm_ms + 1))
        yield pd.DataFrame(
            {"window_start": [key[0]], "sketch": [sk.to_bytes()], "n": [n]}
        )

    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("_w", F.window(F.col(ts_col), window).getField("start"))
        # the watermark attribute (ts_col) must SURVIVE the projection or
        # Spark cannot filter late rows before the stateful operator —
        # dropping it silently disables late-data semantics (caught by
        # test_windowed_stream_drops_late_data_past_watermark)
        .select("_w", ts_col, col)
        .groupBy("_w")
    )
    return keyed.applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.EventTimeTimeout
    )


_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("sketch", BinaryType()),
        StructField("n", LongType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
    ]
)


def session_sketch_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    col: str,
    spec: SketchSpec,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key session-window sketches (inactivity gap): emits one row per
    CLOSED session (append mode) — (key, session_start, session_end, sketch,
    n). A session closes when the event-time watermark passes its last event
    + `gap` (EventTimeTimeout). State per open session is one sketch blob —
    fixed-size regardless of session length."""
    gap_ms = int(pd.to_timedelta(gap).total_seconds() * 1000)
    key_field = stream_df.schema[key_col]
    out_schema = StructType(
        [
            StructField(key_col, key_field.dataType),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("sketch", BinaryType()),
            StructField("n", LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            blob, n, s_ms, e_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [pd.Timestamp(s_ms, unit="ms")],
                    "session_end": [pd.Timestamp(e_ms, unit="ms")],
                    "sketch": [bytes(blob)],
                    "n": [n],
                }
            )
            return
        if state.exists:
            blob, n, s_ms, e_ms = state.get
            sk = Sketch.from_bytes(bytes(blob))
        else:
            sk, n, s_ms, e_ms = spec.create(), 0, None, None
        # drop late rows explicitly (same contract as windowed_sketch_stream):
        # a late event must not resurrect an already-emitted session
        wm_ms = state.getCurrentWatermarkMs()
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            if wm_ms > 0:
                keep = (ts.astype("int64") // 10**6) >= wm_ms
                pdf = pdf[keep.to_numpy()]
                ts = ts[keep]
            if len(pdf) == 0:
                continue
            vals = pdf[col].dropna()
            if len(vals):
                sk.update(vals)
                n += int(len(vals))
            lo = int(ts.min().value // 10**6)
            hi = int(ts.max().value // 10**6)
            s_ms = lo if s_ms is None else min(s_ms, lo)
            e_ms = hi if e_ms is None else max(e_ms, hi)
        if s_ms is None:
            return
        state.update((sk.to_bytes(), n, s_ms, e_ms))
        # event-time timeout must sit beyond the current watermark
        state.setTimeoutTimestamp(max(e_ms + gap_ms, state.getCurrentWatermarkMs() + 1))

    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .select(key_col, ts_col, col)
        .groupBy(key_col)
    )
    return keyed.applyInPandasWithState(
        fn, out_schema, _SESSION_STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )
