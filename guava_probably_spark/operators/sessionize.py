"""Batch sessionization — the Catalyst-native twin of
streaming.session_sketch_stream.

Assigns an inactivity-gap session id per (key, ordered-by-ts) with pure
built-in expressions (lag + cumsum over a window): whole-stage codegen, one
shuffle on the key, no Python. Downstream, sessions are just another group
key for the sketch builders (`build_grouped(df, [key, "session_id"], ...)`).

SQL equivalence (same formulation DuckDB runs for the oracle):

    SUM(CASE WHEN ts - lag(ts) > gap THEN 1 ELSE 0 END)
        OVER (PARTITION BY key ORDER BY ts)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Adds `session_id` (0-based per key): a new session starts when the
    time since the key's previous event exceeds `gap`."""
    import pandas as pd

    # microsecond precision: a whole-second cast floors the timestamps, so
    # sub-second gaps degenerate ('500 milliseconds' → 0 ⇒ same-second
    # events always split) and boundaries near the gap misclassify by up
    # to ~1 s against a full-precision oracle
    gap_us = int(pd.to_timedelta(gap).total_seconds() * 1_000_000)
    w = Window.partitionBy(key).orderBy(ts)
    # NTZ timestamps (common from parquet) can't pass straight to
    # unix_micros; normalizing through TIMESTAMP first is a no-op for LTZ
    micros = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(micros).over(w)
    new_session = (prev.isNull() | (micros - prev > F.lit(gap_us))).cast("long")
    # first row's null-lag marks session 0; cumsum-1 keeps ids 0-based
    return df.withColumn("session_id", F.sum(new_session).over(w) - F.lit(1))
