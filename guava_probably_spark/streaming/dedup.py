"""Streaming deduplication: Bloom-of-fingerprints over micro-batches.

The canonical streaming-dedup problem: emit each document once, where
"same" means same normalization fingerprint, across an unbounded stream.
Exact state (a set of all fingerprints) grows without bound; a Bloom filter
holds it in fixed memory with a controlled false-positive (= over-drop)
rate and zero false negatives (= no duplicate ever passes as new when the
filter has seen it).

Pattern: ``foreachBatch`` — per micro-batch,

1. compute fingerprints (same ``md5_fingerprint_expr`` as batch dedup),
2. drop rows whose fp the running Bloom filter already contains
   (broadcast probe UDF — JVM→Arrow batch, no per-row Python),
3. drop intra-batch duplicates exactly (first doc_id per fp),
4. feed survivors to the user's sink callback,
5. fold the survivors' fingerprints into the filter and persist it
   (atomic rename — restart-safe; replayed batches re-probe against the
   already-updated filter, so replays cannot double-emit: at-most-once per
   fingerprint across restarts).

At cluster scale the filter blob (a few hundred MB at fpp 1e-3 for 10^9
docs) lives on shared storage and is broadcast per batch; the probe cost is
one vectorized murmur3 pass per micro-batch.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, Window, functions as F

from guava_probably_spark.pipeline import textexpr
from guava_probably_spark.sketches import Sketch, SketchSpec


def _fp_col() -> F.Column:
    return F.expr(textexpr.md5_fingerprint_expr("text", "spark"))


def dedup_batch_incremental(
    batch_df: DataFrame,
    state_path: str,
    capacity: int = 1_000_000,
    fpp: float = 0.001,
) -> DataFrame:
    """Dedup one batch against (and then into) the persisted Bloom state.

    Returns the survivors (first occurrence of each new fingerprint, with
    the helper column removed). The returned frame reads from a CACHE this
    function materialized and the caller OWNS: call ``release_batch(out)``
    when done (the streaming sink does; ``out.unpersist()`` alone would
    no-op — the cache belongs to the pre-projection plan). Shared core of
    the streaming sink and incremental daily-drop batch jobs.
    """
    spark = batch_df.sparkSession
    with_fp = batch_df.withColumn("_fp", _fp_col())
    bc = None
    if os.path.exists(state_path):
        with open(state_path, "rb") as f:
            bloom = Sketch.from_bytes(f.read())
        from guava_probably_spark.functions import might_contain_udf_from_broadcast

        # explicit broadcast handle: unpersisted in the finally, or each
        # micro-batch pins one more copy of a filter that the docstring
        # sizes at hundreds of MB on every executor for the query lifetime
        bc = spark.sparkContext.broadcast(bloom.to_bytes())
        probe = might_contain_udf_from_broadcast(bc)
        fresh = with_fp.filter(~probe(F.col("_fp")))
    else:
        bloom = SketchSpec("bloom", {"capacity": capacity, "fpp": fpp}).create()
        fresh = with_fp
    # exact intra-batch dedup: keep the first doc_id per fingerprint; CACHE
    # the survivors so the state fold below and the caller's consumption
    # share one execution of the probe pipeline
    w = Window.partitionBy("_fp").orderBy("doc_id")
    survivors = (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .cache()
    )
    try:
        # fold survivor fingerprints into the state DISTRIBUTED: per-partition
        # bloom partials + tree merge — only sketch blobs reach the driver.
        # (The original collect() of every survivor fingerprint was the one
        # driver-side bottleneck in this operator: a large micro-batch at
        # cluster scale would ship millions of 32-char strings to the driver
        # and update the filter single-threaded.) Same (capacity, fpp) spec
        # as the persisted state ⇒ identical geometry ⇒ OR-merge; changing
        # capacity/fpp between runs raises IncompatibleSketchError by design.
        from guava_probably_spark.operators import collect_sketch

        batch_bloom, n_new, _ = collect_sketch(
            survivors, "_fp", SketchSpec("bloom", {"capacity": capacity, "fpp": fpp})
        )
        if n_new:
            bloom.merge(batch_bloom)
            tmp = state_path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(bloom.to_bytes())
            os.replace(tmp, state_path)
        # the collect_sketch above materialized the cache; the returned
        # projection reads from it without re-running the probe
        out = survivors.drop("_fp")
        out._gps_cached_parent = survivors  # release_batch() unpersists this
        return out
    except BaseException:
        survivors.unpersist()
        raise
    finally:
        if bc is not None:
            # executor copies freed; the driver value stays re-fetchable in
            # case a cache-evicted partition must recompute the probe
            bc.unpersist()


def release_batch(out) -> None:
    """Unpersist the cache backing a ``dedup_batch_incremental`` result —
    the cache lives on the pre-projection plan, so ``out.unpersist()``
    alone would not release it."""
    cached = getattr(out, "_gps_cached_parent", None)
    (cached if cached is not None else out).unpersist()


def dedup_stream_sink(
    stream_df: DataFrame,
    state_path: str,
    capacity: int = 1_000_000,
    fpp: float = 0.001,
    on_batch: Callable[[DataFrame, int], None] | None = None,
    query_name: str = "dedup_stream",
):
    """writeStream.foreachBatch sink deduplicating on text fingerprint.

    ``stream_df`` must carry ``text`` and a stable ``doc_id``; survivors go
    to ``on_batch``. Returns the StreamingQuery.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = dedup_batch_incremental(batch_df, state_path, capacity, fpp)
        try:
            if on_batch is not None:
                on_batch(out, batch_id)
        finally:
            release_batch(out)

    return (
        stream_df.writeStream.outputMode("update")
        .queryName(query_name)
        .foreachBatch(handle)
        .start()
    )
