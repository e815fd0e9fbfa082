"""High-cardinality grouped KLL: one mergeable quantile sketch per key,
built with a single stable sort per partition and a cheap per-key segment
loop (no applyInPandas).

Why not fully vectorized like grouped_hll/grouped_cms: KLL compaction is a
sequential level process, so groups can't share one scatter. But the
1 ms/group cost of `build_grouped` is applyInPandas overhead (pandas
groupby + serialization), not sketch math. This operator:

  1. select (key, value→float64), drop nulls — narrow rows, the shuffle
     carries 8 bytes + key, never the payload;
  2. repartition(key): all of a key's values land in one partition;
  3. mapInArrow: dictionary-encode keys → codes; ONE stable argsort groups
     rows by key preserving arrival order; per key, `KllSketch.update`
     ingests the whole segment in vectorized chunks (~tens of µs/key,
     ~20-50× cheaper than the applyInPandas path — bench in
     BENCH/BASELINE.md).

Output rows are standard KllSketch blobs — mergeable with any other
KllSketch of the same k via `Sketch.from_bytes(...).merge(...)`. Unlike the
HLL/theta/CMS grouped packers, blobs are NOT byte-identical across
repartitionings: KLL is order-sensitive (which items survive compaction
depends on feed order). Estimates carry the same rank-error bound either
way; the byte-identity test pins the single-partition case where order
matches a local build.

When per-key rows are BOUNDED (e.g. turns per conversation), prefer the
exact `operators/grouped_quantiles` path — this operator is for unbounded
per-key streams where a mergeable bounded-size summary is the point.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F


def _build_stage(make_sketch):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        keys_parts, v_parts = [], []
        for batch in batches:
            key_arr = batch.column(0)
            val = batch.column(1)
            if val.null_count:
                keep = val.is_valid()
                key_arr = key_arr.filter(keep)
                val = val.drop_null()
            if len(val) == 0:
                continue
            arr = val.to_numpy(zero_copy_only=False).astype(np.float64)
            finite = ~np.isnan(arr)
            if not finite.all():
                # pandas-origin frames surface missing floats as NaN, not
                # null — treat both as absent (a NaN would poison quantiles)
                key_arr = key_arr.filter(pa.array(finite))
                arr = arr[finite]
            if len(arr) == 0:
                continue
            keys_parts.append(key_arr)
            v_parts.append(arr)
        if not keys_parts:
            return
        keys = pa.chunked_array(keys_parts).combine_chunks()
        v = np.concatenate(v_parts)
        from ._arrow_common import encode_keys

        uniq, codes = encode_keys(keys)
        order = np.argsort(codes, kind="stable")  # keeps arrival order per key
        sc = codes[order]
        sv = v[order]
        n_per = np.bincount(sc, minlength=len(uniq)).astype(np.int64)
        bounds = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(n_per, out=bounds[1:])
        blobs = []
        for i in range(len(uniq)):
            sk = make_sketch()
            sk.update(sv[bounds[i] : bounds[i + 1]])
            blobs.append(sk.to_bytes())
        yield pa.RecordBatch.from_arrays(
            [uniq, pa.array(blobs, type=pa.binary()), pa.array(n_per)],
            names=["key", "sketch", "n"],
        )

    return fn


def _grouped_value_sketch(
    df: DataFrame,
    key: str,
    col: str,
    make_sketch,
    partitions: int | None,
    assume_colocated: bool = False,
) -> DataFrame:
    key_type = df.schema[key].dataType.simpleString()
    narrow = df.select(F.col(key).alias("k"), F.col(col).cast("double").alias("v"))
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    colocated = narrow if assume_colocated else narrow.repartition(parts, "k")
    return colocated.mapInArrow(
        _build_stage(make_sketch), f"key {key_type}, sketch binary, n bigint"
    )


def grouped_kll(
    df: DataFrame,
    key: str,
    col: str,
    k: int = 200,
    partitions: int | None = None,
    assume_colocated: bool = False,
) -> DataFrame:
    """Per-key KllSketch at high key cardinality → (key, sketch, n).
    ``assume_colocated=True`` skips the repartition for input already
    partitioned by ``key`` — zero shuffle."""

    def make():
        from ..sketches.kll import KllSketch

        return KllSketch(k=k)

    return _grouped_value_sketch(df, key, col, make, partitions, assume_colocated)


def grouped_tdigest(
    df: DataFrame,
    key: str,
    col: str,
    delta: float = 200.0,
    partitions: int | None = None,
    assume_colocated: bool = False,
) -> DataFrame:
    """Per-key TDigestSketch at high key cardinality → (key, sketch, n) —
    same narrow shuffle + segment-loop architecture as ``grouped_kll``
    (t-digest centroids are order-sensitive the same way; see the module
    docstring for the byte-identity caveat)."""

    def make():
        from ..sketches.tdigest import TDigestSketch

        return TDigestSketch(delta=delta)

    return _grouped_value_sketch(df, key, col, make, partitions, assume_colocated)
