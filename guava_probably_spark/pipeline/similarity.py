"""Similarity search over embedding columns (array<float>).

Scale design:

- **cosine_topk** is the brute-force baseline done right for a cluster: the
  (small) query set is broadcast as a dense numpy matrix inside a
  ``mapInArrow`` closure; each input partition computes a blocked matmul and
  emits only its LOCAL top-k per query (k rows per query per partition, not
  n), so the final global top-k shuffle moves O(k · partitions · queries)
  rows regardless of table size. At 100 TB this is scan-bound — the shuffle
  is negligible.
- **hyperplane_signatures / cosine_neardup_pairs** is the scale path for
  all-pairs near-dup: sign-pattern bucketing (random hyperplanes) turns the
  O(n²) cross join into a per-bucket self-join, with exact cosine
  verification of candidates. Identical vectors always share a bucket
  (deterministic signatures ⇒ recall 1.0 for exact/near-exact copies).

Float discipline: scores are computed in float64 on both engines; oracle
queries return id pairs / ranks only (never raw float columns) so IEEE
noise cannot flip a value hash.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window, functions as F


def _mat(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 matrix from an arrow list<float> column — zero-copy
    through the flat values buffer (to_pylist costs a Python object per
    element; at 500k×128 floats that is the dominant cost of the scan)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def cosine_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id) for each query.

    Ties broken by ascending neighbor id (deterministic). Self-matches
    (neighbor_id == query_id) are excluded.
    """
    q_ids = np.asarray([q[0] for q in queries], dtype=np.int64)
    q_mat = np.asarray([q[1] for q in queries], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    out_schema = "query_id long, neighbor_id long, score double"

    def local_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) == 0:
                continue
            m = _mat(batch.column(1))
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            scores = q_norm @ m.T  # (n_q, n_rows)
            kk = min(k + 1, scores.shape[1])  # +1 to survive self-match removal
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            qi = np.repeat(q_ids, kk)
            ni = ids[part.ravel()]
            sc = np.take_along_axis(scores, part, axis=1).ravel()
            keep = ni != qi
            yield pa.RecordBatch.from_arrays(
                [pa.array(qi[keep]), pa.array(ni[keep]), pa.array(sc[keep])],
                names=["query_id", "neighbor_id", "score"],
            )

    local = emb.select(F.col(id_col).cast("long"), vec_col).mapInArrow(local_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def pca_project(
    emb: DataFrame,
    directions,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings onto k principal directions — the FD-sketch
    composition for ANN at scale: ``collect_sketch(emb, vec, fd)`` →
    ``sk.top_directions(k)`` → project 128-dim float32 vectors down to k
    dims, then run cosine_topk / IVF in the reduced space.

    One broadcast of the (k, d) matrix inside a ``mapInArrow`` closure;
    per-partition blocked matmul; output rebuilt as an Arrow list column
    from the flat values buffer (no per-row Python objects). The scan is the
    only cost — at 10^11 vectors the projected table is d/k× smaller, which
    is the win every downstream pass inherits.

    Exactness note: if the corpus is (numerically) rank ≤ k, FD's reduction
    is exact (shift = 0) and the projection preserves all pairwise inner
    products — verified in tests by top-k equality against the full-dim
    search."""
    v = np.ascontiguousarray(np.asarray(directions, dtype=np.float64))
    if v.ndim != 2:
        raise ValueError(f"directions must be (k, d), got shape {v.shape}")
    k = v.shape[0]
    out_schema = f"{id_col} long, {vec_col} array<float>"

    def stage(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            m = _mat(batch.column(1))
            proj = (m @ v.T).astype(np.float32)
            offsets = pa.array(np.arange(n + 1, dtype=np.int32) * k)
            lists = pa.ListArray.from_arrays(
                offsets, pa.array(proj.ravel(), type=pa.float32())
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).cast(pa.int64()), lists], names=[id_col, vec_col]
            )

    return emb.select(F.col(id_col).cast("long"), vec_col).mapInArrow(stage, out_schema)


def hyperplane_signatures(
    emb: DataFrame,
    n_planes: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) random-hyperplane sign signature (int bucket, n_planes bits).

    Hyperplanes are derived deterministically from (seed, dim) so every
    partition — and every rerun / checkpoint resume — buckets identically.
    """
    out_schema = "id long, bucket long"

    def sig(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        planes = None
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) == 0:
                continue
            m = _mat(batch.column(1))
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((m.shape[1], n_planes))
            bits = (m @ planes) > 0
            bucket = (bits.astype(np.int64) << np.arange(n_planes)[None, :]).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(bucket)], names=["id", "bucket"]
            )

    return emb.select(F.col(id_col).cast("long"), vec_col).mapInArrow(sig, out_schema)


def cosine_drop_stats(
    emb: DataFrame,
    n_planes: int = 16,
    max_bucket: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Skew-cap drop audit for ``cosine_neardup_pairs``: one-row
    (dropped_buckets, dropped_members) over the same hyperplane buckets —
    counts-only pass (no members arrays), same contract as
    ``dedup.banding_drop_stats``."""
    from .dedup import banding_drop_stats

    rows = hyperplane_signatures(emb, n_planes, id_col=id_col, vec_col=vec_col)
    return banding_drop_stats(rows.withColumnRenamed("bucket", "bk"), max_bucket)


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    max_bucket: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b) pairs with cosine ≥ threshold, a < b.

    LSH-bucketed candidate generation + exact float64 cosine verification.
    For exact/jittered copies (the near-dup case) sign patterns coincide,
    so recall is 1.0 WITHIN buckets of size ≤ ``max_bucket``; over-cap
    buckets (duplicate storms) are dropped — never silently: action
    ``cosine_drop_stats(emb, n_planes, max_bucket)`` (same signatures) to
    audit the dropped bucket/member counts, and route a storm through
    exact dedup on the raw vector bytes first or raise the cap. Borderline
    pairs at the threshold miss with the usual (1 − θ/π)^planes
    hyperplane probability.
    """
    sigs = hyperplane_signatures(emb, n_planes, id_col=id_col, vec_col=vec_col)
    vecs = emb.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v"))
    buckets = sigs.groupBy("bucket").agg(F.collect_list("id").alias("members"))
    cand = (
        buckets.filter((F.size("members") > 1) & (F.size("members") <= max_bucket))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(members, x -> "
                    "transform(filter(members, y -> y > x), y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    joined = (
        cand.join(vecs.withColumnRenamed("id", "a").withColumnRenamed("v", "va"), "a")
        .join(vecs.withColumnRenamed("id", "b").withColumnRenamed("v", "vb"), "b")
    )
    # float64 cosine via JVM-side higher-order functions (no Python in the
    # verify hot path): dot / (|a| |b|)
    dot = "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    na = "sqrt(aggregate(va, CAST(0.0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    nb = "sqrt(aggregate(vb, CAST(0.0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    return (
        joined.withColumn("cos", F.expr(f"{dot} / ({na} * {nb})"))
        .filter(F.col("cos") >= threshold)
        .select("a", "b")
    )
