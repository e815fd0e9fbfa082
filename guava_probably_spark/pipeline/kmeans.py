"""Distributed spherical k-means + SemDeDup-style semantic deduplication.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) removes *semantic*
duplicates — paraphrases, re-encodes, boilerplate variants — that byte- and
shingle-level dedup (exact / MinHash / SimHash) cannot see: cluster the
embedding corpus with k-means, then search for high-cosine pairs only
WITHIN each cluster, never across the full corpus.

Spark-first shape (no reference analogue; guava-probably has no vector
operators — SURVEY.md §2.3 maps this tier to the pipeline extensions):

1. **fit** (``kmeans_fit``): Lloyd iterations where each pass is ONE
   ``mapInArrow`` scan emitting a single per-partition partial blob
   (counts[k] int64 + sums[k×d] float64 + sse + n ≈ k·d·8 bytes). Partials
   are elementwise-additive, so they fold through the same treeAggregate
   shape as the sketch pipeline (``fanin``-ary repartition stages) — the
   driver ever sees ≤ fanin blobs, never rows. A 100 TB corpus shuffles
   nothing: per iteration it is scan + k·d·8·P bytes of partials.
2. **assign**: reuses :func:`ivf.assign_lists` — one broadcast-codebook
   matmul pass tagging every vector with its nearest centroid.
3. **pairs** (``semantic_dedup_pairs``): per-cluster exact pairwise cosine
   via ``applyInArrow`` — the cluster's (n_c, d) matrix is one numpy matmul
   (a 2000-member cluster is a 4M-entry sim matrix, ~1 GFLOP-μs), emitting
   only pairs ≥ threshold. No candidate-pair row explosion and no
   vector join-back, unlike the banded-LSH path: the only shuffle is the
   (id, vec) rows hash-partitioned by cluster id. Oversize clusters
   (duplicate storms / too-small k) are dropped with an auditable stats
   row, the same never-silent cap discipline as every banding join here
   (``semantic_drop_stats``).
4. **dedup** (``semantic_dedup``): pairs → shared connected-components →
   keep-canonical (min id per component).

Determinism class: float64 partial sums are added in collection order, so
centroids are bit-stable for a fixed partitioning and ulp-stable across
partitionings (documented class of KLL/t-digest, not the blob-equality
class of bloom/HLL); the pair set is robust to that because membership is
decided by an exact float64 cosine against a threshold, not by blob bytes.

Scale notes (100 TB): ``iters`` full scans dominate — persist the projected
``(id, vec)`` columns or fit on a uniform sample (centroids from a 1%
sample are statistically indistinguishable for dedup blocking); pick
``k ≈ corpus_rows / target_cluster_size`` so per-cluster work stays one
task-local matmul, and write the assigned table ``partitionBy(cluster)``
so re-runs prune at file level (same posture as IVF lists).
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from guava_probably_spark.pipeline.ivf import assign_lists
from guava_probably_spark.pipeline.similarity import _mat

_MAGIC = b"KMPS"
_HDR = "<iiqd"
_HDR_LEN = 4 + struct.calcsize(_HDR)


def _pack_partial(counts: np.ndarray, sums: np.ndarray, sse: float, n: int) -> bytes:
    k, d = sums.shape
    return b"".join(
        (
            _MAGIC,
            struct.pack(_HDR, k, d, n, sse),
            np.ascontiguousarray(counts, dtype="<i8").tobytes(),
            np.ascontiguousarray(sums, dtype="<f8").tobytes(),
        )
    )


def _unpack_partial(blob: bytes) -> tuple[np.ndarray, np.ndarray, float, int]:
    if blob[:4] != _MAGIC:
        raise ValueError("corrupt k-means partial blob")
    k, d, n, sse = struct.unpack_from(_HDR, blob, 4)
    if not (0 < k <= 1 << 24 and 0 < d <= 1 << 20):
        raise ValueError("implausible k-means partial geometry")
    need = _HDR_LEN + 8 * k + 8 * k * d
    if len(blob) != need:
        raise ValueError("corrupt k-means partial blob (length)")
    counts = np.frombuffer(blob, "<i8", k, _HDR_LEN).copy()
    sums = np.frombuffer(blob, "<f8", k * d, _HDR_LEN + 8 * k).reshape(k, d).copy()
    return counts, sums, float(sse), int(n)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _partial_stage(cb: np.ndarray):
    """One Lloyd E+partial-M step over a partition → one partial blob row.

    Segment-sum via stable argsort + ``np.add.reduceat`` (vectorized; the
    naive ``np.add.at`` scatter is an order of magnitude slower at wide d).
    """
    k, _d = cb.shape

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cb)
        sse = 0.0
        n = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            mn = _normalize_rows(_mat(batch.column(0)))
            sim = mn @ cb.T
            a = sim.argmax(axis=1)
            order = np.argsort(a, kind="stable")
            sa = a[order]
            starts = np.concatenate(([0], np.flatnonzero(np.diff(sa)) + 1))
            uniq = sa[starts]
            sums[uniq] += np.add.reduceat(mn[order], starts, axis=0)
            counts[uniq] += np.diff(np.concatenate((starts, [len(sa)])))
            sse += float((1.0 - sim[np.arange(len(a)), a]).sum())
            n += len(a)
        if n == 0:
            return
        yield pa.RecordBatch.from_pydict({"p": [_pack_partial(counts, sums, sse, n)]})

    return fn


def _merge_partials(blobs) -> tuple[np.ndarray, np.ndarray, float, int] | None:
    acc = None
    for blob in blobs:
        c, s, e, n = _unpack_partial(blob)
        if acc is None:
            acc = [c, s, e, n]
        else:
            acc[0] += c
            acc[1] += s
            acc[2] += e
            acc[3] += n
    return None if acc is None else (acc[0], acc[1], acc[2], acc[3])


def _merge_stage():
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = _merge_partials(
            blob for batch in batches for blob in batch.column(0).to_pylist()
        )
        if acc is None:
            return
        yield pa.RecordBatch.from_pydict({"p": [_pack_partial(*acc)]})

    return fn


def _kmeanspp_init(m: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic k-means++ (Arthur & Vassilvitskii 2007) over a
    unit-norm sample matrix: D²-weighted greedy seeding with spherical
    distance D² = 1 − cos. Random init collapses planted clusters onto one
    centroid often enough to matter for dedup blocking; ++ seeding is the
    standard fix and is O(k·|sample|·d) on the driver sample only."""
    rng = np.random.default_rng(seed)
    out = np.empty((min(k, len(m)), m.shape[1]))
    out[0] = m[rng.integers(len(m))]
    d2 = np.maximum(1.0 - m @ out[0], 0.0)
    for i in range(1, len(out)):
        total = d2.sum()
        if total <= 0:  # all sample points already covered: reuse any row
            out[i:] = m[rng.integers(len(m), size=len(out) - i)]
            break
        pick = np.searchsorted(np.cumsum(d2), rng.random() * total)
        out[i] = m[min(pick, len(m) - 1)]
        d2 = np.minimum(d2, np.maximum(1.0 - m @ out[i], 0.0))
    return out


def kmeans_fit(
    emb: DataFrame,
    k: int = 64,
    iters: int = 10,
    seed: int = 11,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fanin: int = 64,
) -> tuple[np.ndarray, dict]:
    """Spherical k-means: (k, d) unit-norm float64 centroids + fit info.

    Init = deterministic k-means++ over the same hash-ordered 50·k driver
    sample :func:`ivf.train_codebook` uses, plus two sample-side Lloyd
    rounds of polish; then ``iters`` distributed rounds, each one full
    scan + a fanin-ary fold of k·d·8-byte partial blobs. Stops early when
    the max centroid movement (L2) drops below ``tol``. Empty clusters
    keep their previous centroid (standard Lloyd, deterministic).

    ``info``: iters run, total rows n, and per-iteration history of
    mean spherical SSE (mean 1−cos to the assigned centroid — monotone
    non-increasing up to float noise) and max centroid movement.
    """
    from .ivf import hash_ordered_sample, lloyd_rounds

    m = hash_ordered_sample(emb, 50 * k, id_col, vec_col, seed)
    if not len(m):
        raise ValueError("kmeans_fit: input has no rows")
    cb = _kmeanspp_init(m, k, seed)
    # sample-side polish before paying full scans
    cb = lloyd_rounds(m, cb, 2)
    if len(cb) < k:  # tiny input: pad by repeating rows so geometry is stable
        cb = cb[np.arange(k) % len(cb)]
    vec_only = emb.select(vec_col)
    history: list[dict] = []
    n_total = 0
    for _ in range(iters):
        parts = vec_only.mapInArrow(_partial_stage(cb), "p binary")
        p = parts.rdd.getNumPartitions()
        while p > fanin:
            p = max(1, math.ceil(p / fanin))
            parts = parts.repartition(p).mapInArrow(_merge_stage(), "p binary")
        acc = _merge_partials(r.p for r in parts.collect())
        if acc is None:
            raise ValueError("kmeans_fit: input has no rows")
        counts, sums, sse, n_total = acc
        new = cb.copy()
        nz = counts > 0
        new[nz] = _normalize_rows(sums[nz] / counts[nz, None])
        moved = float(np.linalg.norm(new - cb, axis=1).max())
        cb = new
        history.append({"mean_cos_dist": sse / max(n_total, 1), "moved": moved})
        if moved < tol:
            break
    return cb, {"iters": len(history), "n": n_total, "history": history}


def assign_clusters(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, vec_col): nearest-centroid tag per vector (one
    broadcast matmul pass — :func:`ivf.assign_lists` with k-means names)."""
    return assign_lists(emb, centroids, id_col=id_col, vec_col=vec_col).withColumnRenamed(
        "list_id", "cluster"
    )


def _cluster_pair_stage(
    threshold: float, max_cluster: int, vec_col: str, block: int = 1024
):
    def fn(table: pa.Table) -> pa.Table:
        ids = table.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
        if len(ids) < 2 or len(ids) > max_cluster:
            return empty
        mn = _normalize_rows(_mat(table.column(vec_col)))
        n = len(ids)
        # row-blockwise upper triangle: peak memory is O(block·n) — a
        # near-cap cluster (n = 20k) costs ~160 MB per block instead of
        # the ~8 GB an n×n sim + triu_indices materialization would take
        blk = max(1, min(n, block))
        a_parts, b_parts, c_parts = [], [], []
        for i0 in range(0, n - 1, blk):
            i1 = min(i0 + blk, n)
            sim = mn[i0:i1] @ mn.T  # (i1-i0, n)
            hit_r, hit_c = np.nonzero(sim >= threshold)
            gr = hit_r + i0
            keep = hit_c > gr  # strict upper triangle in global indices
            if not keep.any():
                continue
            a = ids[gr[keep]]
            b = ids[hit_c[keep]]
            a_parts.append(np.minimum(a, b))
            b_parts.append(np.maximum(a, b))
            c_parts.append(sim[hit_r[keep], hit_c[keep]])
        if not a_parts:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts)),
                "b": pa.array(np.concatenate(b_parts)),
                "cos": pa.array(np.concatenate(c_parts)),
            }
        )

    return fn


def semantic_dedup_pairs(
    emb: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    max_cluster: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cos) with cosine ≥ threshold and a < b, searched within
    k-means clusters only (the SemDeDup blocking step).

    One shuffle (rows by cluster id), one numpy matmul per cluster, zero
    candidate-row explosion. Pairs split across clusters are missed by
    design — that is the semdedup recall trade; raise k-means quality or
    lower k to tighten it. Oversize clusters are skipped, never silently:
    audit with :func:`semantic_drop_stats` on the same assignment.
    """
    assigned = assign_clusters(emb, centroids, id_col=id_col, vec_col=vec_col)
    return (
        assigned.select("cluster", "id", vec_col)
        .groupBy("cluster")
        .applyInArrow(
            _cluster_pair_stage(threshold, max_cluster, vec_col),
            "a long, b long, cos double",
        )
    )


def semantic_drop_stats(
    emb: DataFrame,
    centroids: np.ndarray,
    max_cluster: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row (dropped_buckets, dropped_members): clusters over the
    ``max_cluster`` cap that :func:`semantic_dedup_pairs` skipped —
    counts-only pass, same contract as ``dedup.banding_drop_stats``."""
    from guava_probably_spark.pipeline.dedup import banding_drop_stats

    rows = assign_clusters(emb, centroids, id_col=id_col, vec_col=vec_col).select(
        "id", F.col("cluster").cast("long").alias("bk")
    )
    return banding_drop_stats(rows, max_cluster)


def semantic_dedup(
    emb: DataFrame,
    k: int = 64,
    threshold: float = 0.95,
    max_cluster: int = 20_000,
    iters: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """The full SemDeDup pass: rows of ``emb`` surviving semantic dedup
    (per near-dup component, the min-id row is kept; everything else
    drops). Pass ``centroids`` to reuse a fitted codebook across runs."""
    from guava_probably_spark.pipeline.components import (
        connected_components,
        keep_canonical,
    )

    if centroids is None:
        centroids, _ = kmeans_fit(
            emb, k=k, iters=iters, seed=seed, id_col=id_col, vec_col=vec_col
        )
    pairs = semantic_dedup_pairs(
        emb, centroids, threshold, max_cluster, id_col=id_col, vec_col=vec_col
    )
    comps = connected_components(pairs.select("a", "b"))
    out = keep_canonical(
        emb.withColumn(id_col, F.col(id_col).cast("long")), id_col, comps
    )
    return out
