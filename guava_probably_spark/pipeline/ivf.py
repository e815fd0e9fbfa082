"""IVF (inverted-file) approximate nearest neighbor — the scale path.

Brute-force cosine top-k scans every vector per query; at 10^11 vectors that
is the wrong physical plan even though the shuffle is cheap. IVF trades
recall for a ~``nlist/nprobe``× scan reduction:

1. **train**: sample ~``50·nlist`` vectors to the driver, run a few Lloyd
   iterations with a deterministic seed (k-means on a sample is the standard
   IVF construction — the codebook is tiny, ``nlist × dim`` floats).
2. **assign**: broadcast the codebook; one ``mapInArrow`` pass tags every
   vector with its nearest centroid (``list_id``). Written out partitioned
   by ``list_id``, this gives partition pruning on later probes.
3. **search**: per query, pick the ``nprobe`` nearest centroids and scan
   only those lists — a partition-pruned scan + partition-local top-k, the
   same O(k·parts) merge as the brute-force path.

Determinism: sampling uses a fixed seed + ``orderBy(id)`` tiebreak, so
train → assign → search reproduces bit-identically across runs and resumes
(the same property the sketch checkpoints guarantee).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window, functions as F

from guava_probably_spark.pipeline.similarity import _mat


def hash_ordered_sample(
    emb: DataFrame, n: int, id_col: str, vec_col: str, seed: int
) -> np.ndarray:
    """Deterministic driver-side sample: the top-``n`` rows by
    ``xxhash64(id, seed)`` — seeded pseudo-random but order-stable —
    returned as a unit-norm float64 matrix. The single home for the
    sampler :func:`train_codebook` and ``kmeans.kmeans_fit`` share, so
    the two can't silently drift (seed mixing, normalization epsilon)."""
    rows = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id").cast("string"), F.lit(seed)))
        .limit(n)
        .collect()
    )
    if not rows:
        return np.zeros((0, 0), dtype=np.float64)
    m = np.asarray([r.v for r in rows], dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    return m


def lloyd_rounds(m: np.ndarray, centroids: np.ndarray, iters: int) -> np.ndarray:
    """Sample-side spherical Lloyd: assign → mean → renormalize, in place
    on ``centroids``. Empty clusters keep their previous centroid
    (standard Lloyd, deterministic)."""
    for _ in range(iters):
        assign = (m @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = m[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30
        )
    return centroids


def train_codebook(
    emb: DataFrame,
    nlist: int = 64,
    iters: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(nlist, dim) float64 L2-normalized centroids from a driver-side sample.

    The sample is tiny (50·nlist rows) and the loop is numpy — the only
    driver-side compute in the IVF pipeline, identical on every run.
    """
    m = hash_ordered_sample(emb, 50 * nlist, id_col, vec_col, seed)
    rng = np.random.default_rng(seed)
    centroids = m[rng.choice(len(m), size=min(nlist, len(m)), replace=False)]
    return lloyd_rounds(m, centroids, iters)


def assign_lists(
    emb: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id, embedding): tag every vector with its nearest centroid.

    One broadcast matmul per Arrow batch; at cluster scale, write the result
    ``partitionBy("list_id")`` so probes prune at the file-listing level.
    """
    cb = codebook.astype(np.float64)
    out_schema = f"id long, list_id int, {vec_col} array<float>"

    def tag(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) == 0:
                continue
            m = _mat(batch.column(1))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            lid = (mn @ cb.T).argmax(axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(lid), batch.column(1)],
                names=["id", "list_id", vec_col],
            )

    return emb.select(F.col(id_col).cast("long"), vec_col).mapInArrow(tag, out_schema)


def ivf_topk(
    assigned: DataFrame,
    codebook: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id) scanning only nprobe lists per query.

    The probed-list filter is a Catalyst ``isin`` on ``list_id`` — pushed to
    the scan (partition pruning when the table is written partitioned by
    list_id). Scoring reuses the partition-local top-k pattern.
    """
    cb = codebook.astype(np.float64)
    q_ids = np.asarray([q[0] for q in queries], dtype=np.int64)
    q_mat = np.asarray([q[1] for q in queries], dtype=np.float64)
    q_norm = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-30)
    probes = np.argsort(-(q_norm @ cb.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    probed_lists = sorted({int(x) for x in probes.ravel()})
    out_schema = "query_id long, neighbor_id long, score double"

    def local_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) == 0:
                continue
            lids = batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            m = _mat(batch.column(2))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            scores = q_norm @ mn.T  # (n_q, n_rows)
            # mask non-probed lists and self-matches BEFORE the top-k cut —
            # a non-probed row must not displace a probed candidate
            in_list = (lids[None, :, None] == probes[:, None, :]).any(axis=2)
            not_self = ids[None, :] != q_ids[:, None]
            scores = np.where(in_list & not_self, scores, -np.inf)
            kk = min(k, scores.shape[1])
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            qi_idx = np.repeat(np.arange(len(q_ids)), kk)
            sel = part.ravel()
            sc = scores[qi_idx, sel]
            keep = np.isfinite(sc)
            if not keep.any():
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(q_ids[qi_idx[keep]]),
                    pa.array(ids[sel[keep]]),
                    pa.array(sc[keep]),
                ],
                names=["query_id", "neighbor_id", "score"],
            )

    pruned = assigned.filter(F.col("list_id").isin(probed_lists))
    local = pruned.select("id", "list_id", vec_col).mapInArrow(local_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
