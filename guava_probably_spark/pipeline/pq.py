"""Product quantization (PQ) — compressed-vector ANN, the 100-TB memory path.

Jégou, Douze, Schmid 2011 ("Product quantization for nearest neighbor
search"). IVF (pipeline/ivf.py) cuts how many vectors a query SCANS;
PQ cuts how many bytes each scanned vector COSTS: the d-dim embedding is
split into ``m_sub`` subvectors, each quantized to one of ``ksub``
per-subspace centroids, so a vector becomes ``m_sub`` uint8 codes — 64
float32 dims (256 B) → 8 B at the defaults, 32×. Search is asymmetric
distance computation (ADC): the query builds an (m_sub, ksub) lookup table
of subspace inner products ONCE, then every candidate's score is m_sub
table lookups summed — no float vector is ever decoded, so the scan is
bandwidth-bound on the 8-byte codes instead of the 256-byte embeddings.

Composition with the rest of the ANN family:

- brute-force exact (similarity.cosine_topk)   — the correctness baseline
- IVF (ivf.assign_lists/ivf_topk)              — scan fewer vectors
- PQ (this module)                             — pay fewer bytes per vector
- IVF-PQ = assign_lists ∘ pq_encode            — both (the FAISS IVFADC
  layout); codes written ``partitionBy("list_id")`` prune at file level

Exactness posture: ADC is an approximation of the true inner product
(quantization error), so production search takes a candidate pool of
``pool ≥ k`` by ADC and EXACTLY reranks the pool by true cosine —
``pq_topk(..., rerank=emb)``. The pool is per-query-bounded (pool ×
queries rows join back to the embedding table by id), so the rerank is a
candidate-bounded semi-join, never a corpus rescan — the same shape as
the minhash verify stage.

Determinism: training samples via the shared ``ivf.hash_ordered_sample``
(seeded xxhash64 order) and per-subspace Lloyd with a seeded init, so
train → encode → search reproduces bit-identically across runs, resumes,
and partitionings — the property every driver row relies on.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window, functions as F

from guava_probably_spark.pipeline.ivf import hash_ordered_sample
from guava_probably_spark.pipeline.similarity import _mat


def _lloyd_euclidean(m: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain (non-spherical) Lloyd on a subspace sample: PQ quantizes raw
    subvector geometry, so the update is the Euclidean mean with NO
    renormalization (the spherical variant in ivf.lloyd_rounds is for
    whole-vector cosine codebooks). Deterministic: seeded init, empty
    clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    k = min(k, len(m))
    centroids = m[rng.choice(len(m), size=k, replace=False)].copy()
    for _ in range(iters):
        # (n, k) squared distances via the expansion trick — no (n,k,d) cube
        d2 = (
            (m * m).sum(axis=1, keepdims=True)
            - 2.0 * (m @ centroids.T)
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def train_pq(
    emb: DataFrame,
    m_sub: int = 8,
    ksub: int = 256,
    iters: int = 8,
    seed: int = 11,
    sample_n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m_sub, ksub', dsub) float64 PQ codebook from a driver-side sample
    (ksub' = min(ksub, sample rows) — small corpora can't fill 256 cells).

    Vectors are L2-normalized BEFORE splitting (the sampler does this), so
    ADC sums of subspace inner products estimate the true cosine. The
    sample is bounded (default 100·ksub rows ≈ 25.6k vectors regardless of
    corpus size — k-means on a sample is the standard PQ construction) and
    the per-subspace Lloyd loops are driver-side numpy on (sample, dsub)
    slices: the only non-distributed compute in the pipeline, identical on
    every run."""
    if sample_n is None:
        sample_n = 100 * ksub
    m = hash_ordered_sample(emb, sample_n, id_col, vec_col, seed)
    if m.size == 0:
        raise ValueError("cannot train a PQ codebook on an empty table")
    d = m.shape[1]
    if d % m_sub:
        raise ValueError(f"m_sub={m_sub} must divide the embedding dim {d}")
    dsub = d // m_sub
    k = min(ksub, len(m))
    cb = np.empty((m_sub, k, dsub), dtype=np.float64)
    for j in range(m_sub):
        cb[j] = _lloyd_euclidean(
            np.ascontiguousarray(m[:, j * dsub : (j + 1) * dsub]), k, iters, seed + j
        )
    return cb


def _encode_mat(mn: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, m_sub) uint8 codes for an L2-normalized matrix."""
    m_sub, _, dsub = cb.shape
    codes = np.empty((len(mn), m_sub), dtype=np.uint8)
    for j in range(m_sub):
        sub = mn[:, j * dsub : (j + 1) * dsub]
        c = cb[j]
        d2 = (
            (sub * sub).sum(axis=1, keepdims=True)
            - 2.0 * (sub @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(
    emb: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes: binary[, keep_cols...]): one broadcast-codebook Arrow pass
    tags every vector with its m_sub uint8 codes — the corpus the searches
    scan is m_sub bytes/vector from here on. ``keep_cols`` passes narrow
    columns (e.g. ``list_id`` from ivf.assign_lists) through for IVF-PQ."""
    cb = codebook.astype(np.float64)
    m_sub = cb.shape[0]
    extra = "".join(f", {c} {t}" for c, t in _keep_types(emb, keep_cols))
    out_schema = f"id long, codes binary{extra}"

    def enc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) == 0:
                continue
            m = _mat(batch.column(1))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            codes = _encode_mat(mn, cb)
            arrs = [
                pa.array(ids),
                pa.array([codes[i].tobytes() for i in range(len(ids))], type=pa.binary()),
            ]
            for ci in range(len(batch.columns) - 2):
                arrs.append(batch.column(2 + ci))
            yield pa.RecordBatch.from_arrays(arrs, names=["id", "codes", *keep_cols])

    cols = [F.col(id_col).cast("long").alias("id"), F.col(vec_col), *keep_cols]
    return emb.select(*cols).mapInArrow(enc, out_schema)


def _keep_types(df: DataFrame, keep_cols: tuple[str, ...]) -> list[tuple[str, str]]:
    types = dict(df.dtypes)
    return [(c, types[c]) for c in keep_cols]


def pq_topk(
    codes_df: DataFrame,
    codebook: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    pool: int | None = None,
    rerank: DataFrame | None = None,
    vec_col: str = "embedding",
    rerank_id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, rank, neighbor_id) by ADC over the code table.

    Per partition: each query's (m_sub, ksub) inner-product lookup table is
    built once, every row's score is m_sub uint8-indexed lookups summed —
    the scan never touches a float vector. Partition-local top-``pool``
    then a global window, the same two-phase top-k as the exact path.

    With ``rerank`` (the embedding DataFrame), the ADC pool is exactly
    rescored by true cosine before the final top-k cut — a candidate-
    bounded broadcast join (pool × queries rows), never a corpus rescan.
    Without it, ADC order is final (pure compressed search).
    """
    cb = codebook.astype(np.float64)
    m_sub, ksub, dsub = cb.shape
    if pool is None:
        pool = max(4 * k, k)
    q_ids = np.asarray([q[0] for q in queries], dtype=np.int64)
    q_mat = np.asarray([q[1] for q in queries], dtype=np.float64)
    q_norm = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-30)
    # (n_q, m_sub, ksub) ADC tables: q_sub · centroid for every cell
    luts = np.einsum(
        "qjd,jkd->qjk", q_norm.reshape(len(q_ids), m_sub, dsub), cb
    )
    out_schema = "query_id long, neighbor_id long, score double"

    def local_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(ids)
            if n == 0:
                continue
            buf = batch.column(1).combine_chunks() if isinstance(
                batch.column(1), pa.ChunkedArray
            ) else batch.column(1)
            codes = np.frombuffer(b"".join(buf.to_pylist()), dtype=np.uint8).reshape(
                n, m_sub
            )
            scores = np.zeros((len(q_ids), n), dtype=np.float64)
            for j in range(m_sub):
                scores += luts[:, j, codes[:, j]]
            scores[ids[None, :] == q_ids[:, None]] = -np.inf  # self-matches out
            kk = min(pool, n)
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

    local = codes_df.select("id", "codes").mapInArrow(local_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    pooled = local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= pool
    )
    if rerank is None:
        return pooled.filter(F.col("rank") <= k).select(
            "query_id", "rank", "neighbor_id"
        )
    # exact rerank: true cosine on the pool only. The pool table is tiny
    # (pool × queries rows) — broadcast it INTO the embedding scan so the
    # corpus side is a semi-joined pruned read, then score in one pass.
    qlut = {int(i): q_norm[ix] for ix, i in enumerate(q_ids)}
    cand = pooled.select("query_id", F.col("neighbor_id").alias("nid"))
    vecs = rerank.select(F.col(rerank_id_col).cast("long").alias("nid"), F.col(vec_col))
    joined = vecs.join(F.broadcast(cand), "nid")
    out_schema2 = "query_id long, neighbor_id long, score double"

    def rescore(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            nid = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(nid) == 0:
                continue
            m = _mat(batch.column(1))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            qid = batch.column(2).to_numpy(zero_copy_only=False).astype(np.int64)
            qm = np.stack([qlut[int(q)] for q in qid])
            sc = (qm * mn).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(qid), pa.array(nid), pa.array(sc)],
                names=["query_id", "neighbor_id", "score"],
            )

    exact = joined.select("nid", vec_col, "query_id").mapInArrow(rescore, out_schema2)
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
