"""Product quantization (Jégou et al. 2011) — compressed-vector ANN.

Covers: codebook determinism, 16-byte code size, ADC pool + exact-rerank
recall against the brute-force oracle, partition invariance, IVF-PQ
composition (keep_cols passthrough), and the parameter guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from guava_probably_spark.pipeline.pq import (
    _encode_mat,
    pq_encode,
    pq_topk,
    train_pq,
)
from guava_probably_spark.pipeline.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    rows = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    return [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]


@pytest.fixture(scope="module")
def codebook(emb):
    return train_pq(emb, m_sub=16, ksub=256, iters=8)


def test_codebook_shape_and_determinism(emb, codebook):
    assert codebook.shape == (16, 256, 4)  # 64-dim / 16 subspaces, ≤500 rows→256 kept...
    cb2 = train_pq(emb, m_sub=16, ksub=256, iters=8)
    assert np.array_equal(codebook, cb2)
    # different seed → different codebook (the seed actually reaches Lloyd)
    cb3 = train_pq(emb, m_sub=16, ksub=256, iters=8, seed=99)
    assert not np.array_equal(codebook, cb3)


def test_codes_are_m_sub_bytes(emb, codebook):
    codes = pq_encode(emb, codebook)
    rows = codes.limit(5).collect()
    assert all(len(bytes(r.codes)) == 16 for r in rows)  # 256-B float32 → 16 B


def test_adc_pool_plus_exact_rerank_reproduces_brute_force(emb, codebook, queries):
    """The production posture: ADC pool=64 then exact cosine rerank equals
    the brute-force top-10 exactly on this corpus (deterministic codebook,
    deterministic tie-break) — the same exactness pattern the IVF driver
    row uses (nprobe=nlist)."""
    codes = pq_encode(emb, codebook)
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in pq_topk(codes, codebook, queries, k=10, pool=64, rerank=emb).collect()
    }
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    assert got == exact


def test_pure_adc_recall_at_pool(emb, codebook, queries):
    """Without rerank, ADC order is approximate — but the top-10 BY ADC must
    still capture most of the true top-10 within a 4x pool (recall ≥ 0.8 at
    this quantization: 4-dim subspaces, 256 cells)."""
    codes = pq_encode(emb, codebook)
    adc = pq_topk(codes, codebook, queries, k=40, pool=40)
    exact = cosine_topk(emb, queries, k=10)
    adc_sets: dict[int, set] = {}
    for r in adc.collect():
        adc_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for r in exact.collect():
        total += 1
        hits += r.neighbor_id in adc_sets[r.query_id]
    assert hits / total >= 0.8


def test_encode_partition_invariant(emb, codebook, queries):
    a = pq_topk(pq_encode(emb, codebook), codebook, queries, k=10, pool=64, rerank=emb)
    b = pq_topk(
        pq_encode(emb.repartition(13), codebook),
        codebook,
        queries,
        k=10,
        pool=64,
        rerank=emb,
    )
    ra = {(r.query_id, r.rank): r.neighbor_id for r in a.collect()}
    rb = {(r.query_id, r.rank): r.neighbor_id for r in b.collect()}
    assert ra == rb


def test_ivfpq_keep_cols_passthrough(emb, codebook):
    """IVF-PQ composition: list_id from assign_lists rides through the
    encode pass so the code table can be written partitionBy(list_id)."""
    from guava_probably_spark.pipeline.ivf import assign_lists, train_codebook

    coarse = train_codebook(emb, nlist=8, iters=4)
    assigned = assign_lists(emb, coarse)
    codes = pq_encode(
        assigned, codebook, id_col="id", vec_col="embedding", keep_cols=("list_id",)
    )
    rows = codes.limit(10).collect()
    assert {"id", "codes", "list_id"} <= set(codes.columns)
    assert all(r.list_id is not None and 0 <= r.list_id < 8 for r in rows)
    assert codes.count() == emb.count()


def test_encode_mat_centroid_identity():
    """Vectors that ARE centroids encode to their own index (zero error)."""
    rng = np.random.default_rng(3)
    cb = rng.normal(size=(4, 16, 8))
    mat = np.concatenate([cb[j, :5] for j in range(4)], axis=1)  # rows hit cell 0..4
    codes = _encode_mat(mat, cb)
    assert np.array_equal(codes, np.tile(np.arange(5, dtype=np.uint8)[:, None], (1, 4)))


def test_param_guards(emb, spark):
    with pytest.raises(ValueError):
        train_pq(emb, m_sub=7)  # 7 does not divide 64
    with pytest.raises(ValueError):
        train_pq(emb.filter("vec_id < 0"))  # empty table


def test_rerank_join_is_broadcast(emb, codebook, queries):
    """The exact-rerank join must broadcast the pool-sized candidate table
    into the embedding scan — a shuffle join here would re-exchange the
    corpus at 10^9 vectors for a pool of a few hundred rows."""
    from guava_probably_spark.pipeline.pq import pq_encode, pq_topk
    from guava_probably_spark.plans import physical_plan

    codes = pq_encode(emb, codebook)
    out = pq_topk(codes, codebook, queries, k=10, pool=64, rerank=emb)
    plan = physical_plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
