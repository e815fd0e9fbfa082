"""Distributed spherical k-means + SemDeDup semantic dedup.

Ground truth is pure numpy on the same synthetic corpus: planted
well-separated cluster centers, plus planted jittered near-duplicate
copies whose pairwise cosine sits far above the threshold while all
non-duplicate pairs sit far below — so the expected pair set and the
expected surviving-id set are exact and partitioning-independent.
"""

import numpy as np
import pytest

from guava_probably_spark.pipeline.kmeans import (
    _merge_partials,
    _normalize_rows,
    _pack_partial,
    _unpack_partial,
    assign_clusters,
    kmeans_fit,
    semantic_dedup,
    semantic_dedup_pairs,
    semantic_drop_stats,
)

DIM = 32
N_CENTERS = 6
PER_CENTER = 60
N_DUP_GROUPS = 8
DUP_COPIES = 3  # group size: 1 original + 2 jittered copies


def _corpus(seed: int = 5):
    """(ids, vecs, true_assign, dup_groups): separated clusters + planted dups."""
    rng = np.random.default_rng(seed)
    centers = _normalize_rows(rng.standard_normal((N_CENTERS, DIM)))
    base = []
    assign = []
    for c in range(N_CENTERS):
        pts = centers[c][None, :] + 0.08 * rng.standard_normal((PER_CENTER, DIM))
        base.append(pts)
        assign.extend([c] * PER_CENTER)
    vecs = _normalize_rows(np.concatenate(base))
    # planted near-dup groups: copies of an existing row + tiny jitter
    dup_groups = []
    extra = []
    next_id = len(vecs)
    for g in range(N_DUP_GROUPS):
        src = g * PER_CENTER // N_DUP_GROUPS  # spread across clusters
        group = [src]
        for _ in range(DUP_COPIES - 1):
            extra.append(vecs[src] + 0.001 * rng.standard_normal(DIM))
            group.append(next_id)
            next_id += 1
        dup_groups.append(group)
    allv = _normalize_rows(np.concatenate([vecs, np.asarray(extra)]))
    ids = np.arange(len(allv), dtype=np.int64)
    return ids, allv, np.asarray(assign), dup_groups


def _brute_pairs(vecs: np.ndarray, threshold: float):
    sim = vecs @ vecs.T
    iu, ju = np.triu_indices(len(vecs), k=1)
    hit = sim[iu, ju] >= threshold
    return {(int(a), int(b)) for a, b in zip(iu[hit], ju[hit])}


def _emb_df(spark, ids, vecs, parts=4):
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(
        parts
    )


def test_partial_blob_roundtrip():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 100, 5).astype(np.int64)
    sums = rng.standard_normal((5, 7))
    blob = _pack_partial(counts, sums, 1.25, 321)
    c, s, e, n = _unpack_partial(blob)
    assert (c == counts).all() and np.allclose(s, sums) and e == 1.25 and n == 321
    with pytest.raises(ValueError):
        _unpack_partial(b"XXXX" + blob[4:])
    with pytest.raises(ValueError):
        _unpack_partial(blob[:-3])


def test_merge_partials_is_elementwise_add():
    rng = np.random.default_rng(1)
    parts = [
        _pack_partial(
            rng.integers(0, 9, 4).astype(np.int64), rng.standard_normal((4, 3)), 0.5, 10
        )
        for _ in range(3)
    ]
    c, s, e, n = _merge_partials(iter(parts))
    cs = [np.frombuffer(p, "<i8", 4, 28) for p in parts]
    assert (c == np.sum(cs, axis=0)).all() and n == 30 and e == pytest.approx(1.5)
    assert np.allclose(s, sum(_unpack_partial(p)[1] for p in parts))


def test_kmeans_one_iteration_matches_local(spark):
    ids, vecs, _, _ = _corpus()
    emb = _emb_df(spark, ids, vecs, parts=5)
    k = N_CENTERS
    # iters=0 returns the deterministic init; replicate one distributed
    # Lloyd round locally from that SAME init and compare centroids
    cb0, info0 = kmeans_fit(emb, k=k, iters=0, seed=11)
    assert info0["iters"] == 0
    cb1, info = kmeans_fit(emb, k=k, iters=1, seed=11)
    a = (vecs @ cb0.T).argmax(axis=1)
    expect = cb0.copy()
    for c in range(k):
        m = vecs[a == c]
        if len(m):
            expect[c] = m.mean(axis=0)
    expect = _normalize_rows(expect)
    assert info["iters"] == 1 and info["n"] == len(vecs)
    assert np.allclose(cb1, expect, atol=1e-9)


def test_kmeans_objective_monotone_and_recovers_clusters(spark):
    ids, vecs, true_assign, _ = _corpus()
    emb = _emb_df(spark, ids, vecs, parts=3)
    cb, info = kmeans_fit(emb, k=N_CENTERS, iters=12, seed=11)
    hist = [h["mean_cos_dist"] for h in info["history"]]
    assert all(b <= a + 1e-9 for a, b in zip(hist, hist[1:]))
    # every planted center is matched by some centroid at high cosine
    rng_centers = np.asarray(
        [
            _normalize_rows(vecs[: N_CENTERS * PER_CENTER][true_assign == c]).mean(axis=0)
            for c in range(N_CENTERS)
        ]
    )
    rng_centers = _normalize_rows(rng_centers)
    match = (rng_centers @ cb.T).max(axis=1)
    assert (match > 0.98).all()


def test_assign_clusters_matches_local_argmax(spark):
    ids, vecs, _, _ = _corpus()
    emb = _emb_df(spark, ids, vecs)
    cb, _ = kmeans_fit(emb, k=N_CENTERS, iters=4, seed=11)
    got = {
        r.id: r.cluster for r in assign_clusters(emb, cb).select("id", "cluster").collect()
    }
    want = (vecs @ cb.T).argmax(axis=1)
    assert got == {int(i): int(w) for i, w in zip(ids, want)}


def test_semantic_pairs_match_bruteforce(spark):
    ids, vecs, _, dup_groups = _corpus()
    emb = _emb_df(spark, ids, vecs, parts=7)
    cb, _ = kmeans_fit(emb, k=N_CENTERS, iters=6, seed=11)
    threshold = 0.995
    got = {
        (r.a, r.b)
        for r in semantic_dedup_pairs(emb, cb, threshold=threshold).collect()
    }
    want = _brute_pairs(vecs, threshold)
    # planted dup pairs are intra-cluster by construction (copies of one
    # row land with their source), so semdedup recall here is exactly 1
    assert got == want
    for group in dup_groups:
        for i, x in enumerate(group):
            for y in group[i + 1 :]:
                assert (min(x, y), max(x, y)) in got


def test_semantic_dedup_keeps_min_id_per_group(spark):
    ids, vecs, _, dup_groups = _corpus()
    emb = _emb_df(spark, ids, vecs, parts=4)
    kept = {
        r.vec_id
        for r in semantic_dedup(emb, k=N_CENTERS, threshold=0.995, iters=6).collect()
    }
    drop = set()
    for group in dup_groups:
        drop |= set(group) - {min(group)}
    assert kept == set(int(i) for i in ids) - drop


def test_semantic_dedup_partitioning_invariant(spark):
    ids, vecs, _, _ = _corpus()
    kept = []
    for parts in (2, 9):
        emb = _emb_df(spark, ids, vecs, parts=parts)
        kept.append(
            sorted(
                r.vec_id
                for r in semantic_dedup(emb, k=N_CENTERS, threshold=0.995, iters=5).collect()
            )
        )
    assert kept[0] == kept[1]


def test_oversize_cluster_dropped_with_audit(spark):
    ids, vecs, _, _ = _corpus()
    emb = _emb_df(spark, ids, vecs)
    cb, _ = kmeans_fit(emb, k=N_CENTERS, iters=4, seed=11)
    cap = 10  # every cluster (~60 members) exceeds this
    assert semantic_dedup_pairs(emb, cb, threshold=0.99, max_cluster=cap).count() == 0
    stats = semantic_drop_stats(emb, cb, max_cluster=cap).collect()[0]
    assert stats.dropped_buckets > 0 and stats.dropped_members > 0


def test_kmeans_more_centroids_than_rows(spark):
    rng = np.random.default_rng(3)
    vecs = _normalize_rows(rng.standard_normal((5, DIM)))
    emb = _emb_df(spark, np.arange(5), vecs, parts=2)
    cb, info = kmeans_fit(emb, k=8, iters=3, seed=11)
    assert cb.shape == (8, DIM) and np.isfinite(cb).all()
    assert info["n"] == 5


def test_pair_stage_blockwise_matches_bruteforce():
    """The row-blockwise pair kernel (bounded O(block·n) memory) emits
    exactly the brute-force upper-triangle pair set at every block size,
    including blocks that split the matrix mid-cluster."""
    import pyarrow as pa

    from guava_probably_spark.pipeline.kmeans import _cluster_pair_stage

    ids, vecs, _, _ = _corpus()
    threshold = 0.995
    want = _brute_pairs(vecs, threshold)
    table = pa.table(
        {
            "id": pa.array(ids),
            "embedding": pa.array([[float(x) for x in v] for v in vecs]),
        }
    )
    for block in (1, 3, 17, len(ids), 10_000):
        out = _cluster_pair_stage(threshold, 10**6, "embedding", block=block)(table)
        got = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
        assert got == want, block
        assert all(c >= threshold for c in out.column("cos").to_pylist())
