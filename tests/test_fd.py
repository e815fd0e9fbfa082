"""Frequent Directions matrix sketch (sketches/fd.py): the exact spectral
certificate (0 ⪯ AᵀA − BᵀB ⪯ shift·I, shift ≤ 2‖A‖_F²/ℓ), mergeability,
serialization, and the distributed build through the generic
collect_sketch machinery."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from guava_probably_spark.sketches import (
    FrequentDirectionsSketch,
    Sketch,
    SketchSpec,
)
from guava_probably_spark.sketches.base import IncompatibleSketchError


def _matrix(n=12_000, d=40, rank=5, noise=0.25, seed=9):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, rank)) @ rng.normal(size=(rank, d)) * 2 + (
        rng.normal(size=(n, d)) * noise
    )


def _check_certificate(sk, A, ell):
    G = A.T @ A
    D = G - sk.gram()
    ev = np.linalg.eigvalsh(D)
    frob = float((A * A).sum())
    tol = 1e-6 * frob
    assert ev.min() >= -tol, "AᵀA − BᵀB must be PSD"
    assert ev.max() <= sk.spectral_bound() + tol, "exact certificate violated"
    assert sk.spectral_bound() <= 2 * frob / ell, "worst-case FD bound violated"


def test_fd_certificate_single_stream():
    A = _matrix()
    sk = FrequentDirectionsSketch(ell=20)
    for i in range(0, len(A), 700):  # uneven chunks exercise the buffer
        sk.update(A[i : i + 700])
    assert sk.size == len(A)
    assert abs(sk.frob - float((A * A).sum())) < 1e-6 * sk.frob
    _check_certificate(sk, A, 20)
    # top directions recover the planted rank-5 subspace
    _, _, vt = np.linalg.svd(A, full_matrices=False)
    overlap = np.linalg.norm(sk.top_directions(5) @ vt[:5].T, 2)
    assert overlap > 0.99


def test_fd_merge_certificate_and_additivity():
    A = _matrix(seed=11)
    parts = [FrequentDirectionsSketch(ell=20) for _ in range(5)]
    for j, p in enumerate(parts):
        p.update(A[j::5])
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(Sketch.from_bytes(p.to_bytes()))  # merge through blobs
    assert acc.size == len(A)
    _check_certificate(acc, A, 20)


def test_fd_batched_vs_streaming_paths():
    """One huge update (batched single-SVD compaction) and row-at-a-time
    streaming (2ℓ-buffer path) both carry the exact certificate and identical
    exact invariants."""
    A = _matrix(n=6000, d=24, seed=3)
    big = FrequentDirectionsSketch(ell=12)
    big.update(A)  # one call ≫ 2ℓ rows → batched path
    small = FrequentDirectionsSketch(ell=12)
    for row in A:
        small.update(row)  # never exceeds the buffer → classic path
    for sk in (big, small):
        assert sk.size == len(A)
        assert abs(sk.frob - float((A * A).sum())) < 1e-6 * sk.frob
        _check_certificate(sk, A, 12)


def test_fd_rank_deficient_exact():
    """rank(A) ≤ ℓ → the reduction is exact: shift stays 0 and BᵀB == AᵀA."""
    rng = np.random.default_rng(4)
    A = rng.normal(size=(5000, 3)) @ rng.normal(size=(3, 30))  # rank 3
    sk = FrequentDirectionsSketch(ell=8)
    sk.update(A)
    # shift is the (ℓ+1)-th squared singular value — numerically ~1e-27 on an
    # exactly-rank-3 input, i.e. zero up to LAPACK noise
    assert sk.spectral_bound() <= 1e-12 * sk.frob
    assert np.allclose(sk.gram(), A.T @ A, rtol=1e-9, atol=1e-6)


def test_fd_serialization_roundtrip_and_equality():
    A = _matrix(n=3000)
    sk = FrequentDirectionsSketch(ell=16)
    sk.update(A)
    blob = sk.to_bytes()
    sk2 = Sketch.from_bytes(blob)
    assert isinstance(sk2, FrequentDirectionsSketch)
    assert sk2.to_bytes() == blob
    assert sk2.size == sk.size and sk2.shift == sk.shift
    assert np.array_equal(sk2.rows(), sk.rows())
    assert sk2 == sk and sk.copy() == sk
    # empty sketch round-trips too
    e = FrequentDirectionsSketch(ell=16)
    assert Sketch.from_bytes(e.to_bytes()).is_empty()


def test_fd_incompatible_merges_raise():
    a = FrequentDirectionsSketch(ell=16)
    a.update(np.ones((4, 8)))
    b = FrequentDirectionsSketch(ell=8)
    b.update(np.ones((4, 8)))
    with pytest.raises(IncompatibleSketchError):
        a.merge(b)
    c = FrequentDirectionsSketch(ell=16)
    c.update(np.ones((4, 9)))  # different dimension
    with pytest.raises(IncompatibleSketchError):
        a.merge(c)
    with pytest.raises(IncompatibleSketchError):
        a.update(np.ones((2, 5)))  # dimension change mid-stream


def test_fd_nan_rows_dropped_and_clear():
    sk = FrequentDirectionsSketch(ell=8)
    x = np.ones((6, 4))
    x[2, 1] = np.nan
    x[4, 3] = np.inf
    sk.update(x)
    assert sk.size == 4
    sk.clear()
    assert sk.is_empty() and sk.spectral_bound() == 0.0


def test_fd_arrow_list_column_input():
    import pyarrow as pa

    sk = FrequentDirectionsSketch(ell=8)
    col = pa.array([[1.0, 2.0], None, [3.0, 4.0]], type=pa.list_(pa.float32()))
    sk.update(col)
    assert sk.size == 2
    assert np.allclose(sk.gram(), np.array([[10.0, 14.0], [14.0, 20.0]]))


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 400),
    d=st.integers(1, 12),
    ell=st.integers(2, 16),
    n_parts=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
    scale=st.sampled_from([1e-6, 1.0, 1e6]),
)
def test_fd_certificate_property(n, d, ell, n_parts, seed, scale):
    """Adversarial shapes (d=1, ℓ>d, tiny n, extreme scales, random split
    counts): the exact certificate and exact additivity hold for the sketch
    built from any partition split and blob round-trip."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, d)) * scale
    parts = [FrequentDirectionsSketch(ell=ell) for _ in range(n_parts)]
    for j, p in enumerate(parts):
        if len(A[j::n_parts]):
            p.update(A[j::n_parts])
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(Sketch.from_bytes(p.to_bytes()))
    assert acc.size == n
    frob = float((A * A).sum())
    assert abs(acc.frob - frob) <= 1e-9 * max(frob, 1e-300)
    assert acc.shift <= 2.0 * frob / ell + 1e-9 * frob
    D = A.T @ A - acc.gram()
    ev = np.linalg.eigvalsh(D)
    tol = 1e-6 * max(frob, 1e-300)
    assert ev.min() >= -tol
    assert ev.max() <= acc.shift + tol


def test_fd_grouped_build(spark):
    """Per-key FD sketches through the generic salted two-phase
    `build_grouped` (phase-2 partial merge exercises FD mergeability under
    the hot-key split): the certificate holds per group."""
    from guava_probably_spark.operators import build_grouped

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    g = build_grouped(emb, "label", "embedding", SketchSpec("fd", {"ell": 12}), salt=4)
    data = {}
    for r in emb.select("label", "embedding").collect():
        data.setdefault(r.label, []).append(r.embedding)
    rows = g.collect()
    assert len(rows) == len(data)
    for r in rows:
        sk = Sketch.from_bytes(r.sketch)
        A = np.asarray(data[r.label], dtype=np.float64)
        assert r.n == len(A) and sk.size == len(A)
        _check_certificate(sk, A, 12)


def test_fd_pca_projection_preserves_topk(spark):
    """The FD → top_directions → pca_project → cosine_topk composition: on
    a (numerically) rank-r corpus with r ≤ ell, FD is exact, projecting to
    r dims preserves all inner products, and the reduced-space top-k equals
    the full-dim top-k exactly."""
    from guava_probably_spark.operators import collect_sketch
    from guava_probably_spark.pipeline.similarity import cosine_topk, pca_project

    rng = np.random.default_rng(21)
    r, d, n = 5, 32, 2000
    A = (rng.normal(size=(n, r)) @ rng.normal(size=(r, d))).astype(np.float32)
    rows = [(i, [float(x) for x in A[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(4)

    sk, cnt, _ = collect_sketch(emb, "embedding", SketchSpec("fd", {"ell": 16}))
    assert cnt == n and sk.spectral_bound() <= 1e-9 * sk.frob  # exact reduction
    dirs = sk.top_directions(r)

    proj = pca_project(emb, dirs)
    # distributed projection equals the local matmul
    got = {row.vec_id: np.asarray(row.embedding) for row in proj.collect()}
    exp = (A.astype(np.float64) @ dirs.T).astype(np.float32)
    for i in range(n):
        assert np.allclose(got[i], exp[i], rtol=1e-5, atol=1e-5)

    queries = [(i, [float(x) for x in A[i]]) for i in range(8)]
    full = {(row.query_id, row.rank): row.neighbor_id
            for row in cosine_topk(emb, queries, k=5).collect()}
    pq = [(i, [float(x) for x in exp[i]]) for i in range(8)]
    red = {(row.query_id, row.rank): row.neighbor_id
           for row in cosine_topk(proj, pq, k=5).collect()}
    assert full == red


def test_fd_distributed_collect_sketch(spark):
    """The generic partial-build + tree-merge machinery handles FD like any
    other mergeable sketch; the exact certificate holds for the distributed
    result."""
    from guava_probably_spark.operators import collect_sketch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sk, n, ov = collect_sketch(emb, "embedding", SketchSpec("fd", {"ell": 24}))
    A = np.asarray(
        [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
    )
    assert n == len(A) and ov == 0
    _check_certificate(sk, A, 24)


def test_fd_fold_to_smaller_ell_keeps_certificate():
    """fold_to(ℓ₂): count/frob carry exactly, and the folded sketch's
    per-instance spectral certificate holds against the ORIGINAL data with
    the ℓ₂ worst-case bound — the mixed-ℓ merge workflow."""
    from guava_probably_spark.sketches import FrequentDirectionsSketch

    A = _matrix(n=3000, d=48, rank=10, seed=31, noise=0.3)
    fine = FrequentDirectionsSketch(ell=64)
    fine.update(A)
    folded = fine.fold_to(16)
    assert folded.ell == 16
    assert folded._count == fine._count
    assert folded.frob == fine.frob
    assert folded.shift >= fine.shift  # fold shrink only adds
    _check_certificate(folded, A, 16)
    # source sketch untouched
    _check_certificate(fine, A, 64)
    # fold to the same ell is a copy-equivalent
    same = fine.fold_to(64)
    assert same.gram().shape == fine.gram().shape
    _check_certificate(same, A, 64)
    # mixed-ell merge: fold then merge with a native ell=16 over other rows
    B = _matrix(n=2000, d=48, rank=6, seed=32, noise=0.2)
    native = FrequentDirectionsSketch(ell=16)
    native.update(B)
    merged = folded.merge(native)
    _check_certificate(merged, np.vstack([A, B]), 16)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fine.fold_to(65)
    with _pytest.raises(ValueError):
        fine.fold_to(1)
