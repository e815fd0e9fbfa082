"""Pairwise source-overlap matrix from per-key theta sketches.

Ground truth is exact python set algebra on the same synthetic rows —
below theta saturation (n < k) every distinct value is retained, so the
matrix must be EXACT, not merely within bounds; a second case crosses
saturation and is checked against the KMV error bound instead.
"""

import itertools

import pytest

from guava_probably_spark.operators import grouped_theta, source_overlap_matrix


def _planted_rows():
    """4 sources with known pairwise overlaps (values are strings)."""
    base = {
        "a": {f"v{i}" for i in range(0, 60)},
        "b": {f"v{i}" for i in range(40, 110)},  # a∩b = 20
        "c": {f"v{i}" for i in range(100, 130)},  # b∩c = 10, a∩c = 0
        "d": {f"v{i}" for i in range(0, 10)},  # d ⊂ a
    }
    rows = [(s, v) for s, vals in base.items() for v in vals]
    rows += rows[::3]  # duplicate a third of the rows: distinct sets unchanged
    return base, rows


def _exact(base):
    out = {}
    for a, b in itertools.combinations(sorted(base), 2):
        sa, sb = base[a], base[b]
        out[(a, b)] = (
            len(sa),
            len(sb),
            len(sa & sb),
            len(sa | sb),
            len(sa - sb),
        )
    return out


def test_overlap_matrix_exact_below_saturation(spark):
    base, rows = _planted_rows()
    df = spark.createDataFrame(rows, "source string, text string").repartition(7)
    m = source_overlap_matrix(df, "source", "text", k=512)
    got = {
        (r.a, r.b): (r.est_a, r.est_b, r.est_inter, r.est_union, r.est_diff)
        for r in m.collect()
    }
    want = _exact(base)
    assert set(got) == set(want)
    for pair, exact in want.items():
        assert got[pair] == pytest.approx(exact, abs=1e-9), pair
    # below saturation the bound column reports the k-driven 3σ bound
    for r in m.collect():
        assert r.rel_err_bound == pytest.approx(3.0 / (511) ** 0.5)


def test_overlap_matrix_reuses_prebuilt_sketch_table(spark):
    base, rows = _planted_rows()
    df = spark.createDataFrame(rows, "source string, text string")
    g = grouped_theta(df, "source", "text", k=512)
    m = source_overlap_matrix(None, "source", "text", sketches=g)
    got = {(r.a, r.b): (r.est_inter, r.est_union) for r in m.collect()}
    for (a, b), (_, _, inter, union, _) in _exact(base).items():
        assert got[(a, b)] == pytest.approx((inter, union), abs=1e-9)


def test_overlap_matrix_within_bound_above_saturation(spark):
    k = 256
    n = 8000
    half = {f"x{i}" for i in range(n // 2, n + n // 2)}
    rows = [("p", f"x{i}") for i in range(n)] + [("q", v) for v in half]
    df = spark.createDataFrame(rows, "source string, text string").repartition(5)
    m = source_overlap_matrix(df, "source", "text", k=k).collect()
    assert len(m) == 1
    r = m[0]
    assert (r.a, r.b) == ("p", "q")
    exact_inter, exact_union = n // 2, n + n // 2
    # intersection error ~ 1/sqrt(sample hits); allow 5 sigma of the
    # reported bound on every estimate (bound is the per-set 3σ figure)
    tol = r.rel_err_bound * 5 / 3
    assert abs(r.est_a - n) <= tol * n
    assert abs(r.est_inter - exact_inter) <= 8 / (k - 1) ** 0.5 * exact_inter
    assert abs(r.est_union - exact_union) <= tol * exact_union
    assert abs(r.est_diff - n // 2) <= 8 / (k - 1) ** 0.5 * n
    assert r.rel_err_bound == pytest.approx(3.0 / (k - 1) ** 0.5)


def test_overlap_matrix_partitioning_invariant(spark):
    _, rows = _planted_rows()
    df1 = spark.createDataFrame(rows, "source string, text string").repartition(2)
    df2 = spark.createDataFrame(rows, "source string, text string").repartition(13)
    key = lambda r: (r.a, r.b)  # noqa: E731
    m1 = sorted(source_overlap_matrix(df1, "source", "text", k=512).collect(), key=key)
    m2 = sorted(source_overlap_matrix(df2, "source", "text", k=512).collect(), key=key)
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
