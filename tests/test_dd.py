"""DDSketch: relative-error quantiles (Masson, Rim, Lee, VLDB 2019).

Ground truth is numpy exact quantiles on the same data. The published
guarantee under test: for every q, the estimate v̂ satisfies
|v̂ − v_q| ≤ α·|v_q| where v_q is an input value at rank q — VALUE-relative,
the guarantee KLL/t-digest (rank-error) cannot give on heavy tails.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from guava_probably_spark.sketches import Sketch, SketchSpec
from guava_probably_spark.sketches.dd import DDSketch

QS = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999])


def _check_within(sk: DDSketch, vals: np.ndarray, alpha: float):
    srt = np.sort(vals)
    for q in QS:
        est = sk.quantile(float(q))
        true = srt[int(q * (len(srt) - 1))]
        assert abs(est - true) <= alpha * abs(true) + 1e-12, (q, est, true)


@pytest.mark.parametrize("alpha", [0.005, 0.01, 0.05])
def test_relative_bound_heavy_tail(alpha):
    """Lognormal spanning ~6 decades — the shape rank-error sketches lose
    the tail on; DD must stay within α at every probed quantile."""
    rng = np.random.default_rng(3)
    vals = np.exp(rng.normal(2.0, 2.5, 100_000))
    # ~25 ln-units of range needs ~25/(2α) buckets — size max_bins so the
    # full range is representable (the α=0.005 grid is ~2500 buckets)
    sk = DDSketch(alpha, max_bins=8192)
    sk.update(vals)
    assert sk.collapses == 0
    _check_within(sk, vals, alpha)


def test_mixed_signs_and_zeros():
    rng = np.random.default_rng(9)
    vals = np.concatenate(
        [-np.exp(rng.normal(0, 2, 40_000)), np.zeros(5_000), np.exp(rng.normal(0, 2, 55_000))]
    )
    rng.shuffle(vals)
    sk = DDSketch(0.01)
    sk.update(vals)
    _check_within(sk, vals, 0.01)
    # zero region: the quantile inside the zero mass is exactly 0
    r = np.searchsorted(np.sort(vals), 0.0, side="left") / len(vals)
    assert sk.quantile(float(r + 0.01)) == 0.0


def test_merge_byte_identical_to_whole_build_and_associative():
    """Bucket-count addition is exact: any split/merge order is
    byte-identical to the single build (stronger than KLL/t-digest, whose
    compaction is history-dependent)."""
    rng = np.random.default_rng(17)
    vals = np.exp(rng.normal(1, 3, 30_000))
    whole = DDSketch(0.02)
    whole.update(vals)
    parts = []
    for chunk in np.array_split(vals, 7):
        p = DDSketch(0.02)
        p.update(chunk)
        parts.append(p)
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert acc.to_bytes() == whole.to_bytes()


def test_collapse_is_counted_and_preserves_high_quantiles():
    """Forcing collapse (tiny max_bins) must increment ``collapses`` —
    the honesty flag that the α bound no longer covers the low tail — while
    the HIGH quantiles (the kept buckets) stay within α."""
    rng = np.random.default_rng(23)
    vals = np.exp(rng.normal(0, 4, 50_000))  # ~34 ln-units ≈ 1700 α=.01 buckets
    sk = DDSketch(0.01, max_bins=512)  # keeps the top ~10 ln-units (≥p99)
    sk.update(vals)
    assert sk.collapses > 0
    srt = np.sort(vals)
    for q in (0.99, 0.999, 1.0):
        est = sk.quantile(q)
        true = srt[int(q * (len(srt) - 1))]
        assert abs(est - true) <= 0.01 * abs(true) + 1e-12
    # round trip keeps the flag
    assert Sketch.from_bytes(sk.to_bytes()).collapses == sk.collapses


def test_extreme_dynamic_range_never_densifies_unbounded():
    """Indices spanning ±3·10⁸ (α=1e-5 with values from 1e-280 to 1e280)
    must not allocate a GB-scale dense array — the pre-clamp bounds every
    transient at ~max_bins (this test would OOM/stall without it)."""
    sk = DDSketch(1e-5, max_bins=512)
    sk.update(np.array([1e-280, 1e-100, 1.0, 1e100, 1e280]))
    assert sk.n == 5
    assert len(sk.pos) <= 512
    # the top value is exact-α even after the collapse of the low tail
    assert abs(sk.quantile(1.0) - 1e280) <= 1e-4 * 1e280
    # merging two far-apart sketches hits the merge-side clamp
    a, b = DDSketch(1e-5, max_bins=512), DDSketch(1e-5, max_bins=512)
    a.update(np.full(100, 1e-200))
    b.update(np.full(100, 1e200))
    a.merge(b)
    assert a.n == 200 and len(a.pos) <= 512
    assert abs(a.quantile(1.0) - 1e200) <= 1e-4 * 1e200


def test_incompatible_and_garbage():
    from guava_probably_spark.sketches import IncompatibleSketchError

    with pytest.raises((IncompatibleSketchError, ValueError)):
        DDSketch(0.01).merge(DDSketch(0.02))
    with pytest.raises(ValueError):
        DDSketch(0.0)
    with pytest.raises(ValueError):
        DDSketch(0.01).update(np.array([np.inf]))
    nan_sk = DDSketch(0.01)
    nan_sk.update(np.array([np.nan]))  # NaN dropped, KLL-family convention
    assert nan_sk.is_empty()
    sk = DDSketch(0.01)
    assert sk.is_empty() and np.isnan(sk.quantile(0.5))
    sk.put(4.2)
    assert not sk.is_empty()
    sk.clear()
    assert sk.is_empty() and sk.n == 0


def test_rank_quantile_consistency():
    rng = np.random.default_rng(31)
    vals = np.exp(rng.normal(0, 1, 20_000))
    sk = DDSketch(0.01)
    sk.update(vals)
    for q in (0.1, 0.5, 0.9):
        # rank(quantile(q)) lands within a couple of bucket-masses of q
        assert abs(sk.rank(float(sk.quantile(q))) - q) < 0.02


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=500,
    ),
    st.sampled_from([0.01, 0.05]),
)
def test_property_bound_and_roundtrip(xs, alpha):
    vals = np.asarray(xs, dtype=np.float64)
    sk = DDSketch(alpha)
    sk.update(vals)
    assert sk.n == len(vals)
    srt = np.sort(vals)
    if sk.collapses == 0:  # the α bound is claimable only uncollapsed
        for q in (0.0, 0.5, 1.0):
            est = sk.quantile(q)
            true = srt[int(q * (len(srt) - 1))]
            assert abs(est - true) <= alpha * abs(true) + 1e-9, (q, est, true)
    else:
        # collapse clamps the LOW-magnitude buckets of each sign store;
        # the extreme-MAGNITUDE end stays exact-α (_clamp_low never touches
        # the top bucket). In VALUE order that is q=1.0 only for
        # positive-max data: for all-negative data the max value is the
        # LOWEST-magnitude value and can sit in the clamp region
        # (hypothesis: xs=[-6.05e8, -3.04e-113] — q=1.0 clamps to ~1e-9).
        if abs(srt[-1]) >= abs(srt[0]):
            est, true = sk.quantile(1.0), srt[-1]
        else:
            est, true = sk.quantile(0.0), srt[0]
        assert abs(est - true) <= alpha * abs(true) + 1e-9
    rt = Sketch.from_bytes(sk.to_bytes())
    assert rt.to_bytes() == sk.to_bytes()
    assert rt.n == sk.n


def test_spec_create_and_repr():
    sk = SketchSpec("dd", {"alpha": 0.03, "max_bins": 777}).create()
    assert isinstance(sk, DDSketch)
    assert sk.alpha == 0.03 and sk.max_bins == 777
    assert "DDSketch" in repr(sk)


def test_fold_commutes_with_merge_byte_exact():
    """γ→γᵐ regrid is a linear map on counts, so fold(A)∪fold(B) must be
    byte-identical to fold(A∪B) — the property that makes mixed-α
    sketch-table merges (SQL sketch_fold) exact."""
    rng = np.random.default_rng(41)
    vals = np.exp(rng.normal(0, 2, 40_000))
    a, b = DDSketch(0.005), DDSketch(0.005)
    a.update(vals[:20_000])
    b.update(vals[20_000:])
    for m in (2, 3, 7):
        left = a.fold_to(m).merge(b.fold_to(m))
        whole = a.copy().merge(b).fold_to(m)
        assert left.to_bytes() == whole.to_bytes(), m
        # and the folded sketch honors ITS OWN α₂ bound
        alpha2 = left.alpha
        srt = np.sort(vals)
        for q in (0.1, 0.5, 0.9, 0.99):
            est = left.quantile(q)
            true = srt[int(q * (len(srt) - 1))]
            assert abs(est - true) <= alpha2 * abs(true) * (1 + 1e-9), (m, q)


def test_fold_identity_and_errors():
    sk = DDSketch(0.01)
    sk.update(np.exp(np.random.default_rng(5).normal(0, 1, 5_000)))
    same = sk.fold_to(1)
    assert same.to_bytes() == sk.to_bytes() and same is not sk
    with pytest.raises(ValueError):
        sk.fold_to(0)
    with pytest.raises(ValueError):
        sk.fold_to(2.5)
    # n / zero / sign mass preserved through a real fold
    mixed = DDSketch(0.02)
    mixed.update(np.array([-3.0, -1.0, 0.0, 0.0, 2.0, 8.0]))
    f = mixed.fold_to(4)
    assert f.n == 6 and f.zero_count == 2
    assert int(f.pos.sum()) == 2 and int(f.neg.sum()) == 2


def test_fold_via_sql_sketch_fold(spark):
    """The generic SQL fold surface reaches dd: param = grid multiplier."""
    from guava_probably_spark.functions import register_sql
    from guava_probably_spark.sketches import Sketch

    register_sql(spark)
    sk = DDSketch(0.005)
    sk.update(np.exp(np.random.default_rng(6).normal(1, 2, 20_000)))
    df = spark.createDataFrame([(sk.to_bytes(),)], "sketch binary")
    df.createOrReplaceTempView("dd_fold_v")
    blob = spark.sql("SELECT sketch_fold(sketch, 3) AS s FROM dd_fold_v").collect()[0].s
    folded = Sketch.from_bytes(blob)
    assert folded.to_bytes() == sk.fold_to(3).to_bytes()
    assert folded.n == sk.n


def test_parameter_edges_resolvable_alpha_and_dbl_max():
    """Review-found edges: unresolvable α raises instead of silently
    dividing by zero; tiny-but-resolvable α never mislabels small values
    as zeros; reps near DBL_MAX stay finite."""
    with pytest.raises(ValueError):
        DDSketch(1e-17)  # gamma rounds to exactly 1.0
    # α=1e-9 resolves; 0.05 is NOT a zero and a single bucket is exact-α
    sk = DDSketch(1e-9)
    sk.update(np.array([0.05]))
    assert sk.zero_count == 0 and sk.collapses == 0
    assert abs(sk.quantile(0.5) - 0.05) <= 2e-9 * 0.05
    # near-DBL_MAX values: finite rep within 2α (top-bucket clamp)
    big = np.finfo(np.float64).max
    hi = DDSketch(0.01)
    hi.update(np.array([big, big / 2.0]))
    q = hi.quantile(1.0)
    assert np.isfinite(q)
    assert abs(q - big) <= 2 * 0.01 * big
    assert abs(hi.quantile(0.0) - big / 2) <= 0.01 * big / 2
    # mirrored store: near -DBL_MAX stays finite too
    lo = DDSketch(0.01)
    lo.update(np.array([-big, 1.0]))
    assert np.isfinite(lo.quantile(0.0))


def test_rank_mixed_signs_matches_exact():
    """rank() over the three-store layout (negative store searched in
    reversed/ascending-value order, zero mass, positive store): estimates
    track the exact strictly-below fraction across both signs and zero."""
    rng = np.random.default_rng(77)
    vals = np.concatenate(
        [-np.exp(rng.normal(0, 2, 30_000)), np.zeros(3_000), np.exp(rng.normal(0, 2, 27_000))]
    )
    sk = DDSketch(0.01)
    sk.update(vals)
    srt = np.sort(vals)
    for x in (-50.0, -1.0, -0.001, 0.0, 1e-9, 0.5, 1.0, 3.0, 100.0):
        est = sk.rank(x)
        true = np.searchsorted(srt, x, side="left") / len(srt)
        assert abs(est - true) < 0.01, x
    xs = np.array([-2.0, 0.0, 2.0])
    assert np.allclose(sk.rank(xs), [sk.rank(float(x)) for x in xs])
