"""Error-bound tests for HLL / CMS / KLL / t-digest (SURVEY.md §5.2.3,
BASELINE.md rows 5-7): published bounds on seeded data.
"""

import numpy as np
import pytest

from guava_probably_spark.sketches import CmsSketch, HllSketch, KllSketch, TDigestSketch
from guava_probably_spark.sketches.base import FUNNEL_LONG
from guava_probably_spark.sketches.cms import cms_geometry


@pytest.mark.parametrize("p", [12, 14])
@pytest.mark.parametrize("true_n", [10**3, 10**4, 10**5])
def test_hll_error_bound(p, true_n):
    rng = np.random.default_rng(p * 1000 + int(np.log10(true_n)))
    sk = HllSketch(p, funnel=FUNNEL_LONG)
    vals = rng.choice(10**13, true_n, replace=False)
    sk.update(vals)
    err = abs(sk.estimate() - true_n) / true_n
    assert err <= sk.relative_error_bound(3.0), f"p={p} n={true_n} err={err}"


def test_hll_duplicates_dont_inflate():
    sk = HllSketch(12, funnel=FUNNEL_LONG)
    vals = np.arange(1000, dtype=np.int64)
    for _ in range(5):
        sk.update(vals)
    err = abs(sk.estimate() - 1000) / 1000
    assert err <= sk.relative_error_bound(3.0)


@pytest.mark.parametrize("p1,p2", [(14, 12), (14, 8), (12, 4), (16, 11), (18, 14)])
def test_hll_fold_byte_identical_to_direct_build(p1, p2):
    """fold_to is EXACT: the folded sketch is byte-identical to one built
    directly at the coarser precision from the same elements (the fold map
    commutes with per-register max — see HllSketch.fold_to)."""
    rng = np.random.default_rng(p1 * 100 + p2)
    vals = rng.integers(0, 2**62, size=150_000)
    hi = HllSketch(p=p1, funnel=FUNNEL_LONG)
    hi.update(vals)
    direct = HllSketch(p=p2, funnel=FUNNEL_LONG)
    direct.update(vals)
    assert hi.fold_to(p2).to_bytes() == direct.to_bytes()
    assert hi.fold_to(p1).to_bytes() == hi.to_bytes()  # same-p fold = copy


def test_hll_fold_enables_mixed_precision_merge():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2**62, size=100_000)
    fine = HllSketch(p=14, funnel=FUNNEL_LONG)
    fine.update(vals[:50_000])
    coarse = HllSketch(p=12, funnel=FUNNEL_LONG)
    coarse.update(vals[50_000:])
    assert not fine.is_compatible(coarse)
    merged = fine.fold_to(12).merge(coarse)
    direct = HllSketch(p=12, funnel=FUNNEL_LONG)
    direct.update(vals)
    assert merged.to_bytes() == direct.to_bytes()
    with pytest.raises(ValueError):
        coarse.fold_to(14)  # can't refine
    with pytest.raises(ValueError):
        coarse.fold_to(3)  # below the minimum precision


def test_hll_merge_is_union_not_sum():
    a, b = HllSketch(12, funnel=FUNNEL_LONG), HllSketch(12, funnel=FUNNEL_LONG)
    vals = np.arange(20000, dtype=np.int64)
    a.update(vals)
    b.update(vals)  # identical set
    a.merge(b)
    err = abs(a.estimate() - 20000) / 20000
    assert err <= a.relative_error_bound(3.0)


@pytest.mark.parametrize("eps,delta", [(0.001, 0.01), (0.0001, 0.01)])
def test_cms_geometry(eps, delta):
    w, d = cms_geometry(eps, delta)
    assert w == int(np.ceil(np.e / eps))
    assert d == int(np.ceil(np.log(1 / delta)))


def test_cms_one_sided_and_bounded():
    rng = np.random.default_rng(17)
    sk = CmsSketch(0.001, 0.01, funnel=FUNNEL_LONG)
    # zipf-ish frequencies
    data = rng.zipf(1.5, 200000) % 5000
    sk.update(data.astype(np.int64))
    true = np.bincount(data, minlength=5000)
    ests = sk.estimate(np.arange(5000, dtype=np.int64))
    assert (ests >= true).all(), "CMS must never underestimate"
    # ε·N bound with prob ≥ 1−δ: allow the δ fraction of violations
    violations = (ests - true > sk.error_bound()).mean()
    assert violations <= 0.01


def test_cms_weighted_updates():
    sk = CmsSketch(0.01, 0.01, funnel=FUNNEL_LONG)
    sk.update(np.array([7, 8], dtype=np.int64), weights=np.array([100, 25]))
    assert sk.freq(7) >= 100
    assert sk.total == 125


def test_cms_heavy_hitters():
    rng = np.random.default_rng(23)
    sk = CmsSketch(0.001, 0.01, funnel=FUNNEL_LONG)
    # item 0 takes ~50% of mass, rest spread over 1000 items
    data = np.where(rng.random(100000) < 0.5, 0, rng.integers(1, 1000, 100000))
    sk.update(data.astype(np.int64))
    hh = sk.heavy_hitters(np.arange(1000, dtype=np.int64), phi=0.3)
    assert hh == [0]


def test_cms_heavy_hitters_null_candidates_do_not_shift_alignment():
    """estimate() drops nulls internally; a null candidate used to shift
    every later candidate against the wrong estimate (and could emit None
    as a heavy hitter carrying a real hitter's count)."""
    sk = CmsSketch(0.001, 0.01, funnel=FUNNEL_LONG)
    sk.update(np.repeat(np.int64(7), 1000))
    sk.update(np.arange(100, dtype=np.int64))
    hh = sk.heavy_hitters([3, None, 7, None, 4], phi=0.5)
    assert hh == [7]


@pytest.mark.parametrize("dist", ["normal", "uniform", "lognormal", "bimodal"])
def test_kll_rank_error(dist):
    rng = np.random.default_rng(abs(hash(dist)) % 2**31)
    n = 150000
    if dist == "normal":
        vals = rng.normal(0, 1, n)
    elif dist == "uniform":
        vals = rng.random(n)
    elif dist == "lognormal":
        vals = rng.lognormal(4, 0.6, n)
    else:
        vals = np.concatenate([rng.normal(-5, 1, n // 2), rng.normal(5, 0.1, n // 2)])
    sk = KllSketch(200)
    sk.update(vals)
    qs = np.array([0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99])
    est = sk.quantile(qs)
    srt = np.sort(vals)
    ranks = np.searchsorted(srt, est) / n
    assert (np.abs(ranks - qs) <= sk.rank_error_bound()).all(), dist


@pytest.mark.parametrize("dist", ["normal", "lognormal"])
def test_tdigest_rank_error_and_tails(dist):
    rng = np.random.default_rng(abs(hash(dist)) % 2**31 + 1)
    n = 150000
    vals = rng.normal(0, 1, n) if dist == "normal" else rng.lognormal(4, 0.6, n)
    sk = TDigestSketch(200)
    sk.update(vals)
    srt = np.sort(vals)
    qs = np.array([0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999])
    est = sk.quantile(qs)
    ranks = np.searchsorted(srt, est) / n
    errs = np.abs(ranks - qs)
    assert (errs <= sk.rank_error_bound()).all()
    # tail accuracy: extreme-quantile error far below mid-quantile bound
    assert errs[0] <= 0.001 and errs[-1] <= 0.001
    assert sk.centroid_count() <= sk.delta + 1


def test_tdigest_merge_within_bound():
    rng = np.random.default_rng(31)
    vals = rng.normal(0, 1, 100000)
    parts = np.array_split(vals, 8)
    digs = []
    for part in parts:
        d = TDigestSketch(200)
        d.update(part)
        digs.append(d)
    acc = digs[0]
    for d in digs[1:]:
        acc.merge(d)
    srt = np.sort(vals)
    qs = np.array([0.05, 0.5, 0.95])
    ranks = np.searchsorted(srt, acc.quantile(qs)) / len(vals)
    assert (np.abs(ranks - qs) <= acc.rank_error_bound()).all()


def test_kll_merge_within_bound():
    rng = np.random.default_rng(37)
    vals = rng.lognormal(2, 1, 100000)
    parts = np.array_split(vals, 16)
    sks = []
    for part in parts:
        s = KllSketch(200)
        s.update(part)
        sks.append(s)
    acc = sks[0]
    for s in sks[1:]:
        acc.merge(s)
    assert acc.n == len(vals)
    srt = np.sort(vals)
    qs = np.array([0.1, 0.5, 0.9])
    ranks = np.searchsorted(srt, acc.quantile(qs)) / len(vals)
    assert (np.abs(ranks - qs) <= acc.rank_error_bound()).all()


def test_quantile_sketch_rank_queries():
    vals = np.arange(10000, dtype=np.float64)
    for sk in (KllSketch(200), TDigestSketch(200)):
        sk.update(vals)
        r = sk.rank(np.array([5000.0]))[0]
        assert abs(r - 0.5) <= sk.rank_error_bound()


def test_hll_set_operation_estimates():
    a, b = HllSketch(13, funnel=FUNNEL_LONG), HllSketch(13, funnel=FUNNEL_LONG)
    a.update(np.arange(0, 60000, dtype=np.int64))
    b.update(np.arange(40000, 100000, dtype=np.int64))  # overlap = 20000
    union = a.union_estimate(b)
    inter = a.intersect_estimate(b)
    assert abs(union - 100000) / 100000 <= a.relative_error_bound()
    assert abs(inter - 20000) / 20000 <= 0.15  # compounded error, loose check
    # union_estimate must not mutate its operands
    assert abs(a.estimate() - 60000) / 60000 <= a.relative_error_bound()


def test_cms_inner_product_join_size_bound():
    """CMS inner product (cms.py): one-sided join-size overestimate within
    eps*Na*Nb (Cormode-Muthukrishnan 2005 section 4.2)."""
    import numpy as np

    from guava_probably_spark.sketches import FUNNEL_LONG, CmsSketch

    rng = np.random.default_rng(5)
    a_items = rng.integers(0, 2000, size=30_000)
    b_items = rng.integers(1000, 3000, size=8_000)
    a = CmsSketch(epsilon=1e-4, delta=0.01, funnel=FUNNEL_LONG)
    b = CmsSketch(epsilon=1e-4, delta=0.01, funnel=FUNNEL_LONG)
    a.update(a_items.astype(np.int64))
    b.update(b_items.astype(np.int64))
    ca = np.bincount(a_items, minlength=3000)
    cb = np.bincount(b_items, minlength=3000)
    true = int((ca * cb).sum())
    est = a.inner_product(b)
    assert true <= est <= true + a.inner_product_bound(b)


def test_kll_corrupt_negative_level_length_raises():
    """A negative level length must raise ValueError at decode (the
    checkpoint heal contract), not make np.frombuffer read all remaining
    bytes into garbage levels."""
    import struct

    from guava_probably_spark.sketches import Sketch
    from guava_probably_spark.sketches.kll import KllSketch

    sk = KllSketch(k=64)
    sk.update(np.arange(10_000, dtype=np.float64))
    blob = bytearray(sk.to_bytes())
    # find the first level-length field in the payload and corrupt it
    raw = sk._payload_bytes()
    pos = blob.rindex(raw)  # payload location inside the blob
    struct.pack_into("<q", blob, pos + 4, -1)
    with pytest.raises(ValueError):
        Sketch.from_bytes(bytes(blob))


def test_kll_rank_scalar_returns_float():
    from guava_probably_spark.sketches.kll import KllSketch

    sk = KllSketch(k=64)
    sk.update(np.arange(1000, dtype=np.float64))
    r = sk.rank(500.0)
    assert isinstance(r, float) and abs(r - 0.5) < 0.1
    arr = sk.rank([100.0, 900.0])
    assert isinstance(arr, np.ndarray) and len(arr) == 2


def test_fold_sketch_rows_threaded_decode_equals_sequential():
    """The gated thread-pool decode (≥8 blob rows AND ≥4MB) must produce
    the same fold as the sequential path — merge order is input order in
    both."""
    import numpy as np

    from guava_probably_spark.operators import build as build_mod
    from guava_probably_spark.operators.build import fold_sketch_rows
    from guava_probably_spark.sketches import SketchSpec
    from guava_probably_spark.sketches.base import FUNNEL_LONG

    rng = np.random.default_rng(21)
    spec = SketchSpec("bloom", {"capacity": 2_000_000, "fpp": 0.01})
    rows = []
    members = []
    for i in range(10):
        sk = spec.create()
        sk.funnel = FUNNEL_LONG
        vals = rng.choice(10**10, 50_000, replace=False) + i * 10**10
        sk.update(vals)
        members.append(vals[:100])
        rows.append((sk.to_bytes(), 50_000, 0))
    total_bytes = sum(len(r[0]) for r in rows)
    assert total_bytes >= 4_000_000, "fixture must cross the thread gate"

    acc_t, n_t, ov_t = fold_sketch_rows(list(rows), dedup=True)
    # force the sequential path by raising the gate
    old = build_mod._FOLD_DECODE_MIN_ROWS
    build_mod._FOLD_DECODE_MIN_ROWS = 10**9
    try:
        acc_s, n_s, ov_s = fold_sketch_rows(list(rows), dedup=True)
    finally:
        build_mod._FOLD_DECODE_MIN_ROWS = old
    assert (n_t, ov_t) == (n_s, ov_s)
    assert acc_t.to_bytes() == acc_s.to_bytes()
    for vals in members:
        assert acc_t.might_contain_batch(vals).all()


def test_kll_fold_to_smaller_k_keeps_bound_and_merges_mixed_k():
    """fold_to(k2) transfers the weighted multiset and compacts under the
    smaller budget: folded estimates satisfy the k2 rank bound, n is
    preserved, and a fold→merge mixed-k workflow stays within bound."""
    from guava_probably_spark.sketches import KllSketch

    rng = np.random.default_rng(17)
    a_data = rng.lognormal(0.0, 2.0, 60_000)
    b_data = rng.normal(100.0, 5.0, 40_000)
    fine = KllSketch(k=400)
    fine.update(a_data)
    folded = fine.fold_to(100)
    assert folded.k == 100 and folded.n == fine.n == len(a_data)
    srt = np.sort(a_data)
    qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
    ranks = np.searchsorted(srt, folded.quantile(qs)) / len(srt)
    assert (np.abs(ranks - qs) <= folded.rank_error_bound()).all()
    # mixed-k merge: fold the finer side, then merge with a native k=100
    native = KllSketch(k=100)
    native.update(b_data)
    merged = folded.merge(native)
    both = np.sort(np.concatenate([a_data, b_data]))
    ranks2 = np.searchsorted(both, merged.quantile(qs)) / len(both)
    assert (np.abs(ranks2 - qs) <= merged.rank_error_bound()).all()
    with pytest.raises(ValueError):
        fine.fold_to(401)
    with pytest.raises(ValueError):
        fine.fold_to(4)


def test_tdigest_fold_to_smaller_delta_keeps_bound():
    from guava_probably_spark.sketches import TDigestSketch

    rng = np.random.default_rng(23)
    data = rng.exponential(3.0, 80_000)
    fine = TDigestSketch(delta=400.0)
    fine.update(data)
    folded = fine.fold_to(100.0)
    assert folded.delta == 100.0 and folded.n == len(data)
    assert len(folded.means) <= len(fine.means)
    srt = np.sort(data)
    qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
    ranks = np.searchsorted(srt, folded.quantile(qs)) / len(srt)
    assert (np.abs(ranks - qs) <= folded.rank_error_bound()).all()
    # folding must not corrupt the source digest (read-path compress only)
    ranks_fine = np.searchsorted(srt, fine.quantile(qs)) / len(srt)
    assert (np.abs(ranks_fine - qs) <= fine.rank_error_bound()).all()
    with pytest.raises(ValueError):
        fine.fold_to(500.0)


def test_cms_fold_exact_byte_identity_and_merge_commutation(spark):
    """CMS width-fold (m | w): byte-identical to a direct build at the
    folded geometry, commutes with merge byte-for-byte (counts are linear),
    estimates bracket under the folded ε₂ = e/w₂ bound, and the SQL
    ``sketch_fold(sketch, m)`` surface dispatches to it."""
    import math
    from collections import Counter

    from guava_probably_spark.functions import register_sql
    from guava_probably_spark.sketches import Sketch
    from guava_probably_spark.sketches.base import IncompatibleSketchError

    eps = math.e / 4096 * (1 + 1e-9)  # w = exactly 4096
    delta = 1e-6  # d = 14: per-item bound failures ~1e-6, none expected
    vals_a = [f"item{i % 700}" for i in range(5000)]
    vals_b = [f"item{(i * 3) % 900}" for i in range(4000)]
    a = CmsSketch(eps, delta)
    a.update(vals_a)
    assert a.w == 4096
    b = CmsSketch(eps, delta)
    b.update(vals_b)
    m = 4
    # fold == direct build at the folded geometry (fold-of-empty + update)
    direct = CmsSketch(eps, delta).fold_to(m)
    direct.update(vals_a)
    f = a.fold_to(m)
    assert f.w == 1024 and f.total == a.total
    assert f.to_bytes() == direct.to_bytes()
    # commutes with merge byte-for-byte
    assert (
        a.copy().merge(b).fold_to(m).to_bytes()
        == a.fold_to(m).merge(b.fold_to(m)).to_bytes()
    )
    # folded estimates still bracket: exact <= est <= exact + e/w2 * N
    exact = Counter(vals_a)
    items = sorted(exact)
    ests = f.estimate(items)
    for v, e_ in zip(items, ests):
        assert exact[v] <= e_ <= exact[v] + f.error_bound(), v
    # identity fold, bad divisors, mixed-geometry merge guard
    assert a.fold_to(1).to_bytes() == a.to_bytes()
    with pytest.raises(ValueError):
        a.fold_to(3)  # does not divide 4096
    with pytest.raises(ValueError):
        a.fold_to(0)
    with pytest.raises(IncompatibleSketchError):
        a.copy().merge(f)
    # SQL surface: sketch_fold(sketch, 4) over a temp view
    register_sql(spark)
    import pandas as pd

    spark.createDataFrame(pd.DataFrame({"sketch": [a.to_bytes()]})).createOrReplaceTempView(
        "cms_fold_v"
    )
    blob = spark.sql("SELECT sketch_fold(sketch, 4) AS s FROM cms_fold_v").collect()[0].s
    assert bytes(blob) == f.to_bytes()
    assert Sketch.from_bytes(bytes(blob)).w == 1024


def test_tdigest_weighted_quantiles_match_expanded():
    """A weight-w value is w copies in the weighted CDF: quantiles of the
    weighted build sit within the rank bound of the exact weighted
    distribution, and total weight is preserved exactly."""
    import numpy as np

    from guava_probably_spark.sketches import TDigestSketch

    rng = np.random.default_rng(5)
    vals = rng.normal(100, 25, 4000)
    w = rng.integers(1, 50, 4000).astype(np.float64)
    sk = TDigestSketch(delta=200.0)
    sk.update(vals, weights=w)
    sk._compress()  # weights are centroid state; flush the batch buffer
    assert abs(sk.weights.sum() - w.sum()) <= 1e-6 * w.sum()
    # exact weighted CDF
    order = np.argsort(vals)
    sv, sw = vals[order], w[order]
    cdf = np.cumsum(sw) / sw.sum()
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        est = float(sk.quantile(q))
        rank = float(np.interp(est, sv, cdf))
        assert abs(rank - q) <= sk.rank_error_bound() + 0.01
    # NaN / nonpositive weights drop the value
    sk2 = TDigestSketch(delta=100.0)
    sk2.update(np.array([1.0, 2.0, 3.0]), weights=np.array([np.nan, -1.0, 5.0]))
    sk2._compress()
    assert sk2.weights.sum() == 5.0


def test_tdigest_weighted_distributed_build(spark):
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import collect_weighted_sketch
    from guava_probably_spark.sketches import SketchSpec

    df = spark.range(0, 20000).select(
        (F.col("id") % 500).cast("double").alias("v"),
        (F.col("id") % 9 + 1).alias("w"),
    )
    sk, n, _ = collect_weighted_sketch(
        df, "v", "w", SketchSpec("tdigest", {"delta": 200.0})
    )
    assert n == 20000
    total = df.agg(F.sum("w")).collect()[0][0]
    assert abs(sk.weights.sum() - total) <= 1e-6 * total
    med = float(sk.quantile(0.5))
    # exact weighted median of (id % 500) weighted by (id % 9 + 1): the
    # weight pattern is uniform across v, so the weighted median ~ 250
    assert 230 <= med <= 270


def test_kll_weighted_quantiles_match_expanded():
    """Weighted KLL == the expanded multiset: quantiles within the k
    bound of the exact weighted CDF; weight bits land as level inserts."""
    import numpy as np

    from guava_probably_spark.sketches import KllSketch

    rng = np.random.default_rng(9)
    vals = rng.normal(50, 12, 3000)
    w = rng.integers(1, 40, 3000)
    sk = KllSketch(k=200)
    sk.update(vals, weights=w)
    assert sk.n == int(w.sum())
    # exact weighted CDF via expansion (small enough here)
    expanded = np.repeat(vals, w)
    srt = np.sort(expanded)
    for q in (0.1, 0.5, 0.9):
        est = float(sk.quantile(q))
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) <= sk.rank_error_bound() + 0.005
    # weighted and unit builds agree with each other on the same multiset
    unit = KllSketch(k=200)
    unit.update(expanded)
    for q in (0.25, 0.75):
        r1 = np.searchsorted(srt, float(sk.quantile(q))) / len(srt)
        r2 = np.searchsorted(srt, float(unit.quantile(q))) / len(srt)
        assert abs(r1 - r2) <= 2 * sk.rank_error_bound()
    # NaN values / sub-1 weights drop
    sk2 = KllSketch(k=64)
    sk2.update(np.array([np.nan, 2.0, 3.0]), weights=np.array([5, 0.2, 4]))
    assert sk2.n == 4


def test_grouped_weighted_tdigest_quantiles(spark):
    """Per-key token-weighted quantiles: build_grouped(weight_col=...) +
    the weighted t-digest compose with zero new plumbing — each group's
    median sits at rank 0.5 of ITS exact weighted CDF."""
    import numpy as np
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import build_grouped
    from guava_probably_spark.sketches import SketchSpec, Sketch

    df = spark.range(0, 30000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 1000).cast("double").alias("v"),
        (F.col("id") % 7 + 1).alias("w"),
    )
    g = build_grouped(
        df, "g", "v", SketchSpec("tdigest", {"delta": 200.0}), weight_col="w"
    )
    rows = {r.g: Sketch.from_bytes(bytes(r.sketch)) for r in g.collect()}
    assert len(rows) == 4
    pdf = df.toPandas()
    for grp, sk in rows.items():
        sub = pdf[pdf.g == grp]
        srt = np.sort(np.repeat(sub.v.to_numpy(), sub.w.to_numpy()))
        rank = np.searchsorted(srt, float(sk.quantile(0.5))) / len(srt)
        assert abs(rank - 0.5) <= sk.rank_error_bound() + 0.01
        assert abs(sk.weights.sum() - sub.w.sum()) <= 1e-6 * sub.w.sum()


def test_tdigest_weighted_nan_values_stay_aligned():
    """A NaN VALUE must drop jointly with its weight, not shift the weight
    alignment (review find: _to_float_array dropped NaN before the length
    check, crashing — or worse, silently misaligning — weighted updates)."""
    import numpy as np

    from guava_probably_spark.sketches import TDigestSketch

    sk = TDigestSketch(delta=100.0)
    sk.update(
        np.array([1.0, np.nan, 3.0, np.nan, 5.0]),
        weights=np.array([2.0, 7.0, 4.0, 9.0, 6.0]),
    )
    sk._compress()
    assert sk.weights.sum() == 12.0  # 2 + 4 + 6; the NaN rows' 7/9 dropped
    assert sk.vmin == 1.0 and sk.vmax == 5.0


def test_ks_distance_detects_shift_and_null_case():
    """KS between two quantile blobs: ~2Φ(δ/2)−1 for a mean shift δ of
    same-σ normals, ~0 for identical distributions — within the combined
    rank bounds. Works for KLL and t-digest alike."""
    import math

    import numpy as np

    from guava_probably_spark.functions import ks_distance
    from guava_probably_spark.sketches import KllSketch, TDigestSketch

    rng = np.random.default_rng(11)
    base = rng.normal(0.0, 1.0, 60000)
    shifted = rng.normal(0.5, 1.0, 60000)
    true_ks = math.erf(0.5 / (2 * math.sqrt(2)))  # 2*Phi(delta/2) - 1
    for mk in (lambda: KllSketch(k=200), lambda: TDigestSketch(delta=200.0)):
        a, b, c = mk(), mk(), mk()
        a.update(base)
        b.update(shifted)
        c.update(rng.normal(0.0, 1.0, 60000))
        tol = a.rank_error_bound() + b.rank_error_bound() + 2 / 512 + 0.01
        assert abs(ks_distance(a, b) - true_ks) <= tol
        assert ks_distance(a, c) <= tol  # same distribution -> no alarm


def test_sketch_ks_sql_surface(spark):
    import numpy as np

    from guava_probably_spark.functions import register_sql
    from guava_probably_spark.sketches import KllSketch

    register_sql(spark)
    rng = np.random.default_rng(3)
    a, b = KllSketch(k=200), KllSketch(k=200)
    a.update(rng.exponential(1.0, 30000))
    b.update(rng.exponential(2.0, 30000))
    spark.createDataFrame(
        [(bytearray(a.to_bytes()), bytearray(b.to_bytes()))], "a binary, b binary"
    ).createOrReplaceTempView("ksv")
    d = spark.sql("SELECT sketch_ks(a, b) d FROM ksv").collect()[0].d
    # exact KS between Exp(1) and Exp(1/2): sup at x = 2 ln 2, value 0.25
    assert abs(d - 0.25) <= 2 * a.rank_error_bound() + 0.02
    # NULL input -> SQL NULL (not NaN): IS NOT NULL must filter it out
    spark.createDataFrame(
        [(bytearray(a.to_bytes()), None)], "a binary, b binary"
    ).createOrReplaceTempView("ksv_null")
    assert (
        spark.sql("SELECT sketch_ks(a, b) d FROM ksv_null").collect()[0].d is None
    )
    assert (
        spark.sql(
            "SELECT count(*) c FROM (SELECT sketch_ks(a, b) d FROM ksv_null) "
            "WHERE d IS NOT NULL"
        ).collect()[0].c
        == 0
    )


def test_ks_distance_works_for_dd_and_req():
    """The KS monitor's kind claim: DD and REQ blobs (value-relative and
    sharp-tail quantile sketches) feed ks_distance too — a lognormal
    log-space shift of 0.4 has the same KS as the underlying normals."""
    import math

    import numpy as np

    from guava_probably_spark.functions import ks_distance
    from guava_probably_spark.sketches import DDSketch, ReqSketch

    rng = np.random.default_rng(7)
    true = math.erf(0.4 / (2 * math.sqrt(2)))
    for mk in (lambda: DDSketch(alpha=0.01), lambda: ReqSketch(k=32)):
        a, b = mk(), mk()
        a.update(rng.lognormal(0, 1, 40000))
        b.update(rng.lognormal(0.4, 1, 40000))
        assert abs(ks_distance(a, b) - true) <= 0.03
