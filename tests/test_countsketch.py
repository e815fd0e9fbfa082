"""CountSketch (Charikar–Chen–Farach-Colton 2002) — unbiased two-sided
frequency estimates, AMS/Thorup–Zhang F2 and inner products, byte-equal
merge/fold determinism class. Shared contract tests (round-trip, merge
byte-algebra, compatibility gates, corrupt-blob fuzz) run in
test_contracts.py's parametrized suite; this file covers the estimator
guarantees and the Spark-side build parity."""

import numpy as np
import pytest

from guava_probably_spark.sketches import CountSketch, Sketch, SketchSpec
from guava_probably_spark.sketches.base import (
    FUNNEL_LONG,
    FUNNEL_PREHASHED,
    FUNNEL_UTF8,
    IncompatibleSketchError,
)


def _zipf_stream(n=200_000, seed=7):
    rng = np.random.default_rng(seed)
    items = rng.zipf(1.3, n)
    return items[items < 100_000].astype(np.int64)


def _exact(items):
    vals, cnts = np.unique(items, return_counts=True)
    f2 = int((cnts.astype(object) ** 2).sum())
    return vals, cnts, f2


def test_point_estimates_unbiased_and_within_bound():
    items = _zipf_stream()
    vals, cnts, f2 = _exact(items)
    sk = CountSketch(width=4096, depth=5, funnel=FUNNEL_LONG)
    sk.update(items)
    est = sk.estimate(vals)
    err = est - cnts
    # two-sided: under- AND over-estimates occur (CMS never underestimates)
    assert (err < 0).any() and (err > 0).any()
    # the hash-seeded estimator is deterministic; on this stream every
    # point error sits inside the sqrt(3*F2/w) band
    assert np.abs(err).max() <= sk.error_bound()
    # unbiasedness shows as a near-zero mean signed error across many items
    assert abs(float(err.mean())) < 1.0


def test_estimates_are_exact_integers_for_odd_depth():
    """d odd → the median IS a counter value: integer in, integer out."""
    sk = CountSketch(width=512, depth=5, funnel=FUNNEL_LONG)
    sk.update(np.arange(1000, dtype=np.int64))
    est = sk.estimate(np.arange(50, dtype=np.int64))
    assert est.dtype == np.int64
    with pytest.raises(ValueError):
        CountSketch(width=512, depth=4)
    with pytest.raises(ValueError):
        CountSketch(width=1, depth=5)


def test_f2_self_join_size_within_bound():
    items = _zipf_stream(seed=11)
    _, _, f2 = _exact(items)
    sk = CountSketch(width=4096, depth=5, funnel=FUNNEL_LONG)
    sk.update(items)
    assert abs(sk.f2() - f2) <= sk.f2_bound() * f2


def test_inner_product_join_size_two_sided_within_bound():
    a_items = _zipf_stream(seed=7)
    b_items = _zipf_stream(n=150_000, seed=23)
    av, ac, _ = _exact(a_items)
    bmap = dict(zip(*[x.tolist() for x in np.unique(b_items, return_counts=True)]))
    true_ip = sum(c * bmap.get(v, 0) for v, c in zip(av.tolist(), ac.tolist()))
    a = CountSketch(width=4096, depth=5, funnel=FUNNEL_LONG)
    b = CountSketch(width=4096, depth=5, funnel=FUNNEL_LONG)
    a.update(a_items)
    b.update(b_items)
    assert abs(a.inner_product(b) - true_ip) <= a.inner_product_bound(b)
    # symmetric (exact integer arithmetic, same rows)
    assert a.inner_product(b) == b.inner_product(a)


def test_weighted_updates_match_repetition():
    """update(values, weights) == inserting each value weight times."""
    vals = np.arange(100, dtype=np.int64)
    w = np.arange(1, 101, dtype=np.int64)
    a = CountSketch(width=1024, depth=5, funnel=FUNNEL_LONG)
    a.update(vals, weights=w)
    b = CountSketch(width=1024, depth=5, funnel=FUNNEL_LONG)
    b.update(np.repeat(vals, w))
    assert a.to_bytes() == b.to_bytes()
    assert a.total == int(w.sum())


def test_fold_byte_identity_and_merge_commutation():
    items = _zipf_stream(seed=5)
    sk = CountSketch(width=4096, depth=5, funnel=FUNNEL_LONG)
    sk.update(items)
    direct = CountSketch(width=1024, depth=5, funnel=FUNNEL_LONG)
    direct.update(items)
    assert sk.fold_to(4).to_bytes() == direct.to_bytes()
    # fold commutes with merge byte-for-byte (counters are linear)
    half = len(items) // 2
    a = CountSketch(width=4096, depth=5, funnel=FUNNEL_LONG)
    b = CountSketch(width=4096, depth=5, funnel=FUNNEL_LONG)
    a.update(items[:half])
    b.update(items[half:])
    assert (
        a.copy().merge(b.copy()).fold_to(4).to_bytes()
        == a.fold_to(4).merge(b.fold_to(4)).to_bytes()
    )
    # folded sketch refuses to merge with the unfolded geometry
    with pytest.raises((IncompatibleSketchError, ValueError)):
        sk.fold_to(4).merge(sk)
    with pytest.raises(ValueError):
        sk.fold_to(3)  # 3 does not divide 4096
    assert sk.fold_to(1).to_bytes() == sk.to_bytes()


def test_estimates_survive_fold_at_coarser_bound():
    items = _zipf_stream(seed=3)
    vals, cnts, _ = _exact(items)
    sk = CountSketch(width=8192, depth=5, funnel=FUNNEL_LONG)
    sk.update(items)
    folded = sk.fold_to(8)
    err = np.abs(folded.estimate(vals) - cnts)
    assert err.max() <= folded.error_bound()


def test_utf8_funnel_and_funnel_gate():
    sk = CountSketch(width=512, depth=3, funnel=FUNNEL_UTF8)
    sk.update([f"tok-{i % 50}" for i in range(5000)])
    assert sk.freq("tok-0") != 0
    other = CountSketch(width=512, depth=3, funnel=FUNNEL_LONG)
    other.update(np.arange(100, dtype=np.int64))
    with pytest.raises((IncompatibleSketchError, ValueError)):
        sk.merge(other)


def test_distributed_build_byte_identical_to_local(spark):
    """collect_sketch over any partitioning == local one-shot build —
    the canonical-merge property through the real tree-merge operator."""
    from guava_probably_spark.operators import collect_sketch

    df = spark.range(40_000).selectExpr("concat('item-', id % 1000) AS v")
    local = CountSketch(width=2048, depth=5, funnel=FUNNEL_UTF8)
    local.update([f"item-{i % 1000}" for i in range(40_000)])
    for parts in (4, 13):
        sk, n, _ = collect_sketch(
            df.repartition(parts),
            "v",
            SketchSpec("countsketch", {"width": 2048, "depth": 5}),
        )
        assert n == 40_000
        assert sk.to_bytes() == local.to_bytes()
    # 1000 distinct values x 40 repeats: exact F2 is 1000 * 40^2
    assert abs(sk.f2() - 1000 * 1600) <= sk.f2_bound() * 1000 * 1600


def test_sql_sketch_fold_reaches_countsketch(spark):
    from guava_probably_spark.functions import register_sql

    register_sql(spark)
    items = _zipf_stream(seed=19)
    sk = CountSketch(width=4096, depth=5, funnel=FUNNEL_LONG)
    sk.update(items)
    direct = CountSketch(width=512, depth=5, funnel=FUNNEL_LONG)
    direct.update(items)
    row = (
        spark.createDataFrame([(sk.to_bytes(),)], "sketch binary")
        .selectExpr("sketch_fold(sketch, 8) AS f")
        .first()
    )
    assert bytes(row.f) == direct.to_bytes()


def test_prehashed_funnel_parity_with_jvm_xxhash64(spark):
    """FUNNEL_PREHASHED ingests JVM-computed xxhash64 values; the blob is
    deterministic in the hash stream, so a local build over collected
    hashes must equal a distributed build over the same column."""
    from guava_probably_spark.operators import collect_sketch

    df = spark.range(20_000).selectExpr(
        "concat('conv-', id % 777) AS v", "xxhash64(concat('conv-', id % 777)) AS h"
    )
    hashes = np.array([r.h for r in df.select("h").collect()], dtype=np.int64)
    local = CountSketch(width=2048, depth=5, funnel=FUNNEL_PREHASHED)
    local.update(hashes)
    dist, n, _ = collect_sketch(
        df.select("h").repartition(7),
        "h",
        SketchSpec(
            "countsketch", {"width": 2048, "depth": 5, "funnel": FUNNEL_PREHASHED}
        ),
    )
    assert n == 20_000
    assert dist.to_bytes() == local.to_bytes()
    # prehashed blobs refuse murmur3-funnel merges (register domains differ)
    mur = CountSketch(width=2048, depth=5, funnel=FUNNEL_UTF8)
    with pytest.raises((IncompatibleSketchError, ValueError)):
        local.merge(mur)


def test_sql_cs_f2_matches_local(spark):
    from guava_probably_spark.functions import register_sql

    register_sql(spark)
    sk = CountSketch(width=1024, depth=5, funnel=FUNNEL_LONG)
    sk.update(np.arange(20_000, dtype=np.int64) % 500)
    row = (
        spark.createDataFrame([(sk.to_bytes(),)], "sketch binary")
        .selectExpr("cs_f2(sketch) AS f2")
        .first()
    )
    assert row.f2 == sk.f2()
    # 500 keys x 40 repeats: exact F2 = 500 * 1600, estimate within bound
    assert abs(row.f2 - 500 * 1600) <= sk.f2_bound() * 500 * 1600
