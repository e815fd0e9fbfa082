"""Bottom-k value sample sketch (sketches/bottomk.py): uniform distinct-key
sampling with witnesses, canonical merges, Jaccard with evidence."""

import numpy as np
import pytest

from guava_probably_spark.sketches import BottomKSketch, Sketch, SketchSpec
from guava_probably_spark.sketches.base import (
    FUNNEL_LONG,
    FUNNEL_PREHASHED,
    FUNNEL_UTF8,
    IncompatibleSketchError,
)


def test_exact_below_saturation_and_duplicate_blind():
    """Below k the sketch IS the distinct set — and a key duplicated 10^3
    times occupies exactly one slot (the sample is over the distinct
    domain, not the row stream)."""
    sk = BottomKSketch(64)
    sk.update(["hot"] * 1000 + [f"u{i}" for i in range(40)])
    assert sk.size == 41
    assert sk.estimate() == 41.0
    assert sorted(sk.sample()) == sorted(["hot"] + [f"u{i}" for i in range(40)])


def test_estimate_within_published_bound():
    sk = BottomKSketch(512)
    sk.update([f"key-{i}" for i in range(200_000)])
    rel = abs(sk.estimate() - 200_000) / 200_000
    assert rel <= sk.relative_error_bound()  # 3/sqrt(k-1)


def test_merge_canonical_and_equal_to_whole_build():
    """Any merge tree over any partitioning is byte-identical to the
    one-shot build — the blob determinism class shared with HLL/theta."""
    vals = [f"doc{i}" for i in range(50_000)]
    whole = BottomKSketch(1024)
    whole.update(vals)
    for nparts in (2, 7):
        parts = [vals[i::nparts] for i in range(nparts)]
        sks = []
        for p in parts:
            s = BottomKSketch(1024)
            s.update(p)
            sks.append(s)
        merged = sks[0]
        for s in sks[1:]:
            merged = merged.merge(s)
        assert merged.to_bytes() == whole.to_bytes()


def test_sample_is_uniform_over_distinct_keys():
    """Chi-square-ish check: the retained sample hits every decile of the
    key domain (hash order is independent of key order), and repeated
    builds give the identical sample (deterministic in the data)."""
    keys = [f"k{i:06d}" for i in range(100_000)]
    a = BottomKSketch(2000)
    a.update(keys)
    b = BottomKSketch(2000)
    b.update(list(reversed(keys)))
    assert a.to_bytes() == b.to_bytes()  # order-blind
    ids = np.array([int(s[1:]) for s in a.sample()])
    deciles = np.histogram(ids, bins=10, range=(0, 100_000))[0]
    assert (deciles > 100).all()  # expect 200/decile; >100 is ~7 sigma slack


def test_jaccard_estimate_and_witnesses():
    a = BottomKSketch(2048)
    a.update([f"w{i}" for i in range(30_000)])
    b = BottomKSketch(2048)
    b.update([f"w{i}" for i in range(15_000, 45_000)])
    true_j = 15_000 / 45_000
    assert abs(a.jaccard_estimate(b) - true_j) <= 3 / np.sqrt(2048) + 0.01
    wit = a.common_values(b)
    assert wit, "intersection sample should not be empty at this overlap"
    assert all(15_000 <= int(w[1:]) < 30_000 for w in wit)
    # symmetric witnesses: same hash set from either side
    assert sorted(wit) == sorted(b.common_values(a))


def test_fold_to_byte_identical_to_direct_build():
    vals = [f"x{i}" for i in range(20_000)]
    big = BottomKSketch(1024)
    big.update(vals)
    small = BottomKSketch(64)
    small.update(vals)
    assert big.fold_to(64).to_bytes() == small.to_bytes()
    with pytest.raises(ValueError):
        big.fold_to(8)
    with pytest.raises(ValueError):
        big.fold_to(2048)


def test_long_funnel_round_trips_negatives_and_large():
    sk = BottomKSketch(32, funnel=FUNNEL_LONG)
    vals = [-(2**62), -1, 0, 1, 2**62]
    sk.update(np.array(vals, dtype=np.int64))
    assert sorted(sk.sample()) == sorted(vals)
    back = Sketch.from_bytes(sk.to_bytes())
    assert sorted(back.sample()) == sorted(vals)


def test_funnel_mismatch_raises():
    sk = BottomKSketch(32, funnel=FUNNEL_LONG)
    with pytest.raises(IncompatibleSketchError):
        sk.update(["a", "b"])
    skp = BottomKSketch(32, funnel=FUNNEL_PREHASHED)
    with pytest.raises(IncompatibleSketchError):
        skp.update(["not-a-hash"])
    s = BottomKSketch(32, funnel=FUNNEL_UTF8)
    t = BottomKSketch(32, funnel=FUNNEL_LONG)
    assert not s.is_compatible(t)


def test_collision_tiebreak_is_merge_order_independent():
    """Synthetic 64-bit hash collisions (impossible to construct from real
    keys) resolve to the smaller value bytes from EITHER fold order."""
    h = np.array([42, 42, 7], dtype=np.uint64)
    a = BottomKSketch(16)
    a._fold(h[:1], [b"zebra"])
    a._fold(h[1:], [b"apple", b"mid"])
    b = BottomKSketch(16)
    b._fold(h[1:], [b"apple", b"mid"])
    b._fold(h[:1], [b"zebra"])
    assert a.to_bytes() == b.to_bytes()
    assert a.values[a.hashes.tolist().index(42)] == b"apple"


def test_nulls_dropped_and_empty_noop():
    sk = BottomKSketch(32)
    sk.update([])
    sk.update([None, None])
    sk.update(["a", None, "b"])
    assert sorted(sk.sample()) == ["a", "b"]


def test_distributed_build_byte_identical_to_local(spark):
    """collect_sketch over any partitioning == local one-shot build: the
    canonical-merge property through the real tree-merge operator."""
    from guava_probably_spark.operators import collect_sketch

    df = spark.range(40_000).selectExpr("concat('item-', id) AS v")
    local = BottomKSketch(512)
    local.update([f"item-{i}" for i in range(40_000)])
    for parts in (4, 13):
        sk, n, _ = collect_sketch(
            df.repartition(parts), "v", SketchSpec("bottomk", {"k": 512})
        )
        assert n == 40_000
        assert sk.to_bytes() == local.to_bytes()
    assert abs(sk.estimate() - 40_000) / 40_000 <= sk.relative_error_bound()
    # witnesses decode back to real column values
    assert all(s.startswith("item-") for s in sk.sample(50))


def test_grouped_bottomk_stratified_distinct_samples(spark):
    """Stratified distinct-key sampling in ONE grouped pass: per-key blobs
    through the generic salted builder are byte-identical to local builds
    over that key's rows, and below saturation each group's sample IS its
    exact distinct set."""
    import os

    from guava_probably_spark.operators import build_grouped

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    spec = SketchSpec("bottomk", {"k": 256})
    g = build_grouped(events, "event_type", "user_id", spec, salt=4)
    got = {r.event_type: Sketch.from_bytes(r.sketch) for r in g.collect()}
    pdf = events.select("event_type", "user_id").toPandas()
    assert set(got) == set(pdf["event_type"].unique())
    for et, grp in pdf.groupby("event_type"):
        local = BottomKSketch(256, funnel=FUNNEL_LONG)
        local.update(grp["user_id"].to_numpy())
        assert got[et].to_bytes() == local.to_bytes()
        exact = {int(u) for u in grp["user_id"].unique()}
        sample = set(got[et].sample())
        if len(exact) <= 256:
            assert sample == exact
        else:
            assert len(sample) == 256 and sample <= exact
