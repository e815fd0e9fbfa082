"""Misra–Gries mergeable heavy-hitter summary (sketches/mg.py).

Contract: c(x) ≤ f(x) ≤ c(x) + e with e ≤ n/(k+1); no false negatives for
items above the bound; mergeable with the (k+1)-th-largest decrement rule
(error additive across merges); canonical serialization round-trip;
distributed build through the standard partial+tree-merge pipeline.
"""

import os
import random

import numpy as np
import pytest

from pyspark.sql import functions as F

from guava_probably_spark.sketches import MisraGriesSketch, Sketch, SketchSpec
from guava_probably_spark.sketches.base import IncompatibleSketchError

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _zipf_stream(n, n_items, seed):
    rng = random.Random(seed)
    return [f"item_{int(rng.paretovariate(1.2)) % n_items}" for _ in range(n)]


def test_mg_bounds_and_no_false_negatives():
    stream = _zipf_stream(50_000, 1000, seed=7)
    k = 64
    sk = MisraGriesSketch(k=k)
    for i in range(0, len(stream), 4096):
        sk.update(np.array(stream[i : i + 4096], dtype=object))
    from collections import Counter

    true = Counter(stream)
    n = len(stream)
    assert sk.n == n
    assert sk.e <= n / (k + 1)
    for item, c in sk.counters.items():
        assert c <= true[item] <= c + sk.e  # one-sided undercount
    phi = 0.02
    hh = sk.heavy_hitters(phi)
    for item, f in true.items():
        if f >= phi * n:
            assert item in hh  # every true heavy hitter survives


def test_mg_merge_error_additive_and_order_insensitive_bounds():
    stream = _zipf_stream(30_000, 500, seed=11)
    k = 48
    thirds = [stream[i::3] for i in range(3)]
    sks = []
    for part in thirds:
        s = MisraGriesSketch(k=k)
        s.update(np.array(part, dtype=object))
        sks.append(s)
    left = sks[0].copy().merge(sks[1].copy()).merge(sks[2].copy())
    right = sks[0].copy().merge(sks[1].copy().merge(sks[2].copy()))
    from collections import Counter

    true = Counter(stream)
    n = len(stream)
    for m in (left, right):
        assert m.n == n
        assert m.e <= n / (k + 1)
        for item, c in m.counters.items():
            assert c <= true[item] <= c + m.e


def test_mg_serialization_round_trip_and_int_keys():
    sk = MisraGriesSketch(k=8)
    sk.update(np.array([1, 1, 2, 3, 3, 3, 4], dtype=np.int64))
    rt = Sketch.from_bytes(sk.to_bytes())
    assert isinstance(rt, MisraGriesSketch)
    assert rt.counters == sk.counters and rt.n == sk.n and rt.e == sk.e
    assert rt.to_bytes() == sk.to_bytes()  # canonical
    s2 = MisraGriesSketch(k=8)
    s2.update(np.array(["a", "b", "a"], dtype=object))
    rt2 = Sketch.from_bytes(s2.to_bytes())
    assert rt2.counters == {"a": 2, "b": 1}


def test_mg_incompatible_merge_raises():
    with pytest.raises(IncompatibleSketchError):
        MisraGriesSketch(k=8).merge(MisraGriesSketch(k=16))


def test_mg_distributed_matches_local(spark):
    from guava_probably_spark.operators import collect_sketch

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    sk, n, _ = collect_sketch(events, "event_type", SketchSpec("mg", {"k": 64}))
    assert n == events.count() == sk.n
    exact = {
        r.event_type: r.c
        for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    # few distinct types → k=64 never decrements → counts exact
    assert sk.e == 0
    assert sk.counters == exact


def test_mg_key_types_survive_roundtrip():
    """ADVICE r1 regression: bytes and int keys must round-trip with their
    ORIGINAL types (not silently become str), including non-UTF-8 bytes."""
    sk = MisraGriesSketch(k=16)
    sk.put(b"\xff\xfe\x00raw")  # not valid UTF-8
    sk.put(b"\xff\xfe\x00raw")
    sk.put("text")
    sk.put(42)
    rt = Sketch.from_bytes(sk.to_bytes())
    assert rt.estimate_count(b"\xff\xfe\x00raw") == 2
    assert rt.estimate_count("text") == 1
    assert rt.estimate_count(42) == 1
    assert rt.counters == sk.counters
    assert Sketch.from_bytes(rt.to_bytes()).counters == sk.counters


def test_mg_homogeneous_bytes_and_str_tags():
    """All-bytes sketches use the bytes tag; all-str the legacy str tag —
    both round-trip type-exact and blob-canonically."""
    b = MisraGriesSketch(k=8)
    for key in (b"\x00\x01", b"\xde\xad", b"\x00\x01"):
        b.put(key)
    rb = Sketch.from_bytes(b.to_bytes())
    assert rb.counters == b.counters and all(
        isinstance(key, bytes) for key in rb.counters
    )
    assert rb.to_bytes() == b.to_bytes()
    s = MisraGriesSketch(k=8)
    s.update(np.array(["x", "y", "x"], dtype=object))
    rs = Sketch.from_bytes(s.to_bytes())
    assert rs.counters == s.counters and all(
        isinstance(key, str) for key in rs.counters
    )


def test_mg_unsupported_key_type_rejected_clearly():
    """Unsupported key types fail with TypeError at serialization (not a
    masked 'corrupt sketch blob' at decode that would loop checkpoint heal)."""
    sk = MisraGriesSketch(k=4)
    sk.put(3.14)
    with pytest.raises(TypeError, match="unsupported MG key type"):
        sk.to_bytes()


def test_mg_weighted_update_equals_instance_stream():
    """update(items, weights=c) lands the same counters as ingesting each
    item c times (one batch each way — identical fold + one decrement
    round), n counts total WEIGHT, and the e ≤ W/(k+1) bound holds; the
    weighted put() agrees; negative weights are rejected."""
    import pyarrow as pa

    stream = _zipf_stream(20_000, 400, seed=13)
    from collections import Counter

    cnt = Counter(stream)
    items = sorted(cnt)
    weights = np.array([cnt[i] for i in items], dtype=np.int64)

    a = MisraGriesSketch(k=48)
    a.update(pa.array(items), weights=weights)
    b = MisraGriesSketch(k=48)
    b.update(pa.array(sorted(stream)))  # same per-key totals in one batch
    assert a.n == b.n == len(stream)
    assert a.counters == b.counters and a.e == b.e
    assert a.e <= a.n // (48 + 1) + 1

    # weighted put: same as repeating the element
    p = MisraGriesSketch(k=8)
    p.put("x", weight=5)
    p.put("y", weight=2)
    assert p.estimate_count("x") == 5 and p.n == 7
    with pytest.raises(ValueError):
        p.put("z", weight=-1)
    with pytest.raises(ValueError):
        MisraGriesSketch(k=8).update(pa.array(["a"]), weights=np.array([-2]))

    # null items drop with their weights, like the unweighted path
    nn = MisraGriesSketch(k=8)
    nn.update(pa.array(["a", None, "b"]), weights=np.array([3, 9, 1]))
    assert nn.n == 4 and nn.estimate_count("a") == 3


def test_mg_weighted_distributed_build_matches_exact_heavy_hitters(spark):
    """collect_weighted_sketch over pre-aggregated (word, count) pairs (the
    JVM-side combine shape) keeps the no-FN guarantee vs exact counts and
    each survivor's stored count is within the blob's own error bound."""
    from guava_probably_spark.operators.build import collect_weighted_sketch

    stream = _zipf_stream(30_000, 300, seed=29)
    df = spark.createDataFrame([(s,) for s in stream], "w string")
    pairs = df.groupBy("w").agg(F.count("*").alias("c"))
    sk, _, _ = collect_weighted_sketch(pairs, "w", "c", SketchSpec("mg", {"k": 64}))
    from collections import Counter

    exact = Counter(stream)
    assert sk.n == len(stream)
    assert sk.e <= len(stream) // 65
    for item, f in exact.items():
        if f > sk.e:  # guaranteed survivor
            c = sk.estimate_count(item)
            assert 0 < c <= f and f <= c + sk.e, item


def test_mg_share_drift_brackets_contain_truth():
    """Drift brackets from two MG blobs certainly contain the true share
    change for every retained item; a planted 10-point share shift shows
    lo > 0 (certified real), while identical streams certify ~0 hi for
    the heavy items."""
    import numpy as np

    from guava_probably_spark.functions import mg_share_drift
    from guava_probably_spark.sketches import MisraGriesSketch
    from guava_probably_spark.sketches.base import FUNNEL_UTF8

    rng = np.random.default_rng(4)
    # stream A: item 'hot' at 30%; stream B: 'hot' at 20% (10-point drop)
    def stream(hot_share, n=30000, seed=1):
        r = np.random.default_rng(seed)
        tail = [f"t{int(i)}" for i in r.integers(0, 500, n)]
        n_hot = int(hot_share * n)
        return ["hot"] * n_hot + tail[: n - n_hot]

    sa = stream(0.30, seed=2)
    sb = stream(0.20, seed=3)
    a = MisraGriesSketch(k=256, funnel=FUNNEL_UTF8)
    b = MisraGriesSketch(k=256, funnel=FUNNEL_UTF8)
    a.update(sa)
    b.update(sb)
    drift = dict((i, (lo, hi)) for i, lo, hi in mg_share_drift(a, b))
    lo, hi = drift["hot"]
    true = abs(sa.count("hot") / len(sa) - sb.count("hot") / len(sb))
    assert lo <= true <= hi  # bracket contains the truth
    assert lo > 0.05  # the shift is certified real, not summary noise
    # top of the sorted list is the planted item
    assert mg_share_drift(a, b)[0][0] == "hot"
    # identical streams: every bracket's lo == 0 (no false certification)
    c = MisraGriesSketch(k=256, funnel=FUNNEL_UTF8)
    c.update(sa)
    for item, lo2, hi2 in mg_share_drift(a, c):
        assert lo2 == 0.0
