"""Sliding-window HLL (sketches/shll.py, Chabchoub–Hébrail 2010) —
frontier canonicality, window estimates vs exact, byte-equal merges,
exact folds, the plain-HLL equivalence law, and the distributed build.
"""

import numpy as np
import pyarrow as pa
import pytest

from guava_probably_spark.sketches import SketchSpec
from guava_probably_spark.sketches.base import FUNNEL_LONG, IncompatibleSketchError, Sketch
from guava_probably_spark.sketches.hll import HllSketch
from guava_probably_spark.sketches.shll import SlidingHllSketch, _prune


def _data(seed=0, n=100000, card=30000, tmax=10**6):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, card, size=n)
    ts = rng.integers(0, tmax, size=n)
    return keys, ts


def _build(keys, ts, p=12):
    sk = SlidingHllSketch(p=p, funnel=FUNNEL_LONG)
    sk.update(pa.array(keys), weights=ts)
    return sk


def test_prune_is_pareto_frontier():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 4, size=300)
    ts = rng.integers(0, 50, size=300)
    rho = rng.integers(1, 20, size=300).astype(np.uint8)
    pi, pt, pr = _prune(idx, ts, rho)
    triples = set(zip(pi.tolist(), pt.tolist(), pr.tolist()))
    # brute force the frontier
    expect = set()
    for i in range(4):
        pairs = {(t, r) for j, t, r in zip(idx, ts, rho) if j == i}
        for t, r in pairs:
            dominated = any(
                (t2 >= t and r2 >= r and (t2, r2) != (t, r)) for t2, r2 in pairs
            )
            if not dominated:
                expect.add((i, t, r))
    assert triples == expect


def test_prune_order_invariant():
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 8, size=500)
    ts = rng.integers(0, 100, size=500)
    rho = rng.integers(1, 30, size=500).astype(np.uint8)
    a = _prune(idx, ts, rho)
    perm = rng.permutation(500)
    b = _prune(idx[perm], ts[perm], rho[perm])
    for x, y in zip(a, b):
        assert (x == y).all()


def test_full_window_equals_plain_hll():
    keys, ts = _data()
    sk = _build(keys, ts)
    h = HllSketch(12, FUNNEL_LONG)
    h.update(pa.array(keys))
    assert (sk.registers_at(None) == h.registers).all()
    assert sk.to_hll().to_bytes() == h.to_bytes()
    assert sk.estimate() == h.estimate()


def test_window_estimates_within_bound():
    keys, ts = _data(seed=3)
    sk = _build(keys, ts)
    bound = 3 * 1.04 / (2**12) ** 0.5
    for w in (50_000, 200_000, 700_000, 999_999):
        exact = len(np.unique(keys[ts >= sk.max_ts - w]))
        est = sk.estimate_window(w)
        assert abs(est - exact) <= max(bound * exact, 3.0)


def test_window_at_explicit_query_time():
    keys, ts = _data(seed=4)
    sk = _build(keys, ts)
    t_q = 400_000
    exact = len(np.unique(keys[(ts >= t_q - 100_000)]))
    est = sk.estimate_window(100_000, at_ts=t_q)
    # pairs newer than t_q are included by ts >= cutoff — the sketch
    # answers "since cutoff", so compare against that exact set
    exact = len(np.unique(keys[ts >= t_q - 100_000]))
    assert abs(est - exact) <= max(3 * 1.04 / 64 * exact, 3.0)


def test_merge_byte_associative_and_equals_direct():
    keys, ts = _data(seed=5)
    whole = _build(keys, ts)
    parts = []
    for i in range(4):
        sel = slice(i * 25000, (i + 1) * 25000)
        parts.append(_build(keys[sel], ts[sel]))
    blobs = [p.to_bytes() for p in parts]
    left = Sketch.from_bytes(blobs[0])
    for b in blobs[1:]:
        left.merge(Sketch.from_bytes(b))
    right = Sketch.from_bytes(blobs[3])
    for b in blobs[2::-1]:
        right.merge(Sketch.from_bytes(b))
    assert left.to_bytes() == right.to_bytes() == whole.to_bytes()


def test_fold_byte_exact():
    keys, ts = _data(seed=6, n=50000)
    sk = _build(keys, ts, p=14)
    for p in (12, 8):
        direct = _build(keys, ts, p=p)
        assert sk.fold_to(p).to_bytes() == direct.to_bytes()
    with pytest.raises(ValueError):
        sk.fold_to(15)


def test_frontier_stays_logarithmic():
    keys, ts = _data(seed=7, n=500000, card=500000)
    sk = _build(keys, ts, p=10)
    per_reg = sk.size / sk.m
    # ~500 distinct per register → expected frontier ≈ ln(500) ≈ 6.2;
    # assert a generous ceiling that a linear blowup would smash
    assert per_reg < 15


def test_roundtrip_and_guards():
    keys, ts = _data(seed=8, n=1000)
    sk = _build(keys, ts)
    rt = Sketch.from_bytes(sk.to_bytes())
    assert isinstance(rt, SlidingHllSketch)
    assert rt.to_bytes() == sk.to_bytes()
    assert rt.max_ts == sk.max_ts
    with pytest.raises(IncompatibleSketchError):
        sk.merge(SlidingHllSketch(p=10, funnel=FUNNEL_LONG))
    with pytest.raises(ValueError):
        sk.update(pa.array([1, 2, 3]))  # missing timestamps
    empty = SlidingHllSketch(p=12, funnel=FUNNEL_LONG)
    assert empty.is_empty() and empty.estimate() == 0.0
    assert empty.estimate_window(100) == 0.0
    sk.clear()
    assert sk.is_empty() and sk.max_ts is None


def test_timestamp_ties_canonical():
    # equal (ts, rho) duplicates collapse; equal ts keeps only max rho
    sk = SlidingHllSketch(p=4, funnel=FUNNEL_LONG)
    keys = np.array([7, 7, 7, 9, 9], dtype=np.int64)
    ts = np.array([5, 5, 5, 5, 5], dtype=np.int64)
    sk.update(pa.array(keys), weights=ts)
    # one surviving pair per touched register
    regs = np.unique(sk.idx)
    assert len(sk.idx) == len(regs)


def test_distributed_weighted_build(spark):
    from guava_probably_spark.operators import collect_weighted_sketch

    keys, ts = _data(seed=9, n=20000, card=5000)
    pdf_rows = [(int(k), int(t)) for k, t in zip(keys, ts)]
    df = spark.createDataFrame(pdf_rows, ["user_id", "ts_epoch"]).repartition(8)
    sk, n, _ = collect_weighted_sketch(
        df, "user_id", "ts_epoch", SketchSpec("shll", {"p": 12})
    )
    assert n == 20000
    local = SlidingHllSketch(p=12, funnel=sk.funnel)
    import pyarrow as pa2

    local.update(pa2.array(keys), weights=ts)
    assert sk.to_bytes() == local.to_bytes()
    w = 300_000
    exact = len(np.unique(keys[ts >= local.max_ts - w]))
    assert abs(sk.estimate_window(w) - exact) <= max(3 * 1.04 / 64 * exact, 3.0)


def test_shll_sql_window_udf(spark):
    from guava_probably_spark.functions import register_sql
    from pyspark.sql import Row

    register_sql(spark)
    keys, ts = _data(seed=10, n=5000, card=2000)
    sk = _build(keys, ts)
    spark.createDataFrame([Row(sketch=sk.to_bytes())]).createOrReplaceTempView(
        "shll_v"
    )
    w = 400_000
    got = spark.sql(f"SELECT shll_window(sketch, {w}) AS e FROM shll_v").collect()[0].e
    assert got == sk.estimate_window(w)
    full = spark.sql("SELECT shll_window(sketch, NULL) AS e FROM shll_v").collect()[0].e
    assert full == sk.estimate()


def test_grouped_weighted_shll_build(spark):
    # per-key sliding windows through the generic weighted grouped build:
    # each group's blob must be byte-identical to a local per-group build
    # (the grouped-builds contract), and window estimates within bound
    from pyspark.sql import functions as F

    from guava_probably_spark.operators import build_grouped

    keys, ts = _data(seed=11, n=12000, card=3000)
    grp = (keys % 4).astype(int)
    df = spark.createDataFrame(
        [(int(g), int(k), int(t)) for g, k, t in zip(grp, keys, ts)],
        ["g", "user_id", "ts_epoch"],
    ).repartition(8)
    out = build_grouped(
        df, "g", "user_id", SketchSpec("shll", {"p": 12}), weight_col="ts_epoch"
    )
    rows = {r.g: bytes(r.sketch) for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}
    bound = 3 * 1.04 / (2**12) ** 0.5
    for g in range(4):
        sel = grp == g
        local = _build(keys[sel], ts[sel])
        assert rows[g] == local.to_bytes()
        sk = Sketch.from_bytes(rows[g])
        w = 300_000
        exact = len(np.unique(keys[sel][ts[sel] >= local.max_ts - w]))
        assert abs(sk.estimate_window(w) - exact) <= max(bound * exact, 3.0)


def test_grouped_shll_windowed_actives_per_key(spark):
    """Per-key any-window distinct counts through the generic salted
    weighted builder (timestamps in the weight slot) — zero new plumbing:
    each group's trailing-half-range estimate within the HLL band of its
    exact windowed distinct."""
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import build_grouped
    from guava_probably_spark.sketches import SketchSpec, Sketch

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").withColumn(
        "ts_epoch", F.col("ts").cast("timestamp").cast("long")
    )
    g = build_grouped(
        ev, "event_type", "user_id", SketchSpec("shll", {"p": 12}), weight_col="ts_epoch"
    )
    rows = {r.event_type: Sketch.from_bytes(bytes(r.sketch)) for r in g.collect()}
    assert len(rows) == ev.select("event_type").distinct().count()
    lo, hi = ev.agg(F.min("ts_epoch"), F.max("ts_epoch")).collect()[0]
    half = (hi - lo) // 2
    for et, sk in rows.items():
        exact = (
            ev.filter((F.col("event_type") == et) & (F.col("ts_epoch") >= hi - half))
            .select("user_id")
            .distinct()
            .count()
        )
        est = sk.estimate_window(half)
        assert abs(est - exact) <= max(3 * 1.04 / 2**6 * exact, 5)
