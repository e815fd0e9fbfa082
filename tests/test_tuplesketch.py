"""Tuple sketch (theta + per-distinct-key integer summaries; Theta Sketch
Framework tuple extension, HT estimator per Cohen & Kaplan 2007).

Shared contract tests (round-trip, merge byte-algebra, compatibility
gates, corrupt-blob fuzz) run in test_contracts.py's parametrized suite;
this file covers the summary-sum exactness argument, the estimators, and
the Spark-side weighted build."""

import collections

import numpy as np
import pytest

from guava_probably_spark.sketches import Sketch, SketchSpec, TupleSketch
from guava_probably_spark.sketches.base import FUNNEL_LONG, FUNNEL_UTF8


def _stream(n=300_000, nd=50_000, seed=3):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, nd, n, dtype=np.int64)
    vals = rng.integers(1, 100, n, dtype=np.int64)
    exact = collections.Counter()
    for k, v in zip(keys.tolist(), vals.tolist()):
        exact[k] += v
    return keys, vals, exact


def test_estimates_within_bounds():
    keys, vals, exact = _stream()
    nd, total = len(exact), sum(exact.values())
    sk = TupleSketch(k=1024, funnel=FUNNEL_LONG)
    sk.update(keys, weights=vals)
    assert abs(sk.estimate() - nd) <= sk.relative_error_bound() * nd
    assert abs(sk.sum_estimate() - total) <= sk.sum_error_estimate()
    assert abs(sk.mean_estimate() - total / nd) <= total / nd * 0.25


def test_exact_below_saturation():
    """θ = 1: every distinct key retained with its FULL sum — both
    estimators are exact, and the error estimate reports zero."""
    keys, vals, _ = _stream(n=800, nd=500)
    exact = collections.Counter()
    for k, v in zip(keys.tolist(), vals.tolist()):
        exact[k] += v
    sk = TupleSketch(k=1024, funnel=FUNNEL_LONG)
    sk.update(keys, weights=vals)
    assert sk.estimate() == float(len(exact))
    assert sk.sum_estimate() == float(sum(exact.values()))
    assert sk.sum_error_estimate() == 0.0


def test_merged_build_byte_equal_to_whole_and_sums_exact():
    """The eviction-soundness argument: finally-retained keys carry their
    exact full sums regardless of how the stream was split, so blobs are
    byte-equal to the single-stream build (verified per retained entry
    against the exact per-key totals)."""
    keys, vals, exact = _stream()
    whole = TupleSketch(k=512, funnel=FUNNEL_LONG)
    whole.update(keys, weights=vals)
    idx_parts = np.array_split(np.arange(len(keys)), 7)
    acc = None
    for idx in idx_parts:
        part = TupleSketch(k=512, funnel=FUNNEL_LONG)
        part.update(keys[idx], weights=vals[idx])
        acc = part if acc is None else acc.merge(part)
    assert acc.to_bytes() == whole.to_bytes()
    # retained sums ARE the exact per-key totals: recompute each retained
    # hash's total from the raw stream via the same funnel hash
    from guava_probably_spark.sketches.base import hash_column

    _, h1, _ = hash_column(keys, FUNNEL_LONG)
    by_hash = collections.Counter()
    for h, v in zip(h1.tolist(), vals.tolist()):
        by_hash[h] += v
    for h, v in zip(whole.hashes.tolist(), whole.values.tolist()):
        assert by_hash[h] == v


def test_weights_default_to_row_counts():
    """weights=None: per-key sums are multiplicities, so sum_estimate
    estimates total row count (exact below saturation)."""
    keys = np.repeat(np.arange(100, dtype=np.int64), 7)
    sk = TupleSketch(k=256, funnel=FUNNEL_LONG)
    sk.update(keys)
    assert sk.estimate() == 100.0
    assert sk.sum_estimate() == 700.0
    assert set(sk.values.tolist()) == {7}


def test_fold_to_byte_identical_and_misaligned_weights_raise():
    keys, vals, _ = _stream(seed=9)
    sk = TupleSketch(k=1024, funnel=FUNNEL_LONG)
    sk.update(keys, weights=vals)
    direct = TupleSketch(k=128, funnel=FUNNEL_LONG)
    direct.update(keys, weights=vals)
    assert sk.fold_to(128).to_bytes() == direct.to_bytes()
    with pytest.raises(ValueError):
        sk.fold_to(8)
    with pytest.raises(ValueError):
        sk.update(keys[:10], weights=vals[:9])


def test_negative_weights_supported():
    """Signed summaries: a retention-style +1/-1 stream nets out exactly
    (integer sums — no float drift)."""
    keys = np.array([1, 2, 3, 1, 2, 3, 1], dtype=np.int64)
    w = np.array([5, 5, 5, -5, -2, -5, 3], dtype=np.int64)
    sk = TupleSketch(k=64, funnel=FUNNEL_LONG)
    sk.update(keys, weights=w)
    assert sk.sum_estimate() == 6.0  # (5-5+3) + (5-2) + (5-5)


def test_string_funnel_roundtrip():
    sk = TupleSketch(k=64, funnel=FUNNEL_UTF8)
    sk.update([f"conv-{i % 30}" for i in range(900)])
    blob = sk.to_bytes()
    sk2 = Sketch.from_bytes(blob)
    assert isinstance(sk2, TupleSketch)
    assert sk2.to_bytes() == blob
    assert sk2.estimate() == 30.0 and sk2.sum_estimate() == 900.0


def test_collect_weighted_sketch_byte_identical_to_local(spark):
    """collect_weighted_sketch over any partitioning == the local one-shot
    build, and the distinct-key token-total question it answers is exact
    below saturation: total value over DISTINCT keys, not rows."""
    from guava_probably_spark.operators import collect_weighted_sketch

    df = spark.range(30_000).selectExpr(
        "concat('conv-', id % 2000) AS conv_id", "CAST(id % 17 + 1 AS LONG) AS w"
    )
    rows = df.collect()
    local = TupleSketch(k=4096, funnel=FUNNEL_UTF8)
    local.update(
        [r.conv_id for r in rows], weights=np.array([r.w for r in rows], np.int64)
    )
    exact = collections.Counter()
    for r in rows:
        exact[r.conv_id] += r.w
    for parts in (4, 13):
        sk, n, _ = collect_weighted_sketch(
            df.repartition(parts), "conv_id", "w", SketchSpec("tuple", {"k": 4096})
        )
        assert n == 30_000
        assert sk.to_bytes() == local.to_bytes()
    assert sk.estimate() == float(len(exact))
    assert sk.sum_estimate() == float(sum(exact.values()))


def test_collect_weighted_sketch_null_keys_and_weights_filtered(spark):
    from guava_probably_spark.operators import collect_weighted_sketch

    df = spark.range(1000).selectExpr(
        "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('k-', id % 50) END AS k",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE CAST(1 AS LONG) END AS w",
    )
    sk, n, _ = collect_weighted_sketch(df, "k", "w", SketchSpec("tuple", {"k": 256}))
    expected = df.filter("k IS NOT NULL AND w IS NOT NULL").count()
    assert n == expected
    assert sk.sum_estimate() == float(expected)


def test_sql_tuple_sum_and_grouped_build(spark):
    """SQL surface (tuple_sum / tuple_sum_se) over per-key tuple blobs from
    the generic salted builder: below saturation each group's HT total IS
    its exact row count, straight out of SQL."""
    from guava_probably_spark.functions import register_sql
    from guava_probably_spark.operators import build_grouped

    register_sql(spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    g = build_grouped(ev, "event_type", "user_id", SketchSpec("tuple", {"k": 1024}), salt=4)
    g.createOrReplaceTempView("tuple_groups_v")
    rows = spark.sql(
        "SELECT event_type, tuple_sum(sketch) AS total, tuple_sum_se(sketch) AS se "
        "FROM tuple_groups_v"
    ).collect()
    exact = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert len(rows) == len(exact)
    for r in rows:
        assert r.total == float(exact[r.event_type])
        assert r.se == 0.0  # below saturation: exact, zero reported error


def test_build_grouped_weighted_tuple_exact_per_group(spark):
    """build_grouped(weight_col=...): per-key tuple blobs whose HT totals
    are each group's exact value sum below saturation, byte-identical to
    local per-group builds."""
    from guava_probably_spark.operators import build_grouped

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    g = build_grouped(
        ev, "event_type", "user_id",
        SketchSpec("tuple", {"k": 1024}), salt=4, weight_col="event_id",
    )
    blobs = {r.event_type: bytes(r.sketch) for r in g.collect()}
    rows = ev.select("event_type", "user_id", "event_id").collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.user_id, r.event_id))
    assert set(blobs) == set(by_type)
    for et, pairs in by_type.items():
        local = TupleSketch(k=1024, funnel=FUNNEL_LONG)
        local.update(
            np.array([p[0] for p in pairs], np.int64),
            weights=np.array([p[1] for p in pairs], np.int64),
        )
        assert blobs[et] == local.to_bytes()
        got = Sketch.from_bytes(blobs[et])
        assert got.sum_estimate() == float(sum(p[1] for p in pairs))
