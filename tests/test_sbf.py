"""Scalable Bloom filter (Almeida et al. 2007) — growth, bounds, merge
algebra, and the distributed one-pass build path.

The generic ProbabilisticFilter contract rows (round-trip, copy/equals,
compatibility gating, merge associativity/commutativity, empty/clear,
corrupt-blob fuzz) run in test_contracts.py's parametrized suite; this file
covers what is SPECIFIC to the scalable variant.
"""

import numpy as np
import pytest

from guava_probably_spark.sketches import (
    IncompatibleSketchError,
    ScalableBloomSketch,
    Sketch,
    SketchSpec,
)
from guava_probably_spark.sketches.base import FUNNEL_LONG, FUNNEL_UTF8


def _sbf(**kw):
    kw.setdefault("initial_capacity", 1024)
    kw.setdefault("fpp", 0.01)
    kw.setdefault("funnel", FUNNEL_LONG)
    return ScalableBloomSketch(**kw)


def test_single_writer_compound_bound_holds_past_200x_initial():
    """The whole point: 200× the initial capacity arrives, zero FN, and the
    observed FPP still respects the configured compound bound."""
    rng = np.random.default_rng(7)
    data = rng.integers(0, 10**15, 200_000, dtype=np.int64)
    sk = _sbf()
    sk.update(data)
    assert len(sk.stages) >= 4  # it actually grew
    uniq = np.unique(data)
    assert sk.might_contain_batch(uniq).all()  # zero FN
    probe = rng.integers(10**16, 10**17, 400_000, dtype=np.int64)
    fpr = sk.might_contain_batch(probe).mean()
    assert fpr <= sk.fpp() * 1.5  # design compound bound (+sampling margin)
    assert sk.expected_fpp() <= sk.fpp() * 1.2  # occupancy-honest estimate
    # occupancy size estimate within 2% of the truth
    assert abs(sk.size - len(uniq)) <= 0.02 * len(uniq)


def test_one_giant_batch_respects_stage_capacities():
    """A single update() far larger than any stage must chunk across the
    growth schedule, never blowing one stage past its design capacity."""
    sk = _sbf(initial_capacity=256)
    sk.update(np.arange(100_000, dtype=np.int64))
    for st in sk.stages:
        # n_est counts routed inserts; the chunked router stops at capacity
        assert st.n_est <= st.capacity
    assert sk.might_contain_batch(np.arange(100_000, dtype=np.int64)).all()


def test_duplicates_do_not_inflate_newer_stages():
    """Almeida's insert rule: an element already present anywhere is not
    re-inserted, so replaying the same data adds (almost) nothing."""
    data = np.arange(50_000, dtype=np.int64)
    sk = _sbf()
    sk.update(data)
    stages_before = len(sk.stages)
    size_before = sk.size
    fresh = sk.update(data)  # full replay
    assert not fresh.any()  # every element reported already-present
    assert len(sk.stages) == stages_before
    assert sk.size == size_before  # no bits changed → same estimate


def test_merge_is_stage_set_union_and_idempotent():
    a, b = _sbf(), _sbf()
    a.update(np.arange(0, 30_000, dtype=np.int64))
    b.update(np.arange(30_000, 60_000, dtype=np.int64))
    merged = Sketch.from_bytes(a.to_bytes()).merge(b)
    assert merged.might_contain_batch(np.arange(60_000, dtype=np.int64)).all()
    # union bound: compound estimate ≤ sum of the two sides' estimates
    assert merged.expected_fpp() <= a.expected_fpp() + b.expected_fpp() + 1e-12
    # idempotent at the byte level (exact-duplicate stages collapse)
    again = Sketch.from_bytes(merged.to_bytes()).merge(merged)
    assert again.to_bytes() == merged.to_bytes()
    # merge must not mutate the right-hand side
    assert b.might_contain_batch(np.arange(30_000, 60_000, dtype=np.int64)).all()


def test_post_merge_inserts_keep_growing_correctly():
    a, b = _sbf(), _sbf()
    a.update(np.arange(0, 5_000, dtype=np.int64))
    b.update(np.arange(5_000, 10_000, dtype=np.int64))
    a.merge(b)
    a.update(np.arange(10_000, 80_000, dtype=np.int64))
    assert a.might_contain_batch(np.arange(80_000, dtype=np.int64)).all()
    rng = np.random.default_rng(3)
    probe = rng.integers(10**16, 10**17, 200_000, dtype=np.int64)
    # post-merge writer: ≤ 2 writers' worth of compound bound here
    assert a.might_contain_batch(probe).mean() <= 2 * a.fpp() * 1.5


def test_compact_collapses_underfilled_partials():
    """Many low-volume partials (the distributed-fold shape) compact back
    to few stages with membership preserved and expected_fpp not worse."""
    parts = [np.arange(i * 300, (i + 1) * 300, dtype=np.int64) for i in range(16)]

    def build(chunk):
        s = _sbf()
        s.update(chunk)
        return s

    folded = build(parts[0])
    for c in parts[1:]:
        folded.merge(build(c))
    n_before = len(folded.stages)
    folded.compact()
    assert len(folded.stages) < n_before
    assert folded.might_contain_batch(np.arange(16 * 300, dtype=np.int64)).all()
    # compacted stages still respect their per-stage design capacity and
    # therefore their per-stage design fpp; the compound estimate stays
    # within the union of the surviving stages' design bounds
    design_union = 1.0
    for st in folded.stages:
        assert st.size_estimate() <= st.capacity * 1.05
        design_union *= 1.0 - st.fpp
    assert folded.expected_fpp() <= (1.0 - design_union) + 1e-12


def test_funnel_and_params_gate_compatibility():
    a = _sbf()
    with pytest.raises(IncompatibleSketchError):
        a.update(["a-string"])  # FUNNEL_LONG filter fed strings
    b = ScalableBloomSketch(1024, 0.01, funnel=FUNNEL_UTF8)
    assert not a.is_compatible(b)
    c = _sbf(growth=8)
    with pytest.raises(IncompatibleSketchError):
        a.merge(c)


def test_remove_unsupported_and_validation():
    with pytest.raises(NotImplementedError):
        _sbf().remove(1)
    for bad in (
        dict(initial_capacity=0),
        dict(fpp=0.0),
        dict(fpp=1.0),
        dict(growth=1),
        dict(tightening=0.0),
        dict(tightening=1.0),
    ):
        with pytest.raises(ValueError):
            _sbf(**bad)


def test_distributed_one_pass_build_matches_local(spark):
    """collect_sketch over a SketchSpec('sbf', ...) — the one-pass
    unknown-capacity distributed build: zero FN over the exact distinct
    set, compound FPP within partials × design (union bound)."""
    from pyspark.sql import functions as F

    from guava_probably_spark.operators import collect_sketch

    n = 120_000
    df = (
        spark.range(n)
        .repartition(8)
        .select(F.concat(F.lit("ng-"), F.col("id")).alias("g"))
    )
    spec = SketchSpec(
        "sbf", {"initial_capacity": 2048, "fpp": 0.001, "funnel": FUNNEL_UTF8}
    )
    sk, rows, overflow = collect_sketch(df, "g", spec)
    assert rows == n and overflow == 0
    members = [f"ng-{i}" for i in range(0, n, 7)]
    assert sk.might_contain_batch(members).all()  # zero FN
    absent = [f"absent-{i}" for i in range(100_000)]
    fpr = sk.might_contain_batch(absent).mean()
    assert fpr <= 8 * 0.001 * 1.5  # ≤ partials × design (+margin)
    # serialized blob round-trips through the probe-side decode
    sk2 = Sketch.from_bytes(sk.to_bytes())
    assert sk2.might_contain_batch(members).all()
