"""Quotient filter (sketches/qf.py, Bender et al. PVLDB 2012).

The canonical-table claims are brute-forced here: the packed payload must
decode back to the identical sorted fingerprint multiset, the metadata-bit
layout must satisfy the classic QF invariants, and merges must be
byte-associative / commutative / (set semantics) idempotent.
"""

import numpy as np
import pytest

from guava_probably_spark.sketches import (
    QuotientFilterSketch,
    Sketch,
    SketchSpec,
    qf_geometry,
)
from guava_probably_spark.sketches.base import FUNNEL_LONG, FUNNEL_UTF8
from guava_probably_spark.sketches.qf import _pack_bits, _unpack_bits


def _mk(capacity=5000, fpp=0.01, funnel=FUNNEL_LONG, **kw):
    return QuotientFilterSketch(capacity, fpp, funnel=funnel, **kw)


def _data(n=4000, seed=7, lo=0, hi=10**12):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, n, dtype=np.int64)


def test_geometry_meets_fpp_target():
    for cap, fpp in [(100, 0.05), (10_000, 0.01), (1_000_000, 0.001)]:
        q, r = qf_geometry(cap, fpp)
        alpha = cap / (1 << q)
        assert alpha <= 0.95
        assert alpha * 2.0**-r <= fpp * (1 + 1e-12)


def test_pack_unpack_bits_roundtrip():
    rng = np.random.default_rng(3)
    for width in (2, 5, 8, 13, 31, 60):
        vals = rng.integers(0, 1 << width, 997, dtype=np.uint64)
        words = _pack_bits(vals, width)
        assert len(words) == (997 * width + 63) // 64
        back = _unpack_bits(words, 997, width)
        assert (back == vals).all()


def test_zero_false_negatives_and_fpp_bound():
    sk = _mk(capacity=8000)
    vals = _data(8000, seed=1)
    sk.update(vals)
    assert sk.might_contain_batch(vals).all()  # zero FN
    probe = _data(20000, seed=2, lo=2 * 10**12, hi=4 * 10**12)
    fp_rate = sk.might_contain_batch(probe).mean()
    sigma = (0.01 * 0.99 / 20000) ** 0.5
    assert fp_rate <= 0.01 + 4 * sigma
    assert sk.expected_fpp() <= 0.01 * 1.05


def test_payload_roundtrip_byte_identical_and_canonical():
    sk = _mk()
    sk.update(_data())
    blob = sk.to_bytes()
    sk2 = Sketch.from_bytes(blob)
    assert isinstance(sk2, QuotientFilterSketch)
    assert (sk2.fps == sk.fps).all()
    assert sk2.to_bytes() == blob


def test_table_layout_invariants_brute_force():
    """Metadata bits on a SMALL table checked against a slot-by-slot
    simulation of the textbook QF invariants."""
    sk = QuotientFilterSketch(capacity=24, fpp=0.05, funnel=FUNNEL_LONG)
    sk.update(_data(24, seed=9))
    starts, counts, uq, slot_idx, total_slots = sk._table_layout()
    # runs are disjoint, in-order, and start at or after their home slot
    assert (starts >= uq).all()
    ends = starts + counts
    assert (starts[1:] >= ends[:-1]).all()
    # every element's slot >= its quotient (shifting only moves right)
    quot = (sk.fps >> np.uint64(sk.rbits)).astype(np.int64)
    assert (slot_idx >= quot).all()
    # a cluster's first run is unshifted: starts == home whenever the
    # previous run ends at or before home
    prev_end = np.concatenate(([0], ends[:-1]))
    at_home = prev_end <= uq
    assert (starts[at_home] == uq[at_home]).all()


def test_multiset_semantics_and_remove():
    sk = _mk(capacity=1000, dedup_build=False)
    sk.update(np.array([5, 5, 5, 9], dtype=np.int64))
    assert sk.size == 4
    assert sk.remove(5) and sk.remove(5)
    assert sk.might_contain(5)  # one copy left
    assert sk.remove(5)
    assert not sk.might_contain(5)
    assert not sk.remove(5)  # already gone
    assert sk.might_contain(9)
    assert sk.size == 1


def test_remove_batch_partial_counts():
    sk = _mk(capacity=1000, dedup_build=False)
    sk.update(np.array([1, 1, 2], dtype=np.int64))
    removed = sk.remove_all(np.array([1, 1, 1, 2, 3], dtype=np.int64))
    assert removed == 3  # two 1s + one 2; third 1 and the 3 miss
    assert sk.is_empty()


def test_dedup_build_collapses_duplicates():
    sk = _mk(capacity=1000)
    first = sk.update(np.array([7, 7, 7], dtype=np.int64))
    assert sk.size == 1
    assert first.all()  # pre-insert, none existed
    again = sk.update(np.array([7], dtype=np.int64))
    assert not again.any()


def test_merge_byte_associative_commutative_idempotent():
    data = _data(6000, seed=21)
    parts = np.array_split(data, 3)

    def build(chunk):
        sk = _mk(capacity=6000)
        sk.update(chunk)
        return sk

    left = build(parts[0]).merge(build(parts[1])).merge(build(parts[2]))
    right = build(parts[0]).merge(build(parts[1]).merge(build(parts[2])))
    whole = build(data)
    assert left.to_bytes() == right.to_bytes() == whole.to_bytes()
    # idempotent under set semantics
    again = build(data).merge(build(data))
    assert again.to_bytes() == whole.to_bytes()


def test_incompatible_merge_raises():
    a, b = _mk(capacity=5000), _mk(capacity=5001)
    c = _mk(capacity=5000, dedup_build=False)
    d = _mk(capacity=5000, funnel=FUNNEL_UTF8)
    for other in (b, c, d):
        assert not a.is_compatible(other)
        with pytest.raises(ValueError):
            a.merge(other)


def test_overfill_grows_tail_and_reports_honest_fpp():
    sk = _mk(capacity=64, fpp=0.02)
    sk.update(_data(5000, seed=33))
    assert sk.might_contain_batch(_data(5000, seed=33)).all()
    assert sk.load_factor() > 1.0
    assert sk.expected_fpp() > 0.02  # degradation visible, never hidden
    blob = sk.to_bytes()
    assert Sketch.from_bytes(blob).to_bytes() == blob


def test_string_funnel_and_scalar_surface():
    sk = QuotientFilterSketch(1000, 0.01, funnel=FUNNEL_UTF8)
    assert sk.put("hello") and sk.might_contain("hello")
    assert not sk.put("hello")  # already present (set semantics)
    sk.put_all(["a", "b", "c"])
    assert sk.contains_all(["a", "b", "c", "hello"])
    sk.clear()
    assert sk.is_empty()


def test_distributed_build_matches_local(spark):
    from guava_probably_spark.operators import collect_sketch

    import pyspark.sql.functions as F

    df = spark.range(0, 20000).select(
        (F.col("id") * 2654435761 % 1000003).alias("v")
    )
    spec = SketchSpec("qf", {"capacity": 40000, "fpp": 0.01, "funnel": FUNNEL_LONG})
    sk, n, ovf = collect_sketch(df, "v", spec)
    assert n == 20000 and ovf == 0
    local = spec.create()
    local.update(np.array([r.v for r in df.collect()], dtype=np.int64))
    assert sk.to_bytes() == local.to_bytes()


def test_sparse_transport_mode_roundtrip_and_merge_class():
    """Partial-load blobs serialize the sorted fingerprint array (O(n)),
    serving-load blobs the packed table (O(2^q)); both round-trip
    byte-identical and mixing modes through merges stays byte-equal to
    the whole build."""
    cap = 50000
    data = _data(30000, seed=41)  # 30000*4 >= 2^16 slots -> table mode whole
    parts = np.array_split(data, 6)  # 5000*4 < 2^16 -> sparse partials

    def build(chunk):
        sk = _mk(capacity=cap)
        sk.update(chunk)
        return sk

    def payload_mode(sk):
        import struct

        blob = sk.to_bytes()
        (plen,) = struct.unpack_from("<I", blob, 8)
        _, slots = struct.unpack_from("<qq", blob, 12 + plen)
        return "sparse" if slots == -1 else "table"

    partials = [build(p) for p in parts]
    assert all(payload_mode(p) == "sparse" for p in partials)
    for p in partials:  # sparse blobs round-trip byte-identical
        assert Sketch.from_bytes(p.to_bytes()).to_bytes() == p.to_bytes()
    acc = partials[0]
    for p in partials[1:]:
        acc = acc.merge(Sketch.from_bytes(p.to_bytes()))
    whole = build(data)
    assert acc.to_bytes() == whole.to_bytes()


def test_grouped_qf_blobs_match_local(spark):
    """Per-key qf blobs through the generic salted grouped build are
    byte-identical to local per-group builds (the canonical-state class)."""
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import build_grouped
    from guava_probably_spark.sketches import Sketch

    df = spark.range(0, 20000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") * 37 % 5001).alias("v")
    )
    spec = SketchSpec("qf", {"capacity": 8000, "fpp": 0.01, "funnel": FUNNEL_LONG})
    g = build_grouped(df, "g", "v", spec, salt=4)
    blobs = {r.g: bytes(r.sketch) for r in g.collect()}
    assert len(blobs) == 7
    for grp, blob in blobs.items():
        local = spec.create()
        vals = np.array(
            [r.v for r in df.filter(F.col("g") == grp).collect()], dtype=np.int64
        )
        local.update(vals)
        assert blob == local.to_bytes()
        assert Sketch.from_bytes(blob).might_contain_batch(vals).all()


def test_fold_to_exact_and_commutes_with_merge():
    """fp >> delta: folded fps equal a direct (q, r') build's fps, the
    fold commutes with merge byte-for-byte, and FN stays zero at the
    coarser precision."""
    data = _data(8000, seed=51)
    a_data, b_data = data[:4000], data[4000:]

    def build(chunk):
        sk = _mk(capacity=8000, fpp=0.001)
        sk.update(chunk)
        return sk

    whole = build(data)
    r2 = whole.rbits - 3
    folded = whole.fold_to(r2)
    assert folded.rbits == r2 and folded.qbits == whole.qbits
    # fps match a direct build at the SAME geometry
    direct = _mk(capacity=8000, fpp=0.001)
    direct.rbits = r2  # same q, coarser r
    direct.update(data)
    assert (folded.fps == direct.fps).all()
    # fold commutes with merge, byte-for-byte
    fa, fb = build(a_data), build(b_data)
    assert (
        fa.copy().merge(fb.copy()).fold_to(r2).to_bytes()
        == fa.fold_to(r2).merge(fb.fold_to(r2)).to_bytes()
    )
    # zero FN survives the fold; honest fpp grows ~2^3
    assert folded.might_contain_batch(data).all()
    assert folded.expected_fpp() > whole.expected_fpp() * 4
    # SQL reachability rides the generic sketch_fold dispatch (fold_to)
    with pytest.raises(ValueError):
        whole.fold_to(whole.rbits + 1)


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    data=st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300),
    cut=st.integers(min_value=0, max_value=300),
    dedup=st.booleans(),
)
def test_qf_merge_split_equals_whole_property(data, cut, dedup):
    """For ANY multiset and ANY split point, building the two halves
    separately and merging equals the whole build byte-for-byte — in both
    set and multiset modes."""
    vals = np.array(data, dtype=np.int64)
    cut = min(cut, len(vals))

    def build(chunk):
        sk = QuotientFilterSketch(512, 0.02, funnel=FUNNEL_LONG, dedup_build=dedup)
        if len(chunk):
            sk.update(chunk)
        return sk

    merged = build(vals[:cut]).merge(build(vals[cut:]))
    assert merged.to_bytes() == build(vals).to_bytes()


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=200),
    delta=st.integers(min_value=0, max_value=3),
)
def test_qf_fold_merge_commutation_property(data, delta):
    vals = np.array(data, dtype=np.int64)
    half = len(vals) // 2

    def build(chunk):
        sk = QuotientFilterSketch(256, 0.01, funnel=FUNNEL_LONG)
        if len(chunk):
            sk.update(chunk)
        return sk

    a, b = build(vals[:half]), build(vals[half:])
    r2 = a.rbits - delta
    if r2 < 1:
        return
    assert (
        a.copy().merge(b.copy()).fold_to(r2).to_bytes()
        == a.fold_to(r2).merge(b.fold_to(r2)).to_bytes()
    )


@settings(max_examples=40, deadline=None)
@given(
    present=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=100),
)
def test_qf_multiset_remove_then_probe_property(present):
    """remove() of each inserted copy in any multiset leaves exactly the
    remaining copies probe-true (no false negatives among survivors)."""
    vals = np.array(present, dtype=np.int64)
    sk = QuotientFilterSketch(512, 0.02, funnel=FUNNEL_LONG, dedup_build=False)
    sk.update(vals)
    # remove one copy of each distinct value; survivors = multiset minus one each
    uniq, counts = np.unique(vals, return_counts=True)
    removed = sk.remove_all(uniq)
    assert removed == len(uniq)
    survivors = uniq[counts > 1]
    if len(survivors):
        assert sk.might_contain_batch(survivors).all()
    assert sk.size == len(vals) - len(uniq)


def test_pack_bits_chunked_matches_one_shot(monkeypatch):
    """The bounded-transient chunked pack/gather must be byte-identical to
    a one-shot pack for every width, including non-byte-aligned widths and
    a final partial chunk."""
    import numpy as np

    from guava_probably_spark.sketches import qf as qfmod

    rng = np.random.default_rng(11)
    for width in (2, 5, 8, 10, 13):
        vals = rng.integers(0, 1 << width, size=2500, dtype=np.uint64)
        one_shot = qfmod._pack_bits(vals, width).copy()
        monkeypatch.setattr(qfmod, "_PACK_CHUNK", 1024)  # force 3 chunks
        chunked = qfmod._pack_bits(vals, width)
        assert chunked.tobytes() == one_shot.tobytes(), f"width {width}"
        # gather across chunk boundaries returns the original values
        idx = np.sort(rng.choice(2500, size=700, replace=False)).astype(np.int64)
        got = qfmod._gather_packed(chunked, idx, width, 2500)
        assert (got == vals[idx]).all(), f"width {width}"
        monkeypatch.undo()


def test_qf_dense_serialize_roundtrip_across_chunks(monkeypatch):
    """A dense table spanning multiple pack chunks round-trips
    byte-identically (serialize -> decode -> serialize)."""
    import numpy as np

    from guava_probably_spark.sketches import Sketch, qf as qfmod
    from guava_probably_spark.sketches.qf import QuotientFilterSketch

    monkeypatch.setattr(qfmod, "_PACK_CHUNK", 4096)
    sk = QuotientFilterSketch(capacity=12000, fpp=0.01)
    h = np.unique(np.random.default_rng(3).integers(0, 1 << 63, 9000, dtype=np.uint64))
    sk.ingest_hashes(h, h)
    blob = sk.to_bytes()
    sk2 = Sketch.from_bytes(blob)
    assert sk2.to_bytes() == blob
    assert sk2.contains_hashes(h, h).all()
