"""Shared ProbabilisticFilter-contract tests across all six sketches —
the abstract-contract-suite pattern of the reference's tests
(SURVEY.md §5.1 "shared contract tests"), pytest-parametrized.
"""

import numpy as np
import pytest

from guava_probably_spark.sketches import (
    IncompatibleSketchError,
    Sketch,
    SketchSpec,
)
from guava_probably_spark.sketches.base import FUNNEL_LONG

SPECS = [
    SketchSpec("bloom", {"capacity": 10000, "fpp": 0.01, "funnel": FUNNEL_LONG}),
    SketchSpec("cuckoo", {"capacity": 10000, "fpp": 0.01, "funnel": FUNNEL_LONG}),
    SketchSpec("hll", {"p": 12, "funnel": FUNNEL_LONG}),
    SketchSpec("cms", {"epsilon": 0.005, "delta": 0.01, "funnel": FUNNEL_LONG}),
    SketchSpec("kll", {"k": 200}),
    SketchSpec("tdigest", {"delta": 100.0}),
    SketchSpec("sbf", {"initial_capacity": 512, "fpp": 0.01, "funnel": FUNNEL_LONG}),
    SketchSpec("dd", {"alpha": 0.01}),
    SketchSpec("req", {"k": 32}),
    SketchSpec("bottomk", {"k": 128, "funnel": FUNNEL_LONG}),
    SketchSpec("countsketch", {"width": 2048, "depth": 5, "funnel": FUNNEL_LONG}),
    SketchSpec("tuple", {"k": 128, "funnel": FUNNEL_LONG}),
    SketchSpec("qf", {"capacity": 10000, "fpp": 0.01, "funnel": FUNNEL_LONG}),
]
IDS = [s.kind for s in SPECS]

INCOMPATIBLE_TWINS = {
    "bloom": SketchSpec("bloom", {"capacity": 9999, "fpp": 0.01, "funnel": FUNNEL_LONG}),
    "cuckoo": SketchSpec("cuckoo", {"capacity": 9999, "fpp": 0.01, "funnel": FUNNEL_LONG}),
    "hll": SketchSpec("hll", {"p": 13, "funnel": FUNNEL_LONG}),
    "cms": SketchSpec("cms", {"epsilon": 0.004, "delta": 0.01, "funnel": FUNNEL_LONG}),
    "kll": SketchSpec("kll", {"k": 256}),
    "tdigest": SketchSpec("tdigest", {"delta": 50.0}),
    "sbf": SketchSpec("sbf", {"initial_capacity": 511, "fpp": 0.01, "funnel": FUNNEL_LONG}),
    "dd": SketchSpec("dd", {"alpha": 0.02}),
    "req": SketchSpec("req", {"k": 64}),
    "bottomk": SketchSpec("bottomk", {"k": 256, "funnel": FUNNEL_LONG}),
    "countsketch": SketchSpec("countsketch", {"width": 4096, "depth": 5, "funnel": FUNNEL_LONG}),
    "tuple": SketchSpec("tuple", {"k": 256, "funnel": FUNNEL_LONG}),
    "qf": SketchSpec("qf", {"capacity": 9999, "fpp": 0.01, "funnel": FUNNEL_LONG}),
}


def _data(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 10**12, n, dtype=np.int64)


def _update(sk, vals):
    sk.update(vals)


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_serialization_round_trip_byte_identical(spec):
    sk = spec.create()
    _update(sk, _data())
    blob = sk.to_bytes()
    sk2 = Sketch.from_bytes(blob)
    assert sk2.to_bytes() == blob  # writeTo/readFrom byte-stability (row 13/14)
    assert type(sk2) is type(sk)


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_copy_and_equals(spec):
    sk = spec.create()
    _update(sk, _data())
    cp = sk.copy()
    assert cp == sk and cp is not sk
    assert hash(cp) == hash(sk)


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_is_compatible_gates_merge(spec):
    a, b = spec.create(), spec.create()
    assert a.is_compatible(b) and b.is_compatible(a)
    assert not a.is_compatible(a)  # same instance → not compatible (row 9)
    other = INCOMPATIBLE_TWINS[spec.kind].create()
    assert not a.is_compatible(other)
    with pytest.raises((IncompatibleSketchError, ValueError)):
        a.merge(other)


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_merge_equals_whole_build_or_within_bound(spec):
    """putAll(filter) associativity/correctness (SURVEY.md §5.2.2):
    bloom/HLL/CMS → blob byte-equal across merge orders; cuckoo/KLL/t-digest
    → estimates within bound across merge orders."""
    data = _data(6000, seed=11)
    parts = np.array_split(data, 3)

    def build(chunk):
        sk = spec.create()
        _update(sk, chunk)
        return sk

    left = build(parts[0]).merge(build(parts[1])).merge(build(parts[2]))
    right_inner = build(parts[1]).merge(build(parts[2]))
    right = build(parts[0]).merge(right_inner)

    if spec.kind in ("bloom", "hll", "cms", "dd", "bottomk", "countsketch", "tuple", "qf"):
        whole = build(data)
        assert left.to_bytes() == right.to_bytes() == whole.to_bytes()
    elif spec.kind == "sbf":
        # stage-set union: byte-equal across merge orders (canonical form),
        # zero FN; NOT byte-equal to the whole build (stage layout differs)
        assert left.to_bytes() == right.to_bytes()
        uniq = np.unique(data)
        assert left.might_contain_batch(uniq).all()
    elif spec.kind == "cuckoo":
        uniq = np.unique(data)
        assert left.might_contain_batch(uniq).all()
        assert right.might_contain_batch(uniq).all()
    else:  # quantile sketches: estimates within bound for both orders
        qs = np.array([0.1, 0.5, 0.9])
        srt = np.sort(data.astype(np.float64))
        for sk in (left, right):
            est = sk.quantile(qs)
            ranks = np.searchsorted(srt, est) / len(srt)
            assert (np.abs(ranks - qs) <= sk.rank_error_bound()).all()


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_empty_and_clear(spec):
    sk = spec.create()
    assert sk.is_empty()
    _update(sk, _data(100))
    assert not sk.is_empty()
    if hasattr(sk, "clear"):
        sk.clear()
        assert sk.is_empty()


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_merge_commutativity(spec):
    data = _data(4000, seed=13)
    a_data, b_data = data[:2000], data[2000:]

    def build(chunk):
        sk = spec.create()
        _update(sk, chunk)
        return sk

    ab = build(a_data).merge(build(b_data))
    ba = build(b_data).merge(build(a_data))
    if spec.kind in ("bloom", "hll", "cms", "sbf", "dd", "bottomk", "countsketch", "tuple", "qf"):
        assert ab.to_bytes() == ba.to_bytes()
    elif spec.kind == "cuckoo":
        uniq = np.unique(data)
        assert ab.might_contain_batch(uniq).all()
        assert ba.might_contain_batch(uniq).all()
    else:
        qs = np.array([0.25, 0.75])
        srt = np.sort(data.astype(np.float64))
        for sk in (ab, ba):
            ranks = np.searchsorted(srt, sk.quantile(qs)) / len(srt)
            assert (np.abs(ranks - qs) <= sk.rank_error_bound()).all()


def test_from_bytes_corruption_always_raises_valueerror():
    """Any truncation/bitflip/byte-swap of a valid blob either decodes or
    raises ValueError — never a leaked struct.error/IndexError (the
    checkpoint heal path catches ValueError to trigger rebuild)."""
    import random

    from guava_probably_spark.sketches.base import FUNNEL_UTF8

    all_specs = SPECS + [
        SketchSpec("mg", {"k": 64, "funnel": FUNNEL_UTF8}),
        SketchSpec("theta", {"k": 256}),
        SketchSpec("fd", {"ell": 16}),
        SketchSpec("dd", {"alpha": 0.01, "max_bins": 256}),
        SketchSpec("sbf", {"initial_capacity": 128, "fpp": 0.02, "funnel": FUNNEL_LONG}),
        SketchSpec("bottomk", {"k": 64, "funnel": FUNNEL_UTF8}),
        # small capacity → table-mode payload (the SPECS qf entry fuzzes
        # the sparse transport mode)
        SketchSpec("qf", {"capacity": 128, "fpp": 0.02, "funnel": FUNNEL_LONG}),
        SketchSpec("varopt", {"k": 64, "funnel": FUNNEL_LONG}),
        SketchSpec("xor", {"fbits": 8}),  # built via build_from_hashes below
        SketchSpec("xormap", {"fbits": 8, "vbits": 8}),
    ]
    vals = _data(2000)
    for spec in all_specs:
        sk = spec.create()
        if spec.kind == "fd":
            sk.update(np.asarray(vals, dtype=np.float64).reshape(-1, 8))
            blob = sk.to_bytes()
        elif spec.kind == "xor":
            from guava_probably_spark.sketches import XorFilter

            sk = XorFilter.build_from_hashes(
                np.asarray(vals).astype(np.uint64), fbits=8
            )
            blob = sk.to_bytes()
        elif spec.kind == "xormap":
            from guava_probably_spark.sketches import XorStaticMap

            hh = np.unique(np.asarray(vals).astype(np.uint64))
            sk = XorStaticMap.build_from_hashes(
                hh, (hh % 256).astype(np.int64), fbits=8, vbits=8
            )
            blob = sk.to_bytes()
        else:
            try:
                sk.update(vals)
            except IncompatibleSketchError:
                sk.update([f"item-{v}" for v in vals[:500]])
            blob = sk.to_bytes()
        r = random.Random(spec.kind)
        for _ in range(150):
            b = bytearray(blob)
            mode = r.randrange(3)
            if mode == 0:
                b = b[: r.randrange(len(b))]
            elif mode == 1:
                for _ in range(r.randrange(1, 8)):
                    b[r.randrange(len(b))] ^= 1 << r.randrange(8)
            else:
                i, j = r.randrange(len(b)), r.randrange(len(b))
                b[i], b[j] = b[j], b[i]
            try:
                Sketch.from_bytes(bytes(b)).to_bytes()
            except ValueError:
                pass  # the one allowed failure type


def test_iceberg_loader_flag_composes():
    """The Iceberg branch of sources.load_transcripts can't execute here (no
    runtime jar — SURVEY.md §1.2), but the composition contract must hold:
    format("iceberg") then load(table-or-path), with `table` taking
    precedence, and the parquet branch never touching format()."""
    from guava_probably_spark.sources import load_transcripts

    calls = []

    class _Reader:
        def format(self, fmt):
            calls.append(("format", fmt))
            return self

        def load(self, target):
            calls.append(("load", target))
            return "DF"

        def parquet(self, path):
            calls.append(("parquet", path))
            return "DF"

    class _Spark:
        @property
        def read(self):
            return _Reader()

    fake = _Spark()
    assert load_transcripts(fake, "/p", fmt="iceberg", table="cat.db.t") == "DF"
    assert calls == [("format", "iceberg"), ("load", "cat.db.t")]
    calls.clear()
    assert load_transcripts(fake, "/p", fmt="iceberg") == "DF"
    assert calls == [("format", "iceberg"), ("load", "/p")]  # path fallback
    calls.clear()
    assert load_transcripts(fake, "/p") == "DF"
    assert calls == [("parquet", "/p")]  # parquet branch bypasses format()


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_empty_and_all_null_updates_noop(spec):
    """putAll([]) / update([None, None]) must no-op, not crash: arrow infers
    the NULL type for those batches and the funnel dispatch used to raise
    TypeError, contradicting the documented nulls-are-dropped contract."""
    sk = spec.create()
    sk.update([])
    sk.update([None, None])
    blob = sk.to_bytes()
    sk2 = spec.create()
    assert blob == sk2.to_bytes()  # still empty
    if hasattr(sk, "put_all"):
        assert sk.put_all([]) in (True, None)
    if hasattr(sk, "might_contain_batch"):
        assert len(sk.might_contain_batch([])) == 0


def test_uint64_above_2_63_batch_matches_scalar():
    """A key put() as a scalar must probe True through the batch path even
    when it exceeds int64 range (the checked int64 cast used to raise
    ArrowInvalid on uint64 input)."""
    spec = SketchSpec("bloom", {"capacity": 1000, "fpp": 0.01, "funnel": FUNNEL_LONG})
    sk = spec.create()
    big = 2**63 + 12345
    sk.put(big)
    assert sk.might_contain_batch(np.array([big], dtype=np.uint64)).all()
    sk.update(np.array([2**64 - 1], dtype=np.uint64))
    assert sk.might_contain(2**64 - 1)


def test_bloom_truncated_word_payload_raises_valueerror():
    """Losing a trailing 8-byte word keeps the payload 8-aligned, so only an
    explicit length-vs-geometry check can catch it at decode time (the
    checkpoint heal path keys on ValueError-at-decode)."""
    spec = SPECS[0]  # bloom, small enough to serialize uncompressed
    sk = spec.create()
    sk.update(list(range(500)))
    blob = sk.to_bytes()
    with pytest.raises(ValueError):
        Sketch.from_bytes(blob[:-8])


def test_cuckoo_fpp_below_32bit_fingerprint_floor_rejected():
    from guava_probably_spark.sketches import CuckooSketch

    with pytest.raises(ValueError):
        CuckooSketch(1000, fpp=1e-10)


def test_tdigest_read_paths_do_not_mutate_state():
    """quantile/rank/to_bytes are queries: repeated calls must return the
    same answers and the same blob (reads used to recompress centroids on
    every call)."""
    spec = SketchSpec("tdigest", {"delta": 100.0})
    sk = spec.create()
    rng = np.random.default_rng(7)
    sk.update(rng.normal(size=50_000))
    q1 = sk.quantile(np.arange(0.1, 1.0, 0.1))
    blob1 = sk.to_bytes()
    nc1 = sk.centroid_count()
    for _ in range(5):
        sk.quantile(0.5)
        sk.rank([0.0, 1.0])
    assert np.array_equal(q1, sk.quantile(np.arange(0.1, 1.0, 0.1)))
    assert sk.to_bytes() == blob1
    assert sk.centroid_count() == nc1


def test_tdigest_merge_does_not_mutate_other():
    """merge(other) must not flush other's buffer (a broadcast/shared
    digest would silently change state as a merge side effect)."""
    a = SketchSpec("tdigest", {"delta": 100.0}).create()
    b = SketchSpec("tdigest", {"delta": 100.0}).create()
    a.update(np.arange(1000, dtype=np.float64))
    b.update(np.arange(1000, 2000, dtype=np.float64))
    buf_before = sum(len(x) for x in b._buf)
    assert buf_before > 0  # b still holds buffered raw values
    a.merge(b)
    assert sum(len(x) for x in b._buf) == buf_before  # untouched
    # the merge still folded b's buffered values in
    assert a.n == 2000
    assert abs(a.quantile(0.5) - 1000) < 100
