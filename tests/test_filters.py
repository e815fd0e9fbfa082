"""Bloom + cuckoo filter semantics — the CuckooFilterTest/BloomFilterTest
suite re-expressed (BASELINE.json:6; SURVEY.md §5.1): zero false negatives,
observed FPP ≤ bound + 3σ, saturation returns False (with rollback), remove
semantics, geometry math vs published formulas, semi-sort round-trip.
"""

import math

import numpy as np
import pytest

from guava_probably_spark.sketches import (
    BloomSketch,
    CuckooSketch,
    bloom_geometry,
    cuckoo_geometry,
)
from guava_probably_spark.sketches.base import FUNNEL_LONG, FUNNEL_UTF8, Sketch

FPP_GRID = [0.03, 0.01, 0.001]


def _members_nonmembers(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    members = rng.choice(10**10, n, replace=False)
    non = members + 10**10  # disjoint by construction
    return members, non


@pytest.mark.parametrize("fpp", FPP_GRID)
@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_zero_false_negatives_and_fpp_bound(kind, fpp):
    members, non = _members_nonmembers()
    cls = BloomSketch if kind == "bloom" else CuckooSketch
    sk = cls(len(members), fpp, funnel=FUNNEL_LONG)
    res = sk.update(members)
    assert res.all(), f"{kind} insert failures below capacity"
    # HARD requirement: zero false negatives (BASELINE.md)
    assert sk.might_contain_batch(members).all()
    # observed FPP ≤ fpp + 3σ
    fpr = sk.might_contain_batch(non).mean()
    sigma = math.sqrt(fpp * (1 - fpp) / len(non))
    assert fpr <= fpp + 3 * sigma, f"{kind} fpr {fpr} > {fpp} + 3σ"
    assert sk.expected_fpp() <= fpp * 1.5 + 3 * sigma


def test_bloom_geometry_formulas():
    m, k = bloom_geometry(10000, 0.01)
    # published: m = -n ln p / ln^2 2 ≈ 9.585 n;  k = m/n ln2 ≈ 6.64
    assert abs(m - 9.585 * 10000) < 100
    assert k == 7


def test_cuckoo_geometry_formulas():
    m, b, f = cuckoo_geometry(10000, 0.01)
    assert b == 4
    assert f == math.ceil(math.log2(2 * 4 / 0.01))  # 10 bits
    assert m == math.ceil(10000 / (0.955 * 4))


def test_bloom_put_returns_bits_changed():
    sk = BloomSketch(100, 0.01)
    assert sk.put("alpha") is True
    assert sk.put("alpha") is False  # already present → no bits changed
    assert sk.might_contain("alpha")
    assert not sk.might_contain("beta-definitely-absent")


def test_bloom_remove_unsupported():
    sk = BloomSketch(100, 0.01)
    with pytest.raises(NotImplementedError):
        sk.remove("x")


def test_cuckoo_remove_only_removes_added():
    members, _ = _members_nonmembers(5000)
    sk = CuckooSketch(5000, 0.01, funnel=FUNNEL_LONG)
    assert sk.update(members).all()
    evens = members[::2]
    odds = members[1::2]
    from guava_probably_spark.sketches.hashing import hash128_u64

    removed = sk.remove_hashes(*hash128_u64(evens))
    assert removed.all()
    assert sk.size == len(odds)
    # zero false negatives preserved for everything NOT removed
    assert sk.might_contain_batch(odds).all()


def test_cuckoo_remove_absent_returns_false_mostly():
    sk = CuckooSketch(1000, 0.001, funnel=FUNNEL_LONG)
    sk.update(np.arange(100, dtype=np.int64))
    # removing never-added elements: almost surely not found at fpp=0.001
    from guava_probably_spark.sketches.hashing import hash128_u64

    found = sk.remove_hashes(*hash128_u64(np.arange(10**6, 10**6 + 200, dtype=np.int64)))
    assert found.sum() <= 2  # FP-rate-level collisions only


def test_cuckoo_saturation_put_returns_false_and_rolls_back():
    sk = CuckooSketch(100, 0.03, funnel=FUNNEL_LONG)
    rng = np.random.default_rng(9)
    vals = rng.choice(10**9, 5000, replace=False)
    res = sk.update(vals)
    assert not res.all(), "expected saturation past capacity"
    inserted = vals[res]
    # every successfully-put element still has zero false negatives —
    # failed puts rolled back their kick chains (SURVEY.md §2 row 2)
    assert sk.might_contain_batch(inserted).all()


def test_cuckoo_semisort_roundtrip_preserves_contents():
    members, _ = _members_nonmembers(8000)
    sk = CuckooSketch(8000, 0.01, funnel=FUNNEL_LONG)  # f=10 → semi-sort active
    assert sk._semisort_active()
    sk.update(members)
    blob = sk.to_bytes()
    sk2 = Sketch.from_bytes(blob)
    assert sk2.size == sk.size
    assert sk2.might_contain_batch(members).all()
    # semi-sort blob is smaller than raw packing would be
    raw_bytes = sk.table.nbytes
    payload = len(blob)
    assert payload < raw_bytes


def test_cuckoo_merge_overflow_reported():
    a = CuckooSketch(1000, 0.01, funnel=FUNNEL_LONG)
    b = CuckooSketch(1000, 0.01, funnel=FUNNEL_LONG)
    rng = np.random.default_rng(10)
    a.update(rng.choice(10**9, 950, replace=False))
    b.update(rng.choice(10**9, 950, replace=False) + 10**10)
    ok, overflow = a.merge_counted(b)
    assert not ok and overflow > 0  # combined load 1.9× capacity must overflow


def test_string_funnel_and_long_funnel_incompatible():
    a = BloomSketch(100, 0.01, funnel=FUNNEL_UTF8)
    b = BloomSketch(100, 0.01, funnel=FUNNEL_LONG)
    assert not a.is_compatible(b)


def test_unicode_membership():
    sk = BloomSketch(100, 0.001)
    items = ["héllo", "wörld", "漢字テスト", "🎉🎊", "plain"]
    for it in items:
        sk.put(it)
    for it in items:
        assert sk.might_contain(it)
