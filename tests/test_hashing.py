"""Murmur3_x64_128 kernel: published vectors, vectorized == scalar, involution."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from guava_probably_spark.sketches.hashing import (
    bytes_batch_to_buffer,
    hash128_bytes,
    hash128_scalar,
    hash128_u64,
)

# Public murmur3_x64_128 vectors (Guava Murmur3Hash128Test / smhasher):
# (seed, h1, h2, input)
VECTORS = [
    (0, 0x629942693E10F867, 0x92DB0B82BAEB5347, b"hell"),
    (1, 0xA78DDFF5ADAE8D10, 0x128900EF20900135, b"hello"),
    (2, 0x8A486B23F422E826, 0xF962A2C58947765F, b"hello "),
    (3, 0x2EA59F466F6BED8C, 0xC610990ACC428A17, b"hello w"),
    (4, 0x79F6305A386C572C, 0x46305AED3483B94E, b"hello wo"),
    (5, 0xC2219D213EC1F1B5, 0xA1D8E2E0A52785BD, b"hello wor"),
    (0, 0xE34BBC7BBC071B6C, 0x7A433CA9C49A9347, b"The quick brown fox jumps over the lazy dog"),
    (0, 0x658CA970FF85269A, 0x43FEE3EAA68E5C3E, b"The quick brown fox jumps over the lazy cog"),
]


@pytest.mark.parametrize("seed,e1,e2,data", VECTORS)
def test_published_vectors_scalar(seed, e1, e2, data):
    assert hash128_scalar(data, seed) == (e1, e2)


@pytest.mark.parametrize("seed,e1,e2,data", VECTORS)
def test_published_vectors_vectorized(seed, e1, e2, data):
    buf, offs = bytes_batch_to_buffer([data])
    h1, h2 = hash128_bytes(buf, offs, seed)
    assert (int(h1[0]), int(h2[0])) == (e1, e2)


def test_empty_string_is_zero():
    assert hash128_scalar(b"", 0) == (0, 0)
    buf, offs = bytes_batch_to_buffer([b""])
    h1, h2 = hash128_bytes(buf, offs)
    assert int(h1[0]) == 0 and int(h2[0]) == 0


def test_vectorized_matches_scalar_random():
    rng = np.random.default_rng(7)
    items = [b""] + [rng.bytes(int(L)) for L in rng.integers(0, 500, 300)]
    items += ["üñïçødé 漢字 🎉 ".encode() * k for k in range(20)]
    buf, offs = bytes_batch_to_buffer(items)
    h1, h2 = hash128_bytes(buf, offs)
    for i, it in enumerate(items):
        assert (int(h1[i]), int(h2[i])) == hash128_scalar(it), f"item {i}"


def test_u64_fast_path_equals_bytes_path():
    rng = np.random.default_rng(8)
    vals = rng.integers(0, 2**63, 2000, dtype=np.int64)
    items = [int(v).to_bytes(8, "little") for v in vals]
    buf, offs = bytes_batch_to_buffer(items)
    b1, b2 = hash128_bytes(buf, offs)
    u1, u2 = hash128_u64(vals)
    assert (b1 == u1).all() and (b2 == u2).all()


@given(st.binary(max_size=200), st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_hypothesis_vectorized_equals_scalar(data, seed):
    buf, offs = bytes_batch_to_buffer([data])
    h1, h2 = hash128_bytes(buf, offs, seed)
    assert (int(h1[0]), int(h2[0])) == hash128_scalar(data, seed)


@given(
    st.integers(min_value=0, max_value=2**40),
    st.integers(min_value=1, max_value=(1 << 16) - 1),
    st.integers(min_value=2, max_value=10**9),
)
@settings(max_examples=200, deadline=None)
def test_cuckoo_alt_index_involution(i, fp, m):
    """∀ (i, fp, m): alt(alt(i, fp), fp) == i — for ARBITRARY (non-power-of-2) m.

    The defining property of the reference's Beal-Dupras strategy
    (SURVEY.md §2 row 18), hypothesis-tested as the survey requires."""
    from guava_probably_spark.sketches.cuckoo import CuckooSketch

    sk = CuckooSketch.__new__(CuckooSketch)
    sk.m = m
    i = i % m
    a1 = sk._alt_scalar(i, fp)
    a2 = sk._alt_scalar(a1, fp)
    assert 0 <= a1 < m
    assert a2 == i
    # vectorized agrees with scalar
    av = sk._alt(np.array([i], np.uint64), np.array([fp], np.uint64))
    assert int(av[0]) == a1
