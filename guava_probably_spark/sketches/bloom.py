"""Bloom filter — murmur3-128 double hashing (Kirsch–Mitzenmacher).

From-scratch vectorized re-expression of the semantics of guava-probably's
``BloomFilter`` decorator over Guava's ``MURMUR128_MITZ_64`` strategy
(reference: bdupras/guava-probably
``src/main/java/com/duprasville/guava/probably/BloomFilter.java`` — semantics
only, SURVEY.md §2 rows 1-6, 9-16, 19):

- geometry: m = ceil(-n·ln p / ln²2) bits, k = max(1, round(m/n·ln 2))
- index_i = ((h1 + i·h2) & 2⁶³−1) mod m  for i in [0, k)
- put returns True iff any bit changed; size() counts bit-changing puts
- merge = bitwise OR (associative, commutative, idempotent)
- expected_fpp = (set_bits / m)^k
- zero false negatives, remove() unsupported (reference throws; we raise)
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import (
    FUNNEL_LONG,
    FUNNEL_UTF8,
    KIND_BLOOM,
    Sketch,
    element_to_hash,
    hash_column,
    register_kind,
)

_SIGN_MASK = np.uint64(0x7FFFFFFFFFFFFFFF)


def bloom_geometry(capacity: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) per the published optimal formulas (Bloom 1970)."""
    if capacity <= 0:
        capacity = 1
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = int(math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)  # whole uint64 words
    k = max(1, int(round(m / capacity * math.log(2))))
    return m, k


@register_kind
class BloomSketch(Sketch):
    KIND = KIND_BLOOM

    def __init__(self, capacity: int, fpp: float = 0.03, funnel: int = FUNNEL_UTF8):
        super().__init__(funnel)
        self.capacity = int(capacity)
        self.design_fpp = float(fpp)
        self.m, self.k = bloom_geometry(self.capacity, self.design_fpp)
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    # -- geometry / serialization -------------------------------------------
    # The blob holds geometry + bit array only (as Guava's writeTo does);
    # size() is derived from bit occupancy so serialized blobs are a pure
    # function of the inserted *set* — byte-equal across partitionings and
    # merge orders (BASELINE.md "merge associativity: blobs byte-equal").
    def _params_tuple(self) -> tuple:
        return (self.capacity, round(self.design_fpp, 12), self.m, self.k)

    def _params_bytes(self) -> bytes:
        return struct.pack("<qdqi", self.capacity, self.design_fpp, self.m, self.k)

    def _payload_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "BloomSketch":
        capacity, fpp, m, k = struct.unpack("<qdqi", params)
        # a truncated payload must fail HERE with ValueError (the decode
        # contract checkpoint-heal keys on), not as an IndexError at the
        # first probe
        if len(payload) != m // 8:
            raise ValueError(
                f"corrupt bloom payload: {len(payload)} bytes for m={m}"
            )
        sk = cls.__new__(cls)
        Sketch.__init__(sk, funnel)
        sk.capacity, sk.design_fpp, sk.m, sk.k = capacity, fpp, m, k
        sk.bits = np.frombuffer(payload, dtype=np.uint64).copy()
        return sk

    # -- hashing -------------------------------------------------------------
    def _indexes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(n, k) bit indexes — Guava MURMUR128_MITZ_64 double hashing."""
        with np.errstate(over="ignore"):
            i = np.arange(self.k, dtype=np.uint64)
            combined = h1[:, None] + i * h2[:, None]
            return (combined & _SIGN_MASK) % np.uint64(self.m)

    # -- batch API (the Spark hot path) ---------------------------------------
    def put_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Insert pre-hashed elements; returns bool array 'bits changed'."""
        idx = self._indexes(h1, h2)
        word = (idx >> np.uint64(6)).astype(np.int64)
        mask = np.uint64(1) << (idx & np.uint64(63))
        pre = (self.bits[word] & mask) != 0
        changed = ~pre.all(axis=1)
        np.bitwise_or.at(self.bits, word, mask)
        return changed

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        idx = self._indexes(h1, h2)
        word = (idx >> np.uint64(6)).astype(np.int64)
        mask = np.uint64(1) << (idx & np.uint64(63))
        return ((self.bits[word] & mask) != 0).all(axis=1)

    def ingest_hashes(self, h1: np.ndarray, h2: np.ndarray) -> int:
        """Uniform pre-hashed ingest (multi-sketch builds hash once per column).
        Skips put_hashes' changed-bits read-back (an (n, k) gather + reduce
        nobody consumes on the build path — the kernel is DRAM-bound, so the
        extra traffic roughly doubled per-batch cost). Returns 0 (a bloom
        filter cannot overflow)."""
        idx = self._indexes(h1, h2)
        word = (idx >> np.uint64(6)).astype(np.int64)
        mask = np.uint64(1) << (idx & np.uint64(63))
        np.bitwise_or.at(self.bits, word, mask)
        return 0

    def update(self, values) -> np.ndarray:
        """Insert a column batch (pyarrow/pandas/list); nulls skipped."""
        _, h1, h2 = hash_column(values, self.funnel)
        return self.put_hashes(h1, h2)

    def might_contain_batch(self, values) -> np.ndarray:
        _, h1, h2 = hash_column(values, self.funnel)
        return self.contains_hashes(h1, h2)

    # -- guava-style scalar surface -------------------------------------------
    def put(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(self.put_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0])

    def put_all(self, elements) -> bool:
        return bool(self.update(list(elements)).all())

    def might_contain(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(
            self.contains_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0]
        )

    def contains_all(self, elements) -> bool:
        return bool(self.might_contain_batch(list(elements)).all())

    def remove(self, e) -> bool:
        raise NotImplementedError(
            "BloomFilter does not support remove (reference throws "
            "UnsupportedOperationException; SURVEY.md §2 row 7)"
        )

    # -- merge / introspection -------------------------------------------------
    def merge(self, other: "BloomSketch") -> "BloomSketch":
        self._check_compatible(other)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def fpp(self) -> float:
        return self.design_fpp

    def _set_bits(self) -> int:
        return int(np.unpackbits(self.bits.view(np.uint8)).sum())

    def expected_fpp(self) -> float:
        return (self._set_bits() / self.m) ** self.k

    @property
    def size(self) -> int:
        """Approximate element count from bit occupancy: −m/k·ln(1−x/m)."""
        x = self._set_bits()
        if x == 0:
            return 0
        if x >= self.m:
            return self.capacity
        return int(round(-self.m / self.k * math.log1p(-x / self.m)))

    def is_empty(self) -> bool:
        return not self.bits.any()

    def clear(self) -> None:
        self.bits[:] = 0


def bloom_for_longs(capacity: int, fpp: float = 0.03) -> BloomSketch:
    return BloomSketch(capacity, fpp, funnel=FUNNEL_LONG)


def bloom_for_strings(capacity: int, fpp: float = 0.03) -> BloomSketch:
    return BloomSketch(capacity, fpp, funnel=FUNNEL_UTF8)
