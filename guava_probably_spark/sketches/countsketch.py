"""CountSketch — UNBIASED two-sided frequency estimation, F2, inner products.

North-rule extension sketch (SURVEY.md §2.2; not in guava-probably).
Published algorithm: Charikar, Chen, Farach-Colton 2002 ("Finding frequent
items in data streams"); the F2 / inner-product view is the AMS estimator
(Alon, Matias, Szegedy 1996) as tightened by Thorup & Zhang 2004.

Where Count-Min answers "at most how often?" (one-sided overestimate,
additive ε·N error — see sketches/cms.py), CountSketch answers "how often,
unbiasedly?": each of the d rows hashes the item to one of w signed
counters and the row estimate sign(x)·counts[row, bucket(x)] has
expectation exactly f(x) and variance ≤ F2/w; the reported estimate is the
MEDIAN over rows, so |est − f(x)| ≤ √(3·F2/w) with probability
≥ 1 − 2^−Ω(d).  F2 = Σ_v f(v)² (the self-join size) falls out of the same
counters: each row's Σ_j counts[row,j]² is an unbiased F2 estimate with
variance ≤ 2·F2²/w (Thorup–Zhang), and Σ_j A[row,j]·B[row,j] is an
unbiased estimate of the join size Σ_v fA(v)·fB(v).  Together with CMS
this gives both halves of the cardinality-planning story from blobs alone:
CMS bounds a join from above, CountSketch centers it.

- geometry: (width w, depth d) directly — w buckets/row controls variance,
  odd d rows control failure probability (odd so the median is a counter
  value, keeping integer exactness end-to-end).
- row i bucket = ((h1 + i·h2) & 2⁶³−1) mod w (Kirsch–Mitzenmacher double
  hashing from one murmur3_x64_128, same derivation as CMS so the two
  sketches see identical item streams); row i sign = ±1 from bit 63 of
  fmix64((h1 + i·h2) ^ SIGN_SALT) — the finalizer decorrelates sign from
  bucket (bucket uses the low bits via mod, sign a mixed high bit).
- merge = elementwise + (associative & commutative; blobs byte-equal across
  merge orders AND equal to the whole build, the HLL/CMS determinism class)
- fold_to(m): w → w/m (m | w) — bucket = x mod w determines x mod (w/m)
  exactly and the sign does not depend on w, so the fold is a pure
  reshape-sum on the counter matrix, byte-exact, commuting with update and
  merge with no caveat (same argument as CmsSketch.fold_to); reachable
  from SQL via ``sketch_fold(sketch, m)``.

FUNNEL_PREHASHED is supported through the same xxhash64→(h1, h2) derivation
CMS uses (cms.prehash_pair), so the JVM-side prehash fast path and its
byte-identity guarantees carry over unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import (
    FUNNEL_PREHASHED,
    FUNNEL_UTF8,
    KIND_COUNTSKETCH,
    Sketch,
    element_to_hash,
    hash_column,
    prehashed_hashes,
    register_kind,
)
from .cms import prehash_pair

_SIGN_MASK = np.uint64(0x7FFFFFFFFFFFFFFF)
# Distinct from cms._PREHASH_H2_SALT on purpose: the sign stream must be
# independent of anything the bucket stream exposes.
_SIGN_SALT = np.uint64(0xC2B2AE3D27D4EB4F)


def _fmix64(h: np.ndarray) -> np.ndarray:
    from .hashing import _fmix64 as f

    return f(h)


@register_kind
class CountSketch(Sketch):
    KIND = KIND_COUNTSKETCH

    def __init__(self, width: int = 4096, depth: int = 5, funnel: int = FUNNEL_UTF8):
        super().__init__(funnel)
        if width < 2:
            raise ValueError("width must be >= 2")
        if depth < 1 or depth % 2 == 0:
            raise ValueError("depth must be a positive ODD row count "
                             "(median of an even count averages two counters)")
        self.w = int(width)
        self.d = int(depth)
        self.counts = np.zeros((self.d, self.w), dtype=np.int64)
        self.total = 0  # N = total weight inserted (for introspection)

    # -- serialization ---------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (self.w, self.d)

    def _params_bytes(self) -> bytes:
        return struct.pack("<qiq", self.w, self.d, self.total)

    def _payload_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "CountSketch":
        w, d, total = struct.unpack("<qiq", params)
        sk = cls.__new__(cls)
        Sketch.__init__(sk, funnel)
        sk.w, sk.d, sk.total = w, d, total
        sk.counts = np.frombuffer(payload, dtype=np.int64).reshape(d, w).copy()
        return sk

    # -- updates ----------------------------------------------------------------
    def _buckets_signs(self, h1: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(d, n) bucket indexes and ±1 signs."""
        with np.errstate(over="ignore"):
            i = np.arange(self.d, dtype=np.uint64)[:, None]
            combined = h1[None, :] + i * h2[None, :]
            buckets = ((combined & _SIGN_MASK) % np.uint64(self.w)).astype(np.int64)
            signs = (
                (_fmix64(combined ^ _SIGN_SALT) >> np.uint64(63)).astype(np.int64) * 2 - 1
            )
        return buckets, signs

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray, weights=None) -> None:
        b, s = self._buckets_signs(h1, h2)
        if weights is None:
            for i in range(self.d):
                np.add.at(self.counts[i], b[i], s[i])
            self.total += len(h1)
        else:
            w = np.asarray(weights, dtype=np.int64)
            for i in range(self.d):
                np.add.at(self.counts[i], b[i], s[i] * w)
            self.total += int(w.sum())

    def ingest_hashes(self, h1: np.ndarray, h2: np.ndarray) -> int:
        self.update_hashes(h1, h2)
        return 0

    def update(self, values, weights=None) -> None:
        if self.funnel == FUNNEL_PREHASHED:
            h1, h2 = prehash_pair(prehashed_hashes(values))
            self.update_hashes(h1, h2, weights)
            return
        _, h1, h2 = hash_column(values, self.funnel)
        self.update_hashes(h1, h2, weights)

    def put(self, e, weight: int = 1) -> None:
        _, h1, h2 = element_to_hash(e)
        self.update_hashes(
            np.array([h1], np.uint64), np.array([h2], np.uint64), np.array([weight])
        )

    def fold_to(self, m: int) -> "CountSketch":
        """EXACT fold to an ``m``× coarser width (``m`` must divide w):
        bucket₂ = bucket % w₂ when w = m·w₂, and the sign stream never sees
        w — a pure reshape-sum on the counter matrix that commutes
        BYTE-FOR-BYTE with both ``update`` and ``merge`` (counters are
        linear; no history dependence). Size widths as powers of two to
        keep every power-of-two fold reachable; SQL
        ``sketch_fold(sketch, m)``."""
        if not (isinstance(m, (int, np.integer)) and m >= 1):
            raise ValueError(f"fold divisor must be an integer >= 1, got {m}")
        if m == 1:
            return self.copy()
        if self.w % m:
            raise ValueError(f"fold divisor {m} must divide w={self.w}")
        w2 = self.w // int(m)
        out = CountSketch.__new__(CountSketch)
        Sketch.__init__(out, self.funnel)
        out.w, out.d = w2, self.d
        out.counts = self.counts.reshape(self.d, int(m), w2).sum(axis=1)
        out.total = self.total
        return out

    # -- queries ------------------------------------------------------------------
    def estimate_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        b, s = self._buckets_signs(h1, h2)
        ests = np.empty((self.d, len(h1)), dtype=np.int64)
        for i in range(self.d):
            ests[i] = s[i] * self.counts[i][b[i]]
        # d is odd by construction → the median IS one of the row values:
        # integer in, integer out, no .5 averaging
        return np.median(ests, axis=0).astype(np.int64)

    def estimate(self, values) -> np.ndarray:
        """Vectorized UNBIASED point-frequency query (median over rows —
        two-sided, may under- or over-estimate; |err| ≤ error_bound() w.h.p.).
        For a FUNNEL_PREHASHED sketch, ``values`` are the xxhash64 hashes."""
        if self.funnel == FUNNEL_PREHASHED:
            h1, h2 = prehash_pair(prehashed_hashes(values))
            return self.estimate_hashes(h1, h2)
        _, h1, h2 = hash_column(values, self.funnel)
        return self.estimate_hashes(h1, h2)

    def freq(self, e) -> int:
        _, h1, h2 = element_to_hash(e)
        return int(
            self.estimate_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0]
        )

    def _row_sq_sums(self) -> list[int]:
        # exact integer arithmetic: int64 squares overflow numpy, and the
        # byte-determinism story should extend to the derived estimates
        return [int((row.astype(object) ** 2).sum()) for row in self.counts]

    def f2(self) -> int:
        """Second frequency moment Σ_v f(v)² — the SELF-join size — as the
        median over rows of Σ_j counts[row, j]² (AMS/Thorup–Zhang: each row
        unbiased, variance ≤ 2·F2²/w). Exact integer arithmetic; the
        estimate is deterministic given the data (hash-seeded, no RNG)."""
        sums = sorted(self._row_sq_sums())
        return sums[len(sums) // 2]

    def f2_bound(self) -> float:
        """|f2() − F2| ≤ √(6/w)·F2 per-row via Chebyshev at 1/3 failure;
        the median over d rows drives failure to ≤ 2^−Ω(d)."""
        return (6.0 / self.w) ** 0.5

    def error_bound(self) -> float:
        """Point-estimate additive error √(3·F2/w), holding w.h.p. in d.
        Uses the sketch's own f2() (itself within f2_bound of truth)."""
        return (3.0 * self.f2() / self.w) ** 0.5

    def inner_product(self, other: "CountSketch") -> int:
        """UNBIASED join-size estimate Σ_v fA(v)·fB(v) as the median over
        rows of Σ_j A[row,j]·B[row,j] — two-sided, unlike the CMS
        inner_product's one-sided overestimate; |err| ≤ √(2·F2(A)·F2(B)/w)
        per row via Cauchy–Schwarz on the cross-collision terms."""
        self._check_compatible(other)
        dots = sorted(
            int((a.astype(object) * b.astype(object)).sum())
            for a, b in zip(self.counts, other.counts)
        )
        return dots[len(dots) // 2]

    def inner_product_bound(self, other: "CountSketch") -> float:
        return (2.0 * self.f2() * other.f2() / self.w) ** 0.5

    # -- merge -----------------------------------------------------------------------
    def merge(self, other: "CountSketch") -> "CountSketch":
        self._check_compatible(other)
        self.counts += other.counts
        self.total += other.total
        return self

    def is_empty(self) -> bool:
        return self.total == 0

    def clear(self) -> None:
        self.counts[:] = 0
        self.total = 0
