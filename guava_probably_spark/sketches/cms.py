"""Count-Min sketch — (ε, δ) frequency estimation, heavy hitters.

North-rule extension sketch (SURVEY.md §2.2; not in guava-probably).
Published algorithm: Cormode & Muthukrishnan 2005.

- geometry: width w = ⌈e/ε⌉, depth d = ⌈ln(1/δ)⌉
- row i bucket = ((h1 + i·h2) & 2⁶³−1) mod w   (Kirsch–Mitzenmacher double
  hashing from one murmur3_x64_128, valid per "Less Hashing, Same
  Performance")
- estimate(x) = min_i counts[i][bucket_i(x)] — one-sided: est ≥ true;
  est − true ≤ ε·N with probability ≥ 1−δ
- merge = elementwise + (associative & commutative; blobs byte-equal across
  merge orders since integer addition is exact)
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import (
    FUNNEL_PREHASHED,
    FUNNEL_UTF8,
    KIND_CMS,
    Sketch,
    element_to_hash,
    hash_column,
    prehashed_hashes,
    register_kind,
)

_SIGN_MASK = np.uint64(0x7FFFFFFFFFFFFFFF)

# FUNNEL_PREHASHED depth-hash derivation: the JVM ships ONE xxhash64 per
# value; the Kirsch–Mitzenmacher rows need a second independent hash, so
# h2 = fmix64(h1 ^ salt). Shared by the grouped build stage and the local
# sketch so blobs/probes land in identical buckets (byte-identity).
_PREHASH_H2_SALT = np.uint64(0x9E3779B97F4A7C15)


def prehash_pair(h1: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) for prehashed values — h1 passes through, h2 derived."""
    from .hashing import _fmix64

    h1 = np.asarray(h1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return h1, _fmix64(h1 ^ _PREHASH_H2_SALT)


def cms_geometry(epsilon: float, delta: float) -> tuple[int, int]:
    if not (0 < epsilon < 1 and 0 < delta < 1):
        raise ValueError("epsilon and delta must be in (0, 1)")
    w = int(math.ceil(math.e / epsilon))
    d = max(1, int(math.ceil(math.log(1.0 / delta))))
    return w, d


@register_kind
class CmsSketch(Sketch):
    KIND = KIND_CMS

    def __init__(self, epsilon: float = 1e-3, delta: float = 1e-2, funnel: int = FUNNEL_UTF8):
        super().__init__(funnel)
        self.epsilon = float(epsilon)
        self.delta = float(delta)
        self.w, self.d = cms_geometry(self.epsilon, self.delta)
        self.counts = np.zeros((self.d, self.w), dtype=np.int64)
        self.total = 0  # N = total weight inserted

    # -- serialization ---------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (round(self.epsilon, 15), round(self.delta, 15), self.w, self.d)

    def _params_bytes(self) -> bytes:
        return struct.pack("<ddqiq", self.epsilon, self.delta, self.w, self.d, self.total)

    def _payload_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "CmsSketch":
        eps, delta, w, d, total = struct.unpack("<ddqiq", params)
        sk = cls.__new__(cls)
        Sketch.__init__(sk, funnel)
        sk.epsilon, sk.delta, sk.w, sk.d, sk.total = eps, delta, w, d, total
        sk.counts = np.frombuffer(payload, dtype=np.int64).reshape(d, w).copy()
        return sk

    # -- updates ----------------------------------------------------------------
    def _buckets(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(d, n) bucket indexes."""
        with np.errstate(over="ignore"):
            i = np.arange(self.d, dtype=np.uint64)[:, None]
            combined = h1[None, :] + i * h2[None, :]
            return ((combined & _SIGN_MASK) % np.uint64(self.w)).astype(np.int64)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray, weights=None) -> None:
        b = self._buckets(h1, h2)
        if weights is None:
            for i in range(self.d):
                np.add.at(self.counts[i], b[i], 1)
            self.total += len(h1)
        else:
            w = np.asarray(weights, dtype=np.int64)
            for i in range(self.d):
                np.add.at(self.counts[i], b[i], w)
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

    def fold_to(self, m: int) -> "CmsSketch":
        """EXACT fold to an ``m``× coarser width (``m`` must divide w):
        bucket₂ = bucket % w₂ when w = m·w₂ — ((h) & SIGN) % w determines
        ((h) & SIGN) % w₂ exactly, so the fold is a pure reshape-sum on the
        counter matrix and commutes BYTE-FOR-BYTE with both ``update`` and
        ``merge`` (counts are linear; no history dependence, no collapse
        caveat). The folded sketch is a bona-fide CMS at ε₂ = e/w₂ (its
        exact geometry bound) with the same d/δ — mixed-ε CMS tables merge
        via SQL ``sketch_fold(sketch, m)`` like the HLL/theta/DD folds; as
        with DD, the parameter is the integer DIVISOR m, not the target ε.
        Size widths as powers of two (ε = e/2^k·(1+1e-9)) to keep every
        power-of-two fold reachable."""
        if not (isinstance(m, (int, np.integer)) and m >= 1):
            raise ValueError(f"fold divisor must be an integer >= 1, got {m}")
        if m == 1:
            return self.copy()
        if self.w % m:
            raise ValueError(f"fold divisor {m} must divide w={self.w}")
        w2 = self.w // int(m)
        out = CmsSketch.__new__(CmsSketch)
        Sketch.__init__(out, self.funnel)
        out.epsilon = math.e / w2  # the exact bound of the folded geometry
        out.delta = self.delta
        out.w, out.d = w2, self.d
        out.counts = self.counts.reshape(self.d, int(m), w2).sum(axis=1)
        out.total = self.total
        return out

    # -- queries ------------------------------------------------------------------
    def estimate_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        b = self._buckets(h1, h2)
        ests = np.empty((self.d, len(h1)), dtype=np.int64)
        for i in range(self.d):
            ests[i] = self.counts[i][b[i]]
        return ests.min(axis=0)

    def estimate(self, values) -> np.ndarray:
        """Vectorized point-frequency query for a batch of items. For a
        FUNNEL_PREHASHED sketch, ``values`` are the xxhash64 hashes of the
        items (probe with ``F.xxhash64(item)`` computed JVM-side)."""
        if self.funnel == FUNNEL_PREHASHED:
            h1, h2 = prehash_pair(prehashed_hashes(values))
            return self.estimate_hashes(h1, h2)
        _, h1, h2 = hash_column(values, self.funnel)
        return self.estimate_hashes(h1, h2)

    def freq(self, e) -> int:
        _, h1, h2 = element_to_hash(e)
        return int(self.estimate_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0])

    def error_bound(self) -> float:
        """Additive error ε·N holding with probability ≥ 1−δ."""
        return self.epsilon * self.total

    def heavy_hitters(self, candidates, phi: float) -> list:
        """Items from `candidates` with estimated freq ≥ φ·N (no false
        negatives among candidates; may include false positives ≤ (φ+ε)N).
        Null candidates are skipped BEFORE estimation — estimate() drops
        nulls internally, so zipping the raw candidate list against its
        output would misalign every candidate after the first null."""
        cand = [c for c in candidates if c is not None]
        if not cand:
            return []
        ests = self.estimate(cand)
        thresh = phi * self.total
        return [c for c, est in zip(cand, ests) if est >= thresh]

    def inner_product(self, other: "CmsSketch") -> int:
        """Join-size estimate Σ_v fA(v)·fB(v) = min over rows of the row dot
        products (Cormode & Muthukrishnan 2005 §4.2): one-sided overestimate,
        est − true ≤ ε·N_A·N_B with probability ≥ 1−δ. The sketch-level
        answer to "how big is this join?" — no shuffle, no scan of either
        side, just two CMS blobs."""
        self._check_compatible(other)
        return int(np.einsum("ij,ij->i", self.counts, other.counts).min())

    def inner_product_bound(self, other: "CmsSketch") -> float:
        """The ε·N_A·N_B additive bound for inner_product (holds w.p. ≥ 1−δ)."""
        return self.epsilon * self.total * other.total

    # -- merge -----------------------------------------------------------------------
    def merge(self, other: "CmsSketch") -> "CmsSketch":
        self._check_compatible(other)
        self.counts += other.counts
        self.total += other.total
        return self

    def is_empty(self) -> bool:
        return self.total == 0

    def clear(self) -> None:
        self.counts[:] = 0
        self.total = 0
