"""Theta (KMV — k minimum values) sketch: distinct counting with BOUNDED
set-operation estimates.

Closes the documented gap in `HllSketch.intersect_estimate` ("indication,
not a bounded estimate"): HLL intersection via inclusion–exclusion compounds
three absolute errors, while a theta sketch keeps a uniform hash SAMPLE of
the distinct items (the k smallest 64-bit hashes), so intersection /
union / difference are estimated directly on the retained samples with
relative error ≈ 1/√(k−1) on the union and ≈ 1/√|sample∩| on the
intersection (Dasgupta, Lang, Rhodes, Thaler — the Theta Sketch Framework;
Bar-Yossef et al. 2002 for KMV; Beyer et al. SIGMOD'07 for the unbiased
(k−1)/θ estimator).

State: sorted u64 array of the k smallest distinct item hashes below
θ (= k-th smallest seen, or 2^64 while fewer than k). Update folds a hashed
batch with `np.unique` + `np.partition` — fully vectorized. Merge = union
of retained sets, re-trim to k: associative and commutative, and the
retained SET is merge-order-independent (the k smallest of the union),
so serialized blobs are byte-equal across partitionings — same determinism
class as bloom/HLL/CMS.

Same murmur3_x64_128 funnel pipeline as every other sketch here; rides the
standard partial-build + tree-merge operators unchanged.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import (
    FUNNEL_PREHASHED,
    FUNNEL_UTF8,
    KIND_THETA,
    Sketch,
    element_to_hash,
    hash_column,
    prehashed_hashes,
    register_kind,
)

_FULL = float(1 << 64)


@register_kind
class ThetaSketch(Sketch):
    KIND = KIND_THETA

    def __init__(self, k: int = 4096, funnel: int = FUNNEL_UTF8):
        if k < 16:
            raise ValueError("k must be >= 16")
        super().__init__(funnel)
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted, < theta, distinct

    # -- contract ------------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (self.k,)

    def _params_bytes(self) -> bytes:
        return struct.pack("<I", self.k)

    def _payload_bytes(self) -> bytes:
        return self.hashes.tobytes()

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "ThetaSketch":
        (k,) = struct.unpack_from("<I", params, 0)
        sk = cls(k=k, funnel=funnel)
        sk.hashes = np.frombuffer(payload, dtype=np.uint64).copy()
        return sk

    # -- updates -------------------------------------------------------------
    def _theta_bound(self) -> int:
        """Exact inclusive sampling threshold as a python int in [0, 2^64].

        2^64 means "exact mode" (fewer than k retained, every hash kept).
        Saturated mode keeps exactly the hashes <= the k-th smallest seen, so
        the bound IS self.hashes[-1]. Kept as an exact integer: converting
        through float64 rounds hashes above 2^53 and a rounded-down bound
        silently drops the boundary hash during merge/intersect trims, which
        desaturates a saturated sketch (len < k) and collapses estimate() to
        ~k "exact" values. With the inclusive integer bound, a merge of a
        saturated sketch with anything retains >= k hashes (the side owning
        min-theta passes its full k through the filter), so len(hashes) < k
        remains a sound saturation test.
        """
        if len(self.hashes) < self.k:
            return 1 << 64
        return int(self.hashes[-1])

    @property
    def theta(self) -> float:
        """Sampling threshold as a fraction of the hash space (estimates only —
        never used to trim; see _theta_bound)."""
        return self._theta_bound() / _FULL

    def _fold(self, h: np.ndarray) -> None:
        merged = np.unique(np.concatenate([self.hashes, h]))
        if len(merged) > self.k:
            # k smallest keep the sample uniform below the new theta
            merged = np.partition(merged, self.k - 1)[: self.k]
            merged.sort()
        self.hashes = merged

    def update_hashes(self, h1: np.ndarray) -> None:
        self._fold(np.asarray(h1, dtype=np.uint64))

    def ingest_hashes(self, h1: np.ndarray, h2: np.ndarray) -> int:
        self.update_hashes(h1)
        return 0

    def update(self, values) -> None:
        if self.funnel == FUNNEL_PREHASHED:
            # values ARE the JVM-side xxhash64 hashes (grouped prehash path)
            self.update_hashes(prehashed_hashes(values))
            return
        _, h1, _ = hash_column(values, self.funnel)
        self.update_hashes(h1)

    def put(self, e) -> None:
        _, h1, _ = element_to_hash(e)
        self.update_hashes(np.array([h1], dtype=np.uint64))

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        # trim both sides to min(theta) first: retained sets stay uniform.
        # _trimmed_pair carries the exact integer bound — float rounding
        # here once dropped boundary hashes above 2^53 and desaturated
        # saturated sketches (ADVICE r1).
        a, b, _ = self._trimmed_pair(other)
        self.hashes = np.empty(0, dtype=np.uint64)
        self._fold(np.unique(np.concatenate([a, b])))
        return self

    def fold_to(self, k: int) -> "ThetaSketch":
        """EXACT fold to a smaller k: the k₂ smallest of the k₁ smallest
        distinct hashes ARE the k₂ smallest of the whole stream, so the
        folded sketch is byte-identical to one built directly at k₂ —
        tables of theta sketches built at different k can merge (fold the
        finer one first)."""
        if not 16 <= k <= self.k:
            raise ValueError(f"can only fold to 16 <= k <= {self.k}, got {k}")
        out = ThetaSketch(k, self.funnel)
        out.hashes = self.hashes[: min(len(self.hashes), k)].copy()
        return out

    # -- estimates ------------------------------------------------------------
    def estimate(self) -> float:
        n = len(self.hashes)
        if n < self.k:
            return float(n)  # exact below saturation (all distinct retained)
        return (self.k - 1) / self.theta  # unbiased KMV estimator

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    def relative_error_bound(self, nsigma: float = 3.0) -> float:
        return nsigma / math.sqrt(self.k - 1)

    def union_estimate(self, other: "ThetaSketch") -> float:
        return self.copy().merge(other).estimate()

    def _trimmed_pair(self, other: "ThetaSketch") -> tuple[np.ndarray, np.ndarray, float]:
        """Both retained sets trimmed to the exact min inclusive bound, plus
        the float theta to divide estimates by (float is safe ONLY as the
        final divisor — never as the trim comparator)."""
        self._check_compatible(other)
        t = min(self._theta_bound(), other._theta_bound())
        if t < (1 << 64):
            bound = np.uint64(t)
            a = self.hashes[self.hashes <= bound]
            b = other.hashes[other.hashes <= bound]
        else:
            a, b = self.hashes, other.hashes
        return a, b, t / _FULL

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        """|A ∩ B| = |retained(A) ∩ retained(B) below min θ| / min θ —
        a direct sample estimate, relative error ≈ 1/√(sample hits)."""
        a, b, t = self._trimmed_pair(other)
        hits = len(np.intersect1d(a, b, assume_unique=True))
        return hits / t

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """|A \\ B| on the retained samples below min θ."""
        a, b, t = self._trimmed_pair(other)
        return len(np.setdiff1d(a, b, assume_unique=True)) / t

    def is_empty(self) -> bool:
        return len(self.hashes) == 0

    def clear(self) -> None:
        self.hashes = np.empty(0, dtype=np.uint64)

    @property
    def size(self) -> int:
        return len(self.hashes)
