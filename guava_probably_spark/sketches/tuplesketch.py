"""Tuple sketch — theta/KMV with per-distinct-key INTEGER summaries.

North-rule extension sketch (SURVEY.md §2.2; not in guava-probably).
Published design: the Theta Sketch Framework's "tuple sketch" extension
(Dasgupta, Lang, Rhodes, Thaler) — a KMV distinct-key sample where each
retained key carries an aggregate of its values; estimator analysis per
Cohen & Kaplan 2007 ("Summarizing data using bottom-k sketches") and the
Horvitz–Thompson inverse-probability estimator.

What it answers that nothing else here does: **aggregates over DISTINCT
keys** from one KB blob, no distinct() shuffle —

- "total turns across distinct conversations in this slice" when the
  input double-counts conversations (sum of per-key totals, not of rows),
- per-distinct-key mean (``sum_estimate / estimate``),
- all of theta's distinct-count algebra on the same retained set.

State: the k smallest distinct key hashes (sorted u64, exactly theta.py's
canonical retained set) plus an ALIGNED int64 array of each retained
key's exact value sum. The eviction argument that makes the sums exact:
θ only ever shrinks, so a key retained at the end (hash ≤ final θ bound)
was below θ at every moment of the build — every one of its updates
landed in its slot; across a distributed merge, final θ ≤ every
partial's θ, so a finally-retained key was retained in every partial it
touched, and integer addition reassembles its full sum exactly. Keys
that WERE evicted contribute nothing (not partial garbage). Hence:

- merge = hash-union + per-hash value sum + trim to k smallest — blobs
  byte-equal across merge orders AND equal to the whole single-stream
  build (the HLL/CMS determinism class; integer sums have no add-order).
- estimate() — distinct keys, exactly theta's (k−1)/θ (exact below
  saturation).
- sum_estimate() — Horvitz–Thompson: Σ_retained value / θ. Exact below
  saturation (θ=1: every distinct key retained with its full sum).
- sum_error_estimate(nsigma) — nσ·√((1−θ)/θ² · Σ_retained value²), the
  plug-in standard error of the HT sum under the bottom-k ≈ Bernoulli(θ)
  sampling approximation (Cohen & Kaplan 2007) — value-skew-aware: a
  heavy-tailed value distribution honestly widens the reported bound.
- fold_to(k₂) — byte-identical to a direct build at k₂ (the k₂ smallest
  of the k smallest are the k₂ smallest of the stream, and their sums
  were exact all along).

64-bit hash collisions fuse two keys' sums into one retained entry —
the same ~n²/2⁶⁵ birthday term every KMV estimate already carries, and
deterministic (every path fuses identically), so the byte-equality
contracts are unaffected.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import (
    FUNNEL_PREHASHED,
    FUNNEL_UTF8,
    KIND_TUPLE,
    Sketch,
    element_to_hash,
    hash_column,
    prehashed_hashes,
    register_kind,
)

_FULL = float(1 << 64)


@register_kind
class TupleSketch(Sketch):
    KIND = KIND_TUPLE

    def __init__(self, k: int = 4096, funnel: int = FUNNEL_UTF8):
        if k < 16:
            raise ValueError("k must be >= 16")
        super().__init__(funnel)
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted, <= theta bound, distinct
        self.values = np.empty(0, dtype=np.int64)  # exact per-key sums, aligned

    # -- contract ------------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (self.k,)

    def _params_bytes(self) -> bytes:
        return struct.pack("<I", self.k)

    def _payload_bytes(self) -> bytes:
        return self.hashes.tobytes() + self.values.tobytes()

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "TupleSketch":
        (k,) = struct.unpack_from("<I", params, 0)
        if len(payload) % 16:
            raise ValueError("tuple sketch payload must be 16 bytes per entry")
        half = len(payload) // 2
        sk = cls(k=k, funnel=funnel)
        sk.hashes = np.frombuffer(payload[:half], dtype=np.uint64).copy()
        sk.values = np.frombuffer(payload[half:], dtype=np.int64).copy()
        return sk

    # -- updates -------------------------------------------------------------
    def _theta_bound(self) -> int:
        """Exact inclusive sampling threshold (theta.py:_theta_bound — same
        integer-exactness reasoning; float rounding above 2^53 would drop
        boundary entries and silently corrupt retained sums)."""
        if len(self.hashes) < self.k:
            return 1 << 64
        return int(self.hashes[-1])

    @property
    def theta(self) -> float:
        return self._theta_bound() / _FULL

    def _fold(self, h: np.ndarray, v: np.ndarray) -> None:
        """Union (hash, sum) entries into the retained state: per-hash
        integer sum, then trim to the k smallest hashes."""
        allh = np.concatenate([self.hashes, h])
        allv = np.concatenate([self.values, v])
        uh, inv = np.unique(allh, return_inverse=True)
        uv = np.zeros(len(uh), dtype=np.int64)
        np.add.at(uv, inv, allv)
        if len(uh) > self.k:
            # np.unique returns sorted hashes, so the k smallest (the
            # uniform sample below the new theta) are the prefix; their
            # sums ride along untouched
            uh, uv = uh[: self.k], uv[: self.k]
        self.hashes, self.values = uh, uv

    def update_hashes(self, h1: np.ndarray, weights=None) -> None:
        h1 = np.asarray(h1, dtype=np.uint64)
        if weights is None:
            w = np.ones(len(h1), dtype=np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
            if len(w) != len(h1):
                raise ValueError("weights length must match keys length")
        # pre-aggregate the batch per distinct hash before folding
        uh, inv = np.unique(h1, return_inverse=True)
        uv = np.zeros(len(uh), dtype=np.int64)
        np.add.at(uv, inv, w)
        self._fold(uh, uv)

    def ingest_hashes(self, h1: np.ndarray, h2: np.ndarray) -> int:
        self.update_hashes(h1)
        return 0

    def update(self, values, weights=None) -> None:
        """Keys + optional int64 per-row values. With ``weights=None`` each
        row contributes 1, so ``sum_estimate()`` estimates total ROW count
        over distinct keys — i.e. the corpus row count, exactly, below
        saturation — and the per-key sums are multiplicities."""
        if self.funnel == FUNNEL_PREHASHED:
            h = prehashed_hashes(values)
            if weights is not None and len(h) != len(weights):
                raise ValueError(
                    "weights must align with non-null keys "
                    f"({len(h)} hashed vs {len(weights)} weights)"
                )
            self.update_hashes(h, weights)
            return
        _, h1, _ = hash_column(values, self.funnel)
        if weights is not None and len(h1) != len(weights):
            # hash_column drops nulls; aligning weights past nulls is the
            # caller's contract (the Spark builder filters nulls first)
            raise ValueError(
                "weights must align with non-null keys "
                f"({len(h1)} hashed vs {len(weights)} weights)"
            )
        self.update_hashes(h1, weights)

    def put(self, e, weight: int = 1) -> None:
        _, h1, _ = element_to_hash(e)
        self.update_hashes(np.array([h1], dtype=np.uint64), np.array([weight]))

    def merge(self, other: "TupleSketch") -> "TupleSketch":
        self._check_compatible(other)
        t = min(self._theta_bound(), other._theta_bound())
        if t < (1 << 64):
            bound = np.uint64(t)
            am = self.hashes <= bound
            bm = other.hashes <= bound
            sh, sv = self.hashes[am], self.values[am]
            oh, ov = other.hashes[bm], other.values[bm]
        else:
            sh, sv = self.hashes, self.values
            oh, ov = other.hashes, other.values
        self.hashes = np.empty(0, dtype=np.uint64)
        self.values = np.empty(0, dtype=np.int64)
        self._fold(np.concatenate([sh, oh]), np.concatenate([sv, ov]))
        return self

    def fold_to(self, k: int) -> "TupleSketch":
        """EXACT fold to a smaller k — byte-identical to a direct build at
        k (theta.py:fold_to argument, sums exact all along)."""
        if not 16 <= k <= self.k:
            raise ValueError(f"can only fold to 16 <= k <= {self.k}, got {k}")
        out = TupleSketch(k, self.funnel)
        n = min(len(self.hashes), k)
        out.hashes = self.hashes[:n].copy()
        out.values = self.values[:n].copy()
        return out

    # -- estimates ------------------------------------------------------------
    def estimate(self) -> float:
        """Distinct keys — exactly theta's estimator on the same sample."""
        n = len(self.hashes)
        if n < self.k:
            return float(n)
        return (self.k - 1) / self.theta

    def relative_error_bound(self, nsigma: float = 3.0) -> float:
        return nsigma / math.sqrt(self.k - 1)

    def sum_estimate(self) -> float:
        """Horvitz–Thompson Σ over distinct keys of the key's value sum:
        each retained key is in the sample w.p. θ, so Σ_retained / θ is
        unbiased. EXACT below saturation (θ = 1)."""
        if len(self.hashes) < self.k:
            return float(int(self.values.sum(dtype=object)) if len(self.values) else 0)
        return float(int(self.values.sum(dtype=object))) / self.theta

    def sum_error_estimate(self, nsigma: float = 3.0) -> float:
        """nσ plug-in standard error of sum_estimate under the
        Bernoulli(θ) approximation of bottom-k sampling (Cohen & Kaplan
        2007): Var ≈ (1−θ)/θ² · Σ_retained v². Zero below saturation."""
        if len(self.hashes) < self.k:
            return 0.0
        t = self.theta
        s2 = float(sum(int(v) * int(v) for v in self.values))
        return nsigma * math.sqrt(max(0.0, (1.0 - t)) / (t * t) * s2)

    def mean_estimate(self) -> float:
        """Mean value sum per distinct key (ratio estimator)."""
        d = self.estimate()
        return self.sum_estimate() / d if d else 0.0

    def is_empty(self) -> bool:
        return len(self.hashes) == 0

    def clear(self) -> None:
        self.hashes = np.empty(0, dtype=np.uint64)
        self.values = np.empty(0, dtype=np.int64)

    @property
    def size(self) -> int:
        return len(self.hashes)
