"""KLL quantile sketch — mergeable rank/quantile estimation.

North-rule extension sketch (SURVEY.md §2.2; not in guava-probably).
Published algorithm: Karnin, Lang, Liberty, "Optimal Quantile Approximation
in Streams", FOCS 2016 (the practical c=2/3 variant, as popularized by
Apache DataSketches' public documentation of the algorithm).

- compactor levels; level h holds items of weight 2^h; level capacity
  cap(h) = max(2, ⌈k·c^(depth−1−h)⌉) with c = 2/3
- compaction: sort the overfull level, keep every other item (random even/
  odd offset), promote to level h+1 — unbiased rank estimates
- merge: levelwise concatenation, then compact back under budget
- normalized rank error ≈ O(1/k); observed σ·k ≈ 1.33 (empirically
  validated in tests against exact ranks; bound used = 3σ)
"""

from __future__ import annotations

import struct

import numpy as np

from .base import FUNNEL_NONE, KIND_KLL, Sketch, register_kind

_C = 2.0 / 3.0


def _to_float_array(values) -> np.ndarray:
    try:
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            values = values.drop_null().cast(pa.float64()).to_numpy(zero_copy_only=False)
    except ImportError:
        pass
    v = np.asarray(values, dtype=np.float64).ravel()
    return v[~np.isnan(v)]


def _to_float_aligned(values) -> np.ndarray:
    """Like :func:`_to_float_array` but POSITION-PRESERVING (nulls → NaN,
    nothing dropped) so a parallel weights array stays aligned."""
    try:
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            values = values.cast(pa.float64()).to_numpy(zero_copy_only=False)
    except ImportError:
        pass
    return np.asarray(values, dtype=np.float64).ravel()


@register_kind
class KllSketch(Sketch):
    KIND = KIND_KLL

    def __init__(self, k: int = 200):
        super().__init__(FUNNEL_NONE)
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(0x5EED)

    # ----------------------------------------------------------- compaction
    def _cap(self, h: int) -> int:
        depth = len(self.levels)
        return max(2, int(np.ceil(self.k * _C ** (depth - 1 - h))))

    def _total(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _budget(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _compact(self) -> None:
        while self._total() > self._budget():
            for h in range(len(self.levels)):
                if len(self.levels[h]) >= self._cap(h):
                    lv = np.sort(self.levels[h])
                    off = int(self._rng.integers(2))
                    promoted = lv[off::2]
                    self.levels[h] = np.empty(0, dtype=np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
                    break
            else:
                break  # nothing compactable (all levels below cap)

    # -------------------------------------------------------------- updates
    def update(self, values, weights=None) -> None:
        """Values in; optional positive integer weights — a weight-w value
        is w copies of the weighted CDF.  Weighted inserts binary-decompose
        each weight into the compactor levels (bit b of w → one copy at
        level b, weight 2^b), exactly the mechanism levelwise ``merge``
        already uses, so rank error vs the WEIGHTED distribution carries
        the same O(1/k) behavior (validated empirically in tests).
        Fractional weights are rounded; weights < 1 after rounding (and
        NaN) drop the value, like the weighted samplers."""
        if weights is not None:
            v = _to_float_aligned(values)
            w = np.rint(np.asarray(weights, dtype=np.float64))
            if len(w) != len(v):
                raise ValueError(
                    f"weights must align with values ({len(v)} vs {len(w)})"
                )
            ok = np.isfinite(v) & np.isfinite(w) & (w >= 1)
            v, w = v[ok], w[ok].astype(np.int64)
            if len(v) == 0:
                return
            self.n += int(w.sum())
            top = int(w.max()).bit_length()
            for b in range(top):
                sel = (w >> b) & 1 == 1
                if not sel.any():
                    continue
                while len(self.levels) <= b:
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[b] = np.concatenate([self.levels[b], v[sel]])
                self._compact()
            return
        v = _to_float_array(values)
        if len(v) == 0:
            return
        # feed in chunks so level-0 never balloons past the budget
        chunk = max(self.k, 1024)
        for s in range(0, len(v), chunk):
            self.levels[0] = np.concatenate([self.levels[0], v[s : s + chunk]])
            self.n += len(v[s : s + chunk])
            self._compact()

    def put(self, x: float) -> None:
        self.update(np.array([x], dtype=np.float64))

    # --------------------------------------------------------------- merge
    def merge(self, other: "KllSketch") -> "KllSketch":
        self._check_compatible(other)
        depth = max(len(self.levels), len(other.levels))
        while len(self.levels) < depth:
            self.levels.append(np.empty(0, dtype=np.float64))
        for h in range(len(other.levels)):
            if len(other.levels[h]):
                self.levels[h] = np.concatenate([self.levels[h], other.levels[h]])
        self.n += other.n
        self._compact()
        return self

    def fold_to(self, k: int) -> "KllSketch":
        """Fold to a coarser k₂ ≤ k: the weighted item multiset transfers
        level-for-level (level h keeps weight 2^h) into a fresh k₂ sketch,
        which then compacts under the smaller budget.  Every estimate of
        the folded sketch carries the k₂ sketch's published rank bound —
        enabling mixed-k sketch-table merges (fold the finer blobs first,
        then merge), the same workflow as ``HllSketch.fold_to`` /
        ``ThetaSketch.fold_to`` and the SQL ``sketch_fold``.  Unlike those
        two this is NOT byte-identical to a direct k₂ build: KLL
        compaction is randomized and history-dependent; the guarantee is
        the bound, not the bytes."""
        if not 8 <= k <= self.k:
            raise ValueError(f"can only fold to 8 <= k <= {self.k}, got {k}")
        out = KllSketch(k)
        out.levels = [lv.copy() for lv in self.levels]
        out.n = self.n
        out._compact()
        return out

    # -------------------------------------------------------------- queries
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items = []
        weights = []
        for h, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), float(1 << h)))
        if not items:
            return np.empty(0), np.empty(0)
        x = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(x, kind="stable")
        return x[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at normalized rank(s) q ∈ [0, 1]."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        x, w = self._weighted_items()
        if len(x) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w)
        targets = np.clip(qs, 0, 1) * cum[-1]
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.clip(idx, 0, len(x) - 1)
        out = x[idx]
        return float(out[0]) if scalar else out

    def rank(self, values) -> np.ndarray | float:
        """Normalized rank estimate(s): fraction of mass strictly below x.
        Scalar in → float out (mirroring quantile()); array in → ndarray."""
        scalar = np.isscalar(values)
        x, w = self._weighted_items()
        v = np.atleast_1d(np.asarray(values, dtype=np.float64))
        if len(x) == 0:
            out = np.zeros(len(v))
            return float(out[0]) if scalar else out
        cum = np.concatenate([[0.0], np.cumsum(w)])
        pos = np.searchsorted(x, v, side="left")
        out = cum[pos] / cum[-1]
        return float(out[0]) if scalar else out

    def rank_error_bound(self, nsigma: float = 3.0) -> float:
        """Normalized rank error bound (≈ nsigma·1.33/k, empirically
        validated in tests/test_kll.py)."""
        return nsigma * 1.33 / self.k

    def is_empty(self) -> bool:
        return self.n == 0

    @property
    def size(self) -> int:
        return self.n

    # --------------------------------------------------------- serialization
    def _params_tuple(self) -> tuple:
        return (self.k,)

    def _params_bytes(self) -> bytes:
        return struct.pack("<iq", self.k, self.n)

    def _payload_bytes(self) -> bytes:
        parts = [struct.pack("<i", len(self.levels))]
        for lv in self.levels:
            parts.append(struct.pack("<q", len(lv)))
        for lv in self.levels:
            parts.append(np.ascontiguousarray(lv, dtype="<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "KllSketch":
        k, n = struct.unpack("<iq", params)
        sk = cls.__new__(cls)
        Sketch.__init__(sk, FUNNEL_NONE)
        sk.k = k
        sk.n = n
        sk._rng = np.random.default_rng(0x5EED)
        (nlev,) = struct.unpack_from("<i", payload, 0)
        if nlev < 0:
            raise ValueError("corrupt KLL blob: negative level count")
        lens = struct.unpack_from(f"<{nlev}q", payload, 4)
        off = 4 + 8 * nlev
        sk.levels = []
        for ln in lens:
            # np.frombuffer(count=-1) silently reads ALL remaining bytes —
            # a corrupt negative length must raise (the checkpoint heal
            # path keys on ValueError-at-decode), not return garbage levels
            if ln < 0 or off + 8 * ln > len(payload):
                raise ValueError("corrupt KLL blob: bad level length")
            sk.levels.append(np.frombuffer(payload, dtype="<f8", count=ln, offset=off).copy())
            off += 8 * ln
        if not sk.levels:
            sk.levels = [np.empty(0, dtype=np.float64)]
        return sk
