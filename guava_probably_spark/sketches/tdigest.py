"""t-digest — mergeable quantile sketch, tail-accurate.

North-rule extension sketch (SURVEY.md §2.2; not in guava-probably).
Published algorithm: Dunning & Ertl, "Computing Extremely Accurate Quantiles
Using t-Digests", 2019 (the merging-digest variant with the k1 scale
function).

- scale function K(q) = δ·(1/2 + asin(2q−1)/π), monotone on [0,1] with
  derivative → ∞ at q→{0,1} ⇒ centroids near the tails hold few points
  (tail accuracy), ≤ δ+1 centroids total
- compression: sort (centroids + buffered points) by mean, compute mid-point
  quantiles, group runs sharing ⌊K(q)⌋ — fully vectorized (no sequential
  merge pass), the clustering the merging digest converges to
- merge: concatenate centroid lists, recompress; rank error O(1/δ) at mid
  quantiles, far tighter at tails (empirically validated in tests)
"""

from __future__ import annotations

import struct

import numpy as np

from .base import FUNNEL_NONE, KIND_TDIGEST, Sketch, register_kind
from .kll import _to_float_array

_BUFFER_LIMIT = 65536


@register_kind
class TDigestSketch(Sketch):
    KIND = KIND_TDIGEST

    def __init__(self, delta: float = 200.0):
        super().__init__(FUNNEL_NONE)
        if delta < 10:
            raise ValueError("compression delta must be >= 10")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._bufw: list[np.ndarray] = []
        self._buf_n = 0
        self._compressed = True  # means/weights are in canonical k1 form
        self.n = 0
        self.vmin = np.inf
        self.vmax = -np.inf

    # ---------------------------------------------------------- compression
    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta * (0.5 + np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0) / np.pi)

    def _compress(self) -> None:
        # read paths (quantile/rank/to_bytes/__eq__) call this on every
        # query; without the flag each call re-paid a full argsort+regroup
        # of all centroids even with an empty buffer
        if self._compressed and not self._buf:
            return
        if self._buf:
            bx = np.concatenate(self._buf)
            bw = np.concatenate(self._bufw)
            x = np.concatenate([self.means, bx])
            w = np.concatenate([self.weights, bw])
            self._buf = []
            self._bufw = []
            self._buf_n = 0
        else:
            x, w = self.means, self.weights
        if len(x) == 0:
            return
        order = np.argsort(x, kind="stable")
        x, w = x[order], w[order]
        total = w.sum()
        qmid = (np.cumsum(w) - 0.5 * w) / total
        kidx = np.floor(self._k(qmid)).astype(np.int64)
        new_group = np.empty(len(kidx), dtype=bool)
        new_group[0] = True
        np.not_equal(kidx[1:], kidx[:-1], out=new_group[1:])
        gid = np.cumsum(new_group) - 1
        ngroups = int(gid[-1]) + 1
        gw = np.bincount(gid, weights=w, minlength=ngroups)
        gm = np.bincount(gid, weights=w * x, minlength=ngroups) / gw
        self.means = gm
        self.weights = gw
        self._compressed = True

    # -------------------------------------------------------------- updates
    def update(self, values, weights=None) -> None:
        """Values in; optional per-value weights (a weight-w value is
        exactly w copies in the weighted CDF — quantile/rank/cdf then
        answer over the WEIGHTED distribution, e.g. token-weighted doc
        lengths). NaN / negative / zero weights drop the value, the same
        guard as the weighted samplers."""
        if weights is None:
            v = _to_float_array(values)
            w = np.ones(len(v), dtype=np.float64)
        else:
            # position-preserving conversion: a NaN/null VALUE must not
            # shift the weight alignment (the unweighted path's NaN drop
            # happens jointly below)
            from .kll import _to_float_aligned

            v = _to_float_aligned(values)
            w = np.asarray(weights, dtype=np.float64)
            if len(w) != len(v):
                raise ValueError(
                    f"weights must align with values ({len(v)} vs {len(w)})"
                )
            ok = np.isfinite(v) & np.isfinite(w) & (w > 0)
            if not ok.all():
                v, w = v[ok], w[ok]
        if len(v) == 0:
            return
        self.n += len(v)
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._buf.append(v)
        self._bufw.append(w)
        self._buf_n += len(v)
        self._compressed = False
        if self._buf_n >= _BUFFER_LIMIT:
            self._compress()

    def put(self, x: float) -> None:
        self.update(np.array([x], dtype=np.float64))

    # --------------------------------------------------------------- merge
    def merge(self, other: "TDigestSketch") -> "TDigestSketch":
        """Merge other into self WITHOUT mutating other (a broadcast/shared
        digest must not have its buffer flushed as a merge side effect):
        other's buffered raw values fold in with their buffered weights."""
        self._check_compatible(other)
        self._compress()
        obuf = (
            [np.concatenate(other._buf)] if other._buf else []
        )
        obufw = (
            [np.concatenate(other._bufw)] if other._buf else []
        )
        self.means = np.concatenate([self.means, other.means] + obuf)
        self.weights = np.concatenate(
            [self.weights, other.weights] + obufw
        )
        self._compressed = False
        self.n += other.n
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress()
        return self

    def fold_to(self, delta: float) -> "TDigestSketch":
        """Fold to a coarser compression δ₂ ≤ δ: centroids re-compress
        under the smaller k1 budget in a fresh δ₂ digest.  The folded
        digest carries the δ₂ rank bound (centroid-merging is exactly how
        a native δ₂ digest absorbs the same mass) — enabling mixed-δ
        sketch-table merges via the SQL ``sketch_fold``, like the HLL /
        theta / KLL folds.  Not byte-identical to a direct δ₂ build
        (centroid boundaries are history-dependent); the guarantee is the
        bound, not the bytes."""
        if not 10 <= delta <= self.delta:
            raise ValueError(f"can only fold to 10 <= delta <= {self.delta}, got {delta}")
        self._compress()  # read-path canonicalization (no logical mutation)
        out = TDigestSketch(float(delta))
        out.means = self.means.copy()
        out.weights = self.weights.copy()
        out.n = self.n
        out.vmin, out.vmax = self.vmin, self.vmax
        out._compressed = False
        out._compress()
        return out

    # -------------------------------------------------------------- queries
    def quantile(self, q) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        self._compress()
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        w = self.weights
        total = w.sum()
        pos = np.cumsum(w) - 0.5 * w  # centroid center ranks
        targets = np.clip(qs, 0.0, 1.0) * total
        xp = np.concatenate([[0.0], pos, [total]])
        fp = np.concatenate([[self.vmin], self.means, [self.vmax]])
        out = np.interp(targets, xp, fp)
        return float(out[0]) if scalar else out

    def rank(self, values) -> np.ndarray:
        """Normalized rank estimate via centroid interpolation."""
        self._compress()
        v = np.atleast_1d(np.asarray(values, dtype=np.float64))
        if len(self.means) == 0:
            return np.zeros(len(v))
        w = self.weights
        total = w.sum()
        pos = np.cumsum(w) - 0.5 * w
        xp = np.concatenate([[self.vmin], self.means, [self.vmax]])
        fp = np.concatenate([[0.0], pos, [total]])
        xp, uniq_idx = np.unique(xp, return_index=True)
        fp = fp[uniq_idx]
        return np.interp(v, xp, fp) / total

    def rank_error_bound(self, nsigma: float = 3.0) -> float:
        """Mid-quantile normalized rank error ≈ nsigma·1.0/δ (empirically
        validated; tails are much tighter by the k1 scale function)."""
        return nsigma * 1.0 / self.delta

    def centroid_count(self) -> int:
        self._compress()
        return len(self.means)

    def is_empty(self) -> bool:
        return self.n == 0

    @property
    def size(self) -> int:
        return self.n

    # --------------------------------------------------------- serialization
    def _params_tuple(self) -> tuple:
        return (round(self.delta, 9),)

    def _params_bytes(self) -> bytes:
        return struct.pack("<d", self.delta)

    def _payload_bytes(self) -> bytes:
        self._compress()
        head = struct.pack("<qddq", self.n, self.vmin, self.vmax, len(self.means))
        return (
            head
            + np.ascontiguousarray(self.means, dtype="<f8").tobytes()
            + np.ascontiguousarray(self.weights, dtype="<f8").tobytes()
        )

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "TDigestSketch":
        (delta,) = struct.unpack("<d", params)
        sk = cls.__new__(cls)
        Sketch.__init__(sk, FUNNEL_NONE)
        sk.delta = delta
        sk._buf = []
        sk._bufw = []
        sk._buf_n = 0
        sk._compressed = True  # blobs serialize the canonical form
        sk.n, sk.vmin, sk.vmax, nc = struct.unpack_from("<qddq", payload, 0)
        off = struct.calcsize("<qddq")
        sk.means = np.frombuffer(payload, dtype="<f8", count=nc, offset=off).copy()
        sk.weights = np.frombuffer(
            payload, dtype="<f8", count=nc, offset=off + 8 * nc
        ).copy()
        return sk
