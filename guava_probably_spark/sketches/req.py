"""REQ quantile sketch — mergeable rank estimation with RELATIVE rank
error (tight where it matters: the extreme quantiles).

North-rule extension sketch (SURVEY.md §2.2; not in guava-probably).
Published algorithm: Cormode, Karnin, Liberty, Thaler, Veselý,
"Relative Error Streaming Quantiles", PODS 2021 (the practical
relative-compactor schedule popularized by Apache DataSketches' public
documentation of its ReqSketch).

Guarantee class: KLL's rank error is UNIFORM (ε·n everywhere), so at
p99.999 of 10^12 turns the ±ε·n band swallows the entire tail. The REQ
high-rank-accuracy (HRA) variant guarantees
``|R̂(x) − R(x)| ≤ ε·(n − R(x))`` w.h.p. — error proportional to the
distance from the TOP, so the extreme upper quantiles stay sharp at any
n. (DDSketch gives VALUE-relative error instead; the three classes are
complementary and all three ship here.)

Structure: levels of relative compactors; level h items carry weight
2^h. Each compactor keeps ``num_sections × section_size`` items
protected on the accurate end and, when full, compacts a
schedule-chosen number of sections from the other end (every other item
of the sorted slice promotes to level h+1 — unbiased). After
2^(num_sections−1) compactions a compactor halves its section size and
doubles its section count (min section size 4), matching the paper's
growth schedule.

Like KLL (and unlike HLL/theta/DD), compaction is randomized and
history-dependent: merge-order changes bytes but every estimate stays
within the published bound — the "within-bound" determinism class in
``merge_associativity``.

Error constant: validated empirically in tests/test_req.py (max
observed relative rank error × k across seeds/distributions), the same
calibration discipline as KllSketch's 1.33/k.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import FUNNEL_NONE, KIND_REQ, Sketch, register_kind

_MIN_SECTION = 4
_INIT_SECTIONS = 3


class _Compactor:
    __slots__ = ("buf", "section_size", "num_sections", "compactions")

    def __init__(self, section_size: int, num_sections: int = _INIT_SECTIONS):
        self.buf = np.empty(0, dtype=np.float64)
        self.section_size = int(section_size)
        self.num_sections = int(num_sections)
        self.compactions = 0

    def capacity(self) -> int:
        return 2 * self.num_sections * self.section_size


@register_kind
class ReqSketch(Sketch):
    """HRA relative-error quantile sketch over float64 values."""

    KIND = KIND_REQ

    def __init__(self, k: int = 32, hra: bool = True):
        super().__init__(FUNNEL_NONE)
        if k < _MIN_SECTION or k % 2:
            raise ValueError("k must be an even integer >= 4")
        self.k = int(k)
        self.hra = bool(hra)
        self.compactors: list[_Compactor] = [_Compactor(self.k)]
        self.n = 0
        self._rng = np.random.default_rng(0x5EED)

    # ----------------------------------------------------------- compaction
    def _grow_schedule(self, c: _Compactor) -> None:
        # paper / DataSketches growth: after 2^(num_sections - 1)
        # compactions, halve the section size (>= _MIN_SECTION) and double
        # the section count — protection granularity refines as the level
        # sees more mass
        if c.compactions >= (1 << (c.num_sections - 1)) and c.section_size > _MIN_SECTION:
            c.section_size = max(_MIN_SECTION, c.section_size // 2)
            c.num_sections *= 2

    def _compact_level(self, h: int) -> None:
        c = self.compactors[h]
        self._grow_schedule(c)
        c.buf.sort()
        if not self.hra:
            # LRA mirrors HRA by compacting from the top instead; flip the
            # buffer so one code path serves both, flip back at the end
            c.buf = c.buf[::-1].copy()
        # sections to compact: trailing-ones schedule over the compaction
        # counter, always leaving at least one protected section
        t = 0
        x = c.compactions
        while x & 1:
            t += 1
            x >>= 1
        secs = min(t + 1, c.num_sections - 1) if c.num_sections > 1 else 1
        protected = (c.num_sections - secs) * c.section_size
        # HRA protects the TOP `protected` items (ascending sort => suffix);
        # everything below them (including overflow) is the compact slice
        L = len(c.buf) - protected
        if L < 2:
            L = 2
        L -= L & 1  # even length so promoted pairs are unbiased
        if L <= 0 or L > len(c.buf):
            return
        slc = c.buf[:L]
        off = int(self._rng.integers(2))
        promoted = slc[off::2]
        c.buf = c.buf[L:]
        if not self.hra:
            c.buf = c.buf[::-1].copy()
        c.compactions += 1
        if h + 1 == len(self.compactors):
            self.compactors.append(
                _Compactor(c.section_size, c.num_sections)
            )
        nxt = self.compactors[h + 1]
        nxt.buf = np.concatenate([nxt.buf, promoted])

    def _compress(self) -> None:
        h = 0
        while h < len(self.compactors):
            if len(self.compactors[h].buf) >= self.compactors[h].capacity():
                self._compact_level(h)
            else:
                h += 1

    # -------------------------------------------------------------- updates
    def update(self, values) -> None:
        from .kll import _to_float_array

        v = _to_float_array(values)
        if len(v) == 0:
            return
        c0 = self.compactors[0]
        chunk = max(c0.capacity(), 1024)
        for s in range(0, len(v), chunk):
            part = v[s : s + chunk]
            self.compactors[0].buf = np.concatenate(
                [self.compactors[0].buf, part]
            )
            self.n += len(part)
            self._compress()

    def put(self, x: float) -> None:
        self.update(np.array([x], dtype=np.float64))

    # --------------------------------------------------------------- merge
    def merge(self, other: "ReqSketch") -> "ReqSketch":
        self._check_compatible(other)
        while len(self.compactors) < len(other.compactors):
            tmpl = self.compactors[-1]
            self.compactors.append(
                _Compactor(tmpl.section_size, tmpl.num_sections)
            )
        for h, oc in enumerate(other.compactors):
            c = self.compactors[h]
            if len(oc.buf):
                c.buf = np.concatenate([c.buf, oc.buf])
            # adopt the more-compacted configuration (finer sections)
            if oc.compactions > c.compactions:
                c.compactions = oc.compactions
            if oc.section_size < c.section_size:
                c.section_size = oc.section_size
                c.num_sections = max(c.num_sections, oc.num_sections)
        self.n += other.n
        self._compress()
        return self

    # -------------------------------------------------------------- queries
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, c in enumerate(self.compactors):
            if len(c.buf):
                items.append(c.buf)
                weights.append(np.full(len(c.buf), float(1 << h)))
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
        """Normalized rank estimate(s): fraction of mass strictly below x."""
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

    # empirically calibrated: max observed |R̂−R| / (n−R+1) × k across
    # k ∈ {16,32,64} × 5 distributions (incl. sorted/reverse-sorted and a
    # heavy-ties zipf) × seeds × 3-way random merge trees was 1.73
    # (reverse-sorted, k=32); 2.5 adds ~1.45× headroom in the same
    # calibration spirit as KLL's 1.33 (validated in tests/test_req.py on
    # held-out seeds)
    _ERR_CONST = 2.5

    def relative_rank_error_bound(self) -> float:
        """ε such that |R̂(x) − R(x)| ≤ ε·(n − R(x) + 1) for the HRA
        orientation (mirror for LRA), empirically validated."""
        return self._ERR_CONST / self.k

    def rank_error_bound(self, nsigma: float = 3.0) -> float:
        """Uniform normalized rank-error bound implied by the relative
        guarantee: ε·(n−R+1)/n ≤ ε·(1 + 1/n) at every rank (the uniform
        view the shared contract suite checks; the sketch's POINT is that
        the actual error shrinks toward the accurate end). ``nsigma`` is
        accepted for KLL signature parity; the empirical constant already
        covers 3σ-equivalent coverage."""
        return self._ERR_CONST / self.k * (1.0 + 1.0 / max(self.n, 1))

    def is_empty(self) -> bool:
        return self.n == 0

    @property
    def size(self) -> int:
        return self.n

    # --------------------------------------------------------- serialization
    def _params_tuple(self) -> tuple:
        return (self.k, self.hra)

    def _params_bytes(self) -> bytes:
        return struct.pack("<iBq", self.k, int(self.hra), self.n)

    def _payload_bytes(self) -> bytes:
        parts = [struct.pack("<i", len(self.compactors))]
        for c in self.compactors:
            parts.append(
                struct.pack("<iiiq", c.section_size, c.num_sections,
                            c.compactions, len(c.buf))
            )
        for c in self.compactors:
            parts.append(np.ascontiguousarray(c.buf, dtype="<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "ReqSketch":
        k, hra, n = struct.unpack("<iBq", params)
        if k < _MIN_SECTION or k % 2:
            raise ValueError("corrupt REQ blob: bad k")
        sk = cls.__new__(cls)
        Sketch.__init__(sk, FUNNEL_NONE)
        sk.k = k
        sk.hra = bool(hra)
        sk.n = n
        sk._rng = np.random.default_rng(0x5EED)
        (nlev,) = struct.unpack_from("<i", payload, 0)
        if nlev <= 0 or nlev > 64:
            raise ValueError("corrupt REQ blob: bad level count")
        off = 4
        metas = []
        for _ in range(nlev):
            metas.append(struct.unpack_from("<iiiq", payload, off))
            off += 20
        sk.compactors = []
        for ss, m, comp, ln in metas:
            if ss < _MIN_SECTION or m <= 0 or comp < 0 or ln < 0 or off + 8 * ln > len(payload):
                raise ValueError("corrupt REQ blob: bad compactor header")
            c = _Compactor(ss, m)
            c.compactions = comp
            c.buf = np.frombuffer(payload, dtype="<f8", count=ln, offset=off).copy()
            sk.compactors.append(c)
            off += 8 * ln
        return sk

    def __repr__(self) -> str:
        return (
            f"ReqSketch(k={self.k}, hra={self.hra}, n={self.n}, "
            f"levels={len(self.compactors)}, "
            f"retained={sum(len(c.buf) for c in self.compactors)})"
        )
