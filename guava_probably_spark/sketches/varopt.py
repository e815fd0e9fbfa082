"""VarOpt_k — variance-optimal weighted sampling with exact total weight.

Cohen, Duffield, Kaplan, Lund, Thorup, "Stream sampling for
variance-optimal estimation of subset sums" (SODA 2009 / SIAM J. Comput.
2011).  A VarOpt_k sample of a weighted population keeps k items: every
item heavier than a threshold τ survives with its EXACT weight, and the
light items are sampled with probability w/τ (each survivor adjusted to
weight τ), with τ the unique root of Σ min(w_i/τ, 1) = k.  The estimator
``Σ est_weight over the sampled members of S`` is unbiased for ANY fixed
subset S, and among all k-sample schemes VarOpt minimizes the total
variance ΣVar — strictly better than priority sampling
(``pipeline/sampling.py``), whose per-item priorities cost a factor ~2 in
variance.  Two exact (non-statistical) invariants make it driver-checkable:

- **total preservation**: Σ est_weight == Σ ingested weight exactly (the
  light survivors number exactly k − L and carry τ each, and
  Σ_light w = (k − L)·τ by the definition of τ) — at every merge level;
- **heavy exactness**: every retained item with est_weight > τ carries its
  true accumulated weight.

This implementation is the BATCH form, built for Spark tree-folds: each
ingest/merge appends candidate items, and consolidation runs the one-shot
VarOpt reduction — L* located by a prefix-sum scan over the weight-sorted
items (vectorized), then **systematic sampling** over the inclusion
probabilities in canonical hash order selects exactly k − L* light items
(Σp = k − L* ⇒ the systematic pass hits exactly that many intervals).
Cohen et al. §4 show the sample stays VarOpt under exactly this
append/merge composition on ADJUSTED weights.  Randomness is hash-derived
(key hash × seed, like the library's other samplers): builds are
deterministic functions of (item multiset, k, seed) — re-running a job
reproduces its sample — at the price that the independence in the
unbiasedness proof is pseudo-random (tests verify unbiasedness empirically
across seeds).  Merge ORDER changes which light items survive (the
kll/t-digest determinism class, not the byte-equal class); the two exact
invariants above hold for every order.

Witness layout (hash + canonical key bytes + f64 adjusted weight) follows
``bottomk.py``; no counterpart in guava-probably (SURVEY.md §2 extension
tier).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import (
    FUNNEL_LONG,
    FUNNEL_PREHASHED,
    FUNNEL_UTF8,
    KIND_VAROPT,
    Sketch,
    column_to_hash_input,
    element_to_hash,
    prehashed_hashes,
    register_kind,
)

_U64 = np.uint64
_FULL = float(1 << 64)


def _le8(v: int) -> bytes:
    return int(v).to_bytes(8, "little")


def _mix(h: np.ndarray, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = h.astype(np.uint64) + _U64(
            (seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF
        )
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def _varopt_reduce(h: np.ndarray, w: np.ndarray, k: int, seed: int):
    """One-shot VarOpt_k over (hash, weight) items.

    Returns (keep_indices, est_weights, tau).  Exact guarantees:
    len(keep) == min(k, n), est.sum() == w.sum() (up to float addition),
    and items with w > tau keep w exactly.
    """
    n = len(h)
    if n <= k:
        return np.arange(n, dtype=np.int64), w.astype(np.float64).copy(), 0.0
    # canonical weight order: descending weight, hash tie-break
    order = np.lexsort((h, -w))
    ws = w[order].astype(np.float64)
    suffix = np.cumsum(ws[::-1])[::-1]  # suffix[L] = sum(ws[L:])
    Ls = np.arange(k, dtype=np.float64)
    cond = ws[:k] * (k - Ls) <= suffix[:k]
    Lstar = int(np.argmax(cond))  # first True; L = k-1 is always True
    m = k - Lstar
    tau = float(suffix[Lstar]) / m
    sure = order[:Lstar]
    small = order[Lstar:]
    p = np.clip(w[small] / tau, 0.0, 1.0)
    # systematic sampling in canonical mixed-hash order: exactly m hits
    so = np.argsort(_mix(h[small], seed), kind="stable")
    c = np.cumsum(p[so])
    c *= m / c[-1]
    c[-1] = m  # exact endpoint so the interval count below is exactly m
    u_src = int(_mix(np.bitwise_xor.reduce(h), seed + 0x5BD1)[()]) / _FULL
    U = min(max(u_src, 1e-9), 1.0 - 1e-9)
    prev = np.concatenate(([0.0], c[:-1]))
    sel = np.floor(c - U) > np.floor(prev - U)
    chosen = small[so[sel]]
    if len(chosen) < m:
        # float edge: after the m/c[-1] rescale an increment for a p==1 item
        # (weight exactly tau) can marginally exceed 1.0, letting one floor
        # interval absorb two grid points; top up deterministically (earliest
        # unchosen in canonical order) so sample size is exactly m and
        # est.sum() == w.sum() holds
        extra = small[so[~sel]][: m - len(chosen)]
        chosen = np.concatenate([chosen, extra])
    keep = np.concatenate([sure, chosen])
    est = np.concatenate([w[sure].astype(np.float64), np.full(len(chosen), tau)])
    return keep, est, tau


@register_kind
class VarOptSketch(Sketch):
    KIND = KIND_VAROPT

    def __init__(self, k: int = 1024, funnel: int = FUNNEL_UTF8, seed: int = 0):
        super().__init__(funnel)
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = int(k)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.hashes = np.zeros(0, dtype=np.uint64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.values: list[bytes] = []
        self.total_weight = 0.0
        self.n_items = 0
        self.tau = 0.0

    # -- contract -------------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (self.k, self.seed)

    def _params_bytes(self) -> bytes:
        return struct.pack("<IQ", self.k, self.seed)

    def _payload_bytes(self) -> bytes:
        n = len(self.hashes)
        lens = np.fromiter((len(v) for v in self.values), dtype=np.uint32, count=n)
        offsets = np.zeros(n + 1, dtype="<u4")
        np.cumsum(lens, out=offsets[1:])
        return (
            struct.pack("<IdQd", n, self.total_weight, self.n_items, self.tau)
            + self.hashes.astype("<u8").tobytes()
            + self.weights.astype("<f8").tobytes()
            + offsets.tobytes()
            + b"".join(self.values)
        )

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "VarOptSketch":
        k, seed = struct.unpack_from("<IQ", params, 0)
        sk = cls(k=k, funnel=funnel, seed=seed)
        n, total, n_items, tau = struct.unpack_from("<IdQd", payload, 0)
        pos = struct.calcsize("<IdQd")
        if n > sk.k or len(payload) < pos + n * 16 + (n + 1) * 4:
            raise ValueError(f"corrupt varopt payload: n={n} in {len(payload)} bytes")
        sk.total_weight, sk.n_items, sk.tau = float(total), int(n_items), float(tau)
        sk.hashes = np.frombuffer(payload, dtype="<u8", count=n, offset=pos).astype(
            np.uint64
        )
        pos += n * 8
        sk.weights = np.frombuffer(payload, dtype="<f8", count=n, offset=pos).astype(
            np.float64
        )
        pos += n * 8
        offsets = np.frombuffer(payload, dtype="<u4", count=n + 1, offset=pos)
        pos += (n + 1) * 4
        blob = payload[pos : pos + int(offsets[-1])]
        if len(blob) != int(offsets[-1]) or not np.all(np.diff(offsets.astype(np.int64)) >= 0):
            raise ValueError("varopt payload truncated")
        sk.values = [bytes(blob[offsets[i] : offsets[i + 1]]) for i in range(n)]
        if (sk.weights < 0).any() or not np.isfinite(sk.weights).all():
            raise ValueError("corrupt varopt payload: bad weights")
        return sk

    # -- ingest ---------------------------------------------------------------
    def _fold_items(self, h: np.ndarray, w: np.ndarray, get_bytes) -> None:
        """Reduce (retained ∪ new batch) to ≤ k items; ``get_bytes(i)``
        materializes the i-th NEW item's key bytes (only called for
        survivors, so the Python-object cost is O(k) per batch)."""
        n_old = len(self.hashes)
        all_h = np.concatenate([self.hashes, h])
        all_w = np.concatenate([self.weights, w.astype(np.float64)])
        keep, est, tau = _varopt_reduce(all_h, all_w, self.k, self.seed)
        vals = [
            self.values[i] if i < n_old else get_bytes(int(i - n_old)) for i in keep
        ]
        self.hashes = all_h[keep]
        self.weights = est
        self.values = vals
        self.tau = max(self.tau, tau)
        self.total_weight += float(w.sum())
        self.n_items += len(h)

    def _check_weights(self, h_len: int, weights) -> np.ndarray:
        if weights is None:
            return np.ones(h_len, dtype=np.float64)
        w = np.asarray(weights, dtype=np.float64)
        if len(w) != h_len:
            raise ValueError(
                f"weights must align with non-null keys ({h_len} vs {len(w)})"
            )
        return w

    def update(self, values, weights=None) -> None:
        """Weighted items in; ``weights=None`` = unit weights (the sample
        then estimates subset ROW counts). NaN / negative / zero weights
        are dropped (a NaN orders above every number in both engines and
        would hijack a slot — same guard as the ES/priority samplers)."""
        from .hashing import hash128_bytes, hash128_u64

        if self.funnel == FUNNEL_PREHASHED:
            h = prehashed_hashes(values)
            w = self._check_weights(len(h), weights)
            ok = np.isfinite(w) & (w > 0)
            h, w = h[ok], w[ok]
            if len(h):
                self._fold_items(h, w, lambda i, hh=h: _le8(int(hh[i])))
            return
        funnel, inp = column_to_hash_input(values)
        if funnel == 0:
            return
        if funnel != self.funnel:
            from .base import IncompatibleSketchError

            raise IncompatibleSketchError(
                f"column funnel {funnel} != sketch funnel {self.funnel}"
            )
        if funnel == FUNNEL_LONG:
            if len(inp) == 0:
                return
            h1, _ = hash128_u64(inp)
            w = self._check_weights(len(h1), weights)
            ok = np.isfinite(w) & (w > 0)
            h1, w, vv = h1[ok], w[ok], inp[ok]
            if len(h1):
                self._fold_items(h1, w, lambda i: _le8(int(vv[i])))
        else:
            data, offsets = inp
            if len(offsets) <= 1:
                return
            h1, _ = hash128_bytes(data, offsets)
            w = self._check_weights(len(h1), weights)
            ok = np.isfinite(w) & (w > 0)
            idx = np.nonzero(ok)[0]
            if len(idx):
                self._fold_items(
                    h1[idx],
                    w[idx],
                    lambda i: bytes(
                        data[offsets[idx[i]] : offsets[idx[i] + 1]]
                    ),
                )

    def put(self, e, weight: float = 1.0) -> None:
        _, h1, _ = element_to_hash(e)
        if isinstance(e, str):
            vb = e.encode("utf-8")
        elif isinstance(e, bytes):
            vb = e
        else:
            vb = _le8(int(e) & 0xFFFFFFFFFFFFFFFF)
        if np.isfinite(weight) and weight > 0:
            self._fold_items(
                np.array([h1], dtype=np.uint64),
                np.array([float(weight)]),
                lambda i: vb,
            )

    def put_all(self, values) -> None:
        self.update(values)

    # -- merge ----------------------------------------------------------------
    def merge(self, other: "VarOptSketch") -> "VarOptSketch":
        self._check_compatible(other)
        ov = other.values
        n_old = len(self.hashes)
        all_h = np.concatenate([self.hashes, other.hashes])
        all_w = np.concatenate([self.weights, other.weights])
        keep, est, tau = _varopt_reduce(all_h, all_w, self.k, self.seed)
        self.values = [
            self.values[i] if i < n_old else ov[i - n_old] for i in keep
        ]
        self.hashes = all_h[keep]
        self.weights = est
        self.tau = max(self.tau, other.tau, tau)
        self.total_weight += other.total_weight
        self.n_items += other.n_items
        return self

    # -- estimators -----------------------------------------------------------
    def _decode(self, vb: bytes):
        if self.funnel == FUNNEL_UTF8:
            return vb.decode("utf-8", errors="replace")
        v = int.from_bytes(vb, "little")
        return v - (1 << 64) if v >= (1 << 63) else v

    def sample(self) -> list:
        """[(key, est_weight)] — Σ est_weight == total ingested weight
        exactly; est over the members of any fixed subset is unbiased for
        that subset's true weight."""
        return [
            (self._decode(v), float(w)) for v, w in zip(self.values, self.weights)
        ]

    def total_estimate(self) -> float:
        return float(self.weights.sum())

    @property
    def size(self) -> int:
        return len(self.hashes)

    def is_empty(self) -> bool:
        return len(self.hashes) == 0

    def clear(self) -> None:
        self.hashes = np.zeros(0, dtype=np.uint64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.values = []
        self.total_weight = 0.0
        self.n_items = 0
        self.tau = 0.0
