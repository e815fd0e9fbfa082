"""Bottom-k VALUE sample sketch (KMV with witnesses): a mergeable uniform
sample over the DISTINCT keys of a column.

The theta sketch (`theta.py`) keeps the k smallest distinct item *hashes* —
enough for cardinality and set-size estimates, but the items themselves are
gone.  This sketch keeps the (hash, value) pair, so one KB-scale blob built
in a single scan answers the corpus-audit questions a 100-TB pipeline
actually asks:

- "give me 1,000 uniformly random DISTINCT urls/users/grams" —
  ``sample()`` — without a corpus-wide ``distinct()`` shuffle (the k
  smallest hashes of the distinct domain are a uniform sample of it;
  Bar-Yossef et al. 2002);
- "how similar are corpora A and B, and SHOW me overlapping keys" —
  ``jaccard_estimate`` (Broder 1997 single-permutation bottom-k MinHash:
  |bottom_k(A ∪ B) ∩ A ∩ B| / k) and ``common_values`` (actual witness
  keys in the intersection sample — the evidence an audit report needs);
- the same (k−1)/θ distinct-count estimate as theta (Beyer et al.
  SIGMOD'07), exact below saturation.

Mergeability is canonical: the retained set after any merge tree is THE k
smallest distinct hashes of the union (ties on a 64-bit hash collision are
broken by the smaller canonical value bytes), so serialized blobs are
byte-equal across partitionings — the bloom/HLL/CMS/theta determinism
class — and ``fold_to(k')`` truncation is byte-identical to a direct
build at k'.

State: sorted u64 hash array + aligned canonical value bytes (UTF-8 bytes
for string funnels, 8-byte LE for long/prehashed funnels).  Updates
pre-trim each batch to its ≤ k smallest qualifying hashes with
``np.argpartition`` before any per-value byte materialization, so the
Python-object cost is O(k) per batch, not O(batch).

No counterpart in guava-probably (SURVEY.md §2 extension tier); same
murmur3_x64_128 funnel pipeline and GPSK framing as every sketch here, so
it rides collect_sketch / tree merge / checkpoint heal unchanged.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import (
    FUNNEL_LONG,
    FUNNEL_PREHASHED,
    FUNNEL_UTF8,
    KIND_BOTTOMK,
    Sketch,
    column_to_hash_input,
    element_to_hash,
    prehashed_hashes,
    register_kind,
)

_FULL = float(1 << 64)


def _le8(v: int) -> bytes:
    """Canonical 8-byte LE encoding of a (u)int64 value — the longFunnel
    byte form, shared with the hash pipeline."""
    return struct.pack("<Q", int(v) & ((1 << 64) - 1))


@register_kind
class BottomKSketch(Sketch):
    KIND = KIND_BOTTOMK

    def __init__(self, k: int = 1024, funnel: int = FUNNEL_UTF8):
        if k < 16:
            raise ValueError("k must be >= 16")
        super().__init__(funnel)
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted, distinct
        self.values: list[bytes] = []  # aligned canonical bytes

    # -- contract ------------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (self.k,)

    def _params_bytes(self) -> bytes:
        return struct.pack("<I", self.k)

    def _payload_bytes(self) -> bytes:
        n = len(self.hashes)
        lens = np.fromiter((len(v) for v in self.values), dtype=np.uint32, count=n)
        offsets = np.zeros(n + 1, dtype="<u4")
        np.cumsum(lens, out=offsets[1:])
        return (
            struct.pack("<I", n)
            + self.hashes.astype("<u8").tobytes()
            + offsets.tobytes()
            + b"".join(self.values)
        )

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "BottomKSketch":
        (k,) = struct.unpack_from("<I", params, 0)
        sk = cls(k=k, funnel=funnel)
        (n,) = struct.unpack_from("<I", payload, 0)
        pos = 4
        sk.hashes = np.frombuffer(payload, dtype="<u8", count=n, offset=pos).astype(
            np.uint64
        )
        pos += n * 8
        offsets = np.frombuffer(payload, dtype="<u4", count=n + 1, offset=pos)
        pos += (n + 1) * 4
        blob = payload[pos : pos + int(offsets[-1])]
        sk.values = [
            bytes(blob[offsets[i] : offsets[i + 1]]) for i in range(n)
        ]
        if len(sk.values) != n:
            raise ValueError("bottom-k payload truncated")
        return sk

    # -- core kernel ----------------------------------------------------------
    def _bound(self) -> int:
        """Inclusive sampling threshold as an exact python int (2^64 =
        unsaturated / exact mode) — same integer-bound discipline as
        theta._theta_bound (float rounding above 2^53 would drop boundary
        hashes and desaturate merges)."""
        if len(self.hashes) < self.k:
            return 1 << 64
        return int(self.hashes[-1])

    @property
    def theta(self) -> float:
        return self._bound() / _FULL

    def _fold(self, h: np.ndarray, vals: list[bytes]) -> None:
        """Fold (hash, value) candidates into the retained bottom-k set.

        Canonical dedup: stable-sort by hash; within a duplicate-hash run
        (almost always the same item seen twice; a true 64-bit collision at
        ~k²/2⁶⁵ odds) keep the smallest value bytes — merge-order
        independent, so blobs stay byte-equal under any merge tree."""
        all_h = np.concatenate([self.hashes, h.astype(np.uint64)])
        all_v = np.empty(len(all_h), dtype=object)
        all_v[: len(self.values)] = self.values
        all_v[len(self.values) :] = vals
        order = np.argsort(all_h, kind="stable")
        sh, sv = all_h[order], all_v[order]
        starts = np.nonzero(np.r_[True, sh[1:] != sh[:-1]])[0] if len(sh) else np.empty(0, np.int64)
        uniq_h = sh[starts]
        uniq_v = sv[starts]
        counts = np.diff(np.r_[starts, len(sh)])
        for j in np.nonzero(counts > 1)[0]:
            s = starts[j]
            run = sv[s : s + counts[j]]
            m = run[0]
            for x in run[1:]:
                if x < m:
                    m = x
            uniq_v[j] = m
        if len(uniq_h) > self.k:
            uniq_h = uniq_h[: self.k]
            uniq_v = uniq_v[: self.k]
        self.hashes = uniq_h.astype(np.uint64)
        self.values = list(uniq_v)

    def _batch_candidates(
        self, h1: np.ndarray, take: "callable"
    ) -> tuple[np.ndarray, list[bytes]]:
        """Pre-trim a batch to its ≤ k smallest DISTINCT qualifying hashes
        BEFORE materializing value bytes: vectorized O(batch log batch) +
        python O(k).  Distinct matters — the k smallest hash INSTANCES of
        a duplicate-heavy batch would starve distinct values out of the
        retained set (caught by the first smoke run)."""
        bound = self._bound()
        if bound < (1 << 64):
            keep = np.nonzero(h1 <= np.uint64(bound))[0]
        else:
            keep = np.arange(len(h1))
        uniq, first = np.unique(h1[keep], return_index=True)  # sorted unique
        keep = keep[first[: self.k]]  # k smallest distinct (uniq ascending)
        return h1[keep], [take(int(i)) for i in keep]

    # -- updates ---------------------------------------------------------------
    def update(self, values) -> None:
        from .hashing import hash128_bytes, hash128_u64

        if self.funnel == FUNNEL_PREHASHED:
            h = prehashed_hashes(values)
            if len(h) == 0:
                return
            hh, vv = self._batch_candidates(h, lambda i: _le8(int(h[i])))
            self._fold(hh, vv)
            return
        funnel, inp = column_to_hash_input(values)
        if funnel == 0:  # FUNNEL_NONE: empty / all-null batch
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
            hh, vv = self._batch_candidates(h1, lambda i: _le8(int(inp[i])))
        else:
            data, offsets = inp
            if len(offsets) <= 1:
                return
            h1, _ = hash128_bytes(data, offsets)
            hh, vv = self._batch_candidates(
                h1, lambda i: bytes(data[offsets[i] : offsets[i + 1]])
            )
        self._fold(hh, vv)

    def put(self, e) -> None:
        funnel, h1, _ = element_to_hash(e)
        if funnel != self.funnel:
            from .base import IncompatibleSketchError

            raise IncompatibleSketchError(
                f"element funnel {funnel} != sketch funnel {self.funnel}"
            )
        if funnel == FUNNEL_LONG:
            vb = _le8(int(e))
        else:
            vb = e.encode("utf-8") if isinstance(e, str) else bytes(e)
        self._fold(np.array([h1], dtype=np.uint64), [vb])

    def put_all(self, values) -> None:
        self.update(list(values))

    # -- merge / fold ------------------------------------------------------------
    def _trimmed_pair(
        self, other: "BottomKSketch"
    ) -> tuple[np.ndarray, np.ndarray, float]:
        self._check_compatible(other)
        t = min(self._bound(), other._bound())
        if t < (1 << 64):
            bound = np.uint64(t)
            ai = np.nonzero(self.hashes <= bound)[0]
            bi = np.nonzero(other.hashes <= bound)[0]
        else:
            ai = np.arange(len(self.hashes))
            bi = np.arange(len(other.hashes))
        return ai, bi, t / _FULL

    def merge(self, other: "BottomKSketch") -> "BottomKSketch":
        ai, bi, _ = self._trimmed_pair(other)
        h = np.concatenate([self.hashes[ai], other.hashes[bi]])
        v = [self.values[int(i)] for i in ai] + [other.values[int(i)] for i in bi]
        self.hashes = np.empty(0, dtype=np.uint64)
        self.values = []
        self._fold(h, v)
        return self

    def fold_to(self, k: int) -> "BottomKSketch":
        """EXACT fold to a smaller k — byte-identical to a direct build at
        k (the k₂ smallest of the k₁ smallest are the k₂ smallest)."""
        if not 16 <= k <= self.k:
            raise ValueError(f"can only fold to 16 <= k <= {self.k}, got {k}")
        out = BottomKSketch(k, self.funnel)
        n = min(len(self.hashes), k)
        out.hashes = self.hashes[:n].copy()
        out.values = self.values[:n]
        return out

    # -- estimates / samples -------------------------------------------------------
    def estimate(self) -> float:
        n = len(self.hashes)
        if n < self.k:
            return float(n)  # exact below saturation
        return (self.k - 1) / self.theta

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    def relative_error_bound(self, nsigma: float = 3.0) -> float:
        return nsigma / math.sqrt(self.k - 1)

    def _decode(self, vb: bytes):
        if self.funnel == FUNNEL_UTF8:
            return vb.decode("utf-8", errors="surrogateescape")
        v = struct.unpack("<Q", vb)[0]
        if self.funnel == FUNNEL_LONG and v >= (1 << 63):
            return v - (1 << 64)  # back to signed int64
        return v

    def sample(self, limit: int | None = None) -> list:
        """Uniform sample of the column's DISTINCT values (decoded), in
        hash order — deterministic in the data alone.  Below saturation
        this is the complete distinct set."""
        n = len(self.values) if limit is None else min(limit, len(self.values))
        return [self._decode(v) for v in self.values[:n]]

    def jaccard_estimate(self, other: "BottomKSketch") -> float:
        """Broder bottom-k MinHash: the k smallest union hashes vote —
        |bottom_k(A ∪ B) ∩ A ∩ B| / |bottom_k(A ∪ B)|; ±3/√k at 3σ."""
        ai, bi, _ = self._trimmed_pair(other)
        a, b = self.hashes[ai], other.hashes[bi]
        u = np.union1d(a, b)
        if len(u) == 0:
            return 0.0
        if len(u) > self.k:
            u = u[: self.k]  # union1d returns sorted — the k smallest
        inter = np.intersect1d(a, b, assume_unique=True)
        hits = len(np.intersect1d(u, inter, assume_unique=True))
        return hits / len(u)

    def common_values(self, other: "BottomKSketch", limit: int | None = None) -> list:
        """Witness keys in the intersection SAMPLE (decoded) — the concrete
        evidence a corpus-overlap audit reports next to its estimate."""
        ai, bi, _ = self._trimmed_pair(other)
        common = np.intersect1d(self.hashes[ai], other.hashes[bi], assume_unique=True)
        idx = np.searchsorted(self.hashes, common)
        out = [self._decode(self.values[int(i)]) for i in idx]
        return out if limit is None else out[:limit]

    def intersect_estimate(self, other: "BottomKSketch") -> float:
        ai, bi, t = self._trimmed_pair(other)
        hits = len(np.intersect1d(self.hashes[ai], other.hashes[bi], assume_unique=True))
        return hits / t

    # -- misc ------------------------------------------------------------------
    def is_empty(self) -> bool:
        return len(self.hashes) == 0

    def clear(self) -> None:
        self.hashes = np.empty(0, dtype=np.uint64)
        self.values = []

    @property
    def size(self) -> int:
        return len(self.hashes)
