"""XOR filter — static membership at ~1.23·f bits/key (serving-side form).

Graf & Lemire, "Xor Filters: Faster and Smaller Than Bloom and Cuckoo
Filters" (ACM JEA 25, 2020).  A 3-wise XOR filter stores, for a FIXED key
set, a table B of c ≈ 1.23·n + 32 f-bit cells split into three segments;
each key hashes to one cell per segment and to an f-bit fingerprint, and
the table is solved (by hypergraph peeling) so that

    fingerprint(x) == B[h0(x)] ^ B[h1(x)] ^ B[h2(x)]   for every member x.

Probes are three gathers and two XORs with false-positive rate exactly
2^-f; at f=8 that is 0.39% FPP in 9.84 bits/key — smaller than a Bloom
filter at the same FPP (11.5 bits) and with O(1) worst-case probe cost.

The price of the density is **immutability**: no inserts after build, no
deletes, and **no merge** (the peeling solution is global — `merge`
raises, documented).  This is therefore NOT another mergeable build-side
sketch; it is the **compaction target**: build mergeable filters (bloom /
cuckoo / qf / sbf) during the scan-phase tree-fold, then freeze the final
key set into XOR filters for the serving/probe path
(:mod:`guava_probably_spark.operators.freeze` shards the build so no key
list ever reaches the driver).  It still registers in the blob registry so
``Sketch.from_bytes`` / ``might_contain_udf`` work unchanged on frozen
blobs.

Construction here is the round-batched peeling: each round finds every
key that owns a degree-1 cell (vectorized bincount), removes them all,
and repeats — O(log n) numpy rounds instead of a per-key Python loop.
Same-round keys are provably independent (a chosen cell had degree 1 at
the round start, so no other alive key maps there), which makes the
reverse assignment pass batchable by round as well.  Peeling succeeds
w.h.p. at c ≥ 1.23·n; on the (rare) failure the build retries with the
next seed, deterministically — the blob is a pure function of the
DISTINCT key-hash set, so shard builds are partition-order independent.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import (
    FUNNEL_UTF8,
    KIND_XOR,
    Sketch,
    element_to_hash,
    hash_column,
    register_kind,
)

_U64 = np.uint64


def _mix(h: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer over seed-offset hashes — the per-attempt
    rehash (public-domain constant set, Steele et al.)."""
    z = h + _U64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _positions(h: np.ndarray, seed: int, seg: int) -> tuple[np.ndarray, np.ndarray]:
    """(n,3) cell positions (one per segment) + f-bit fingerprint source."""
    z = _mix(h, seed)
    # three independent 21-bit-ish streams via fixed rotations of z
    r0 = z
    r1 = (z >> _U64(21)) | (z << _U64(43))
    r2 = (z >> _U64(42)) | (z << _U64(22))
    # multiply-shift range reduction on the high 32 bits: exact [0, seg)
    # (a float64 ratio rounds 2^64-1 up to 1.0 and indexes out of bounds)
    s = _U64(seg)
    pos = np.empty((len(h), 3), dtype=np.int64)
    pos[:, 0] = (((r0 >> _U64(32)) * s) >> _U64(32)).astype(np.int64)
    pos[:, 1] = seg + (((r1 >> _U64(32)) * s) >> _U64(32)).astype(np.int64)
    pos[:, 2] = 2 * seg + (((r2 >> _U64(32)) * s) >> _U64(32)).astype(np.int64)
    fp_src = _mix(z, 0xFF)
    return pos, fp_src


@register_kind
class XorFilter(Sketch):
    """Static 3-wise XOR filter over a frozen distinct-key set."""

    KIND = KIND_XOR
    MAX_SEED_ATTEMPTS = 64

    def __init__(self, fbits: int = 8, funnel: int = FUNNEL_UTF8):
        super().__init__(funnel)
        if fbits not in (8, 16, 32):
            raise ValueError("fbits must be 8, 16 or 32")
        self.fbits = int(fbits)
        self.seed = 0
        self.n = 0
        self.table = np.zeros(0, dtype=self._dtype())

    def _dtype(self):
        return {8: np.uint8, 16: np.uint16, 32: np.uint32}[self.fbits]

    # -- construction ----------------------------------------------------------
    @classmethod
    def build_from_hashes(
        cls, hashes: np.ndarray, fbits: int = 8, funnel: int = FUNNEL_UTF8
    ) -> "XorFilter":
        """Solve the filter for a set of 64-bit key hashes (deduped here;
        the blob depends only on the distinct set)."""
        sk = cls(fbits=fbits, funnel=funnel)
        keys = np.unique(np.asarray(hashes, dtype=_U64))
        n = len(keys)
        sk.n = int(n)
        if n == 0:
            sk.table = np.zeros(0, dtype=sk._dtype())
            return sk
        seg = max(2, (int(1.23 * n) + 32 + 2) // 3)
        c = 3 * seg
        for seed in range(cls.MAX_SEED_ATTEMPTS):
            order = cls._peel(keys, seed, seg, c)
            if order is not None:
                sk.seed = seed
                sk.table = cls._assign(keys, seed, seg, c, order, fbits)
                return sk
        raise RuntimeError(f"xor filter peeling failed after {cls.MAX_SEED_ATTEMPTS} seeds")

    @staticmethod
    def _peel(keys: np.ndarray, seed: int, seg: int, c: int):
        """Round-batched hypergraph peeling; returns per-key
        (round, chosen cell) or None when the 2-core is non-empty."""
        n = len(keys)
        pos, _ = _positions(keys, seed, seg)
        peel_round = np.full(n, -1, dtype=np.int64)
        chosen = np.full(n, -1, dtype=np.int64)
        # compact to alive-only arrays each round: total work is
        # sum(|alive|) over rounds ≈ a few·n, not rounds·n
        cur_ids = np.arange(n, dtype=np.int64)
        cur_pos = pos
        rnd = 0
        while len(cur_ids):
            deg = np.bincount(cur_pos.ravel(), minlength=c)
            single = deg[cur_pos] == 1
            pick = single.any(axis=1)
            if not pick.any():
                return None  # 2-core remains: reseed
            first = np.argmax(single[pick], axis=1)
            ids = cur_ids[pick]
            peel_round[ids] = rnd
            chosen[ids] = cur_pos[pick][np.arange(len(ids)), first]
            keep = ~pick
            cur_ids = cur_ids[keep]
            cur_pos = cur_pos[keep]
            rnd += 1
        return peel_round, chosen

    @staticmethod
    def _assign(keys, seed, seg, c, order, fbits):
        peel_round, chosen = order
        pos, fp_src = _positions(keys, seed, seg)
        fp = (fp_src & _U64((1 << fbits) - 1)).astype(_U64)
        table = np.zeros(c, dtype=_U64)
        # reverse pass, one batch per round: same-round chosen cells are
        # distinct and their other cells were assigned in later rounds
        for r in range(int(peel_round.max()), -1, -1):
            sel = peel_round == r
            p = pos[sel]
            val = fp[sel] ^ table[p[:, 0]] ^ table[p[:, 1]] ^ table[p[:, 2]]
            # val currently includes the (still-zero) chosen cell XORed in
            table[chosen[sel]] = val
        dt = {8: np.uint8, 16: np.uint16, 32: np.uint32}[fbits]
        return table.astype(dt)

    # -- probes ----------------------------------------------------------------
    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if self.n == 0 or len(self.table) == 0:
            return np.zeros(len(h1), dtype=bool)
        seg = len(self.table) // 3
        pos, fp_src = _positions(h1.astype(_U64), self.seed, seg)
        fp = (fp_src & _U64((1 << self.fbits) - 1)).astype(self.table.dtype)
        t = self.table
        return (t[pos[:, 0]] ^ t[pos[:, 1]] ^ t[pos[:, 2]]) == fp

    def might_contain_batch(self, values) -> np.ndarray:
        _, h1, h2 = hash_column(values, self.funnel)
        return self.contains_hashes(h1, h2)

    def might_contain(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(
            self.contains_hashes(
                np.array([h1], _U64), np.array([h2], _U64)
            )[0]
        )

    def contains_all(self, elements) -> bool:
        return bool(self.might_contain_batch(elements).all())

    # -- static contract -------------------------------------------------------
    def update(self, values):
        raise NotImplementedError(
            "XorFilter is static: build via build_from_hashes / operators.freeze_filter"
        )

    def merge(self, other: "Sketch") -> "Sketch":
        raise NotImplementedError(
            "XorFilter cannot merge (the peeling solution is global); "
            "re-freeze the union of key sets instead"
        )

    def expected_fpp(self) -> float:
        return 2.0 ** -self.fbits

    @property
    def size(self) -> int:
        return self.n

    def is_empty(self) -> bool:
        return self.n == 0

    def bits_per_key(self) -> float:
        return len(self.table) * self.fbits / self.n if self.n else 0.0

    # -- serialization ---------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (self.fbits,)

    def _params_bytes(self) -> bytes:
        return struct.pack("<BIq", self.fbits, self.seed, self.n)

    def _payload_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "XorFilter":
        fbits, seed, n = struct.unpack("<BIq", params)
        sk = cls(fbits=fbits, funnel=funnel)
        sk.seed, sk.n = seed, n
        table = np.frombuffer(payload, dtype=sk._dtype())
        if n < 0 or (n > 0 and (len(table) < 3 or len(table) % 3 != 0)):
            raise ValueError(f"corrupt xor filter payload: {len(table)} cells for n={n}")
        sk.table = table.copy()
        return sk
