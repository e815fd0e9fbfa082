"""Static XOR map — exact key→value retrieval at ~1.23·(f+v) bits/key.

The retrieval-structure ("static function") generalization of the XOR
filter (Dietzfelbinger & Pagh, ICALP 2008; Graf & Lemire 2020 §3 note the
same construction): each cell holds f + v bits, solved so that for every
member key

    B[h0] ^ B[h1] ^ B[h2]  ==  (fingerprint << v) | value.

A lookup XORs three cells; if the high f bits match the probe's
fingerprint the low v bits are the EXACT stored value (members never
mismatch — zero false negatives); a non-member passes the fingerprint
check with probability 2^-f and then returns an arbitrary value, the same
one-sided error as the filter.

This is the serving-side replacement for a broadcast JOIN against a
small-value dimension: "annotate 10^12 turns with each conv's split/
quality-bucket/dedup-cluster label" becomes a broadcast of
~1.23·(f+v)/8 bytes per distinct key (2.5 B/key at f=8, v=8 — no key
bytes stored at all) probed in one vectorized pass, instead of shuffling
the fact table or broadcasting a full key→value hash map.  Like the XOR
filter it is immutable (``merge``/``update`` raise; re-freeze on change)
and built shard-parallel by :func:`operators.freeze.freeze_map` so no
key list reaches the driver.

Construction reuses the filter's round-batched peeling verbatim — only
the assigned payload differs.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import FUNNEL_UTF8, KIND_XORMAP, Sketch, register_kind
from .qf import _pack_bits, _unpack_bits
from .xorf import XorFilter, _mix, _positions

_U64 = np.uint64


@register_kind
class XorStaticMap(Sketch):
    """Immutable key→value map over a frozen key set; values are
    ``vbits``-bit unsigned integers."""

    KIND = KIND_XORMAP
    MAX_SEED_ATTEMPTS = 64

    def __init__(self, fbits: int = 8, vbits: int = 8, funnel: int = FUNNEL_UTF8):
        super().__init__(funnel)
        if not (1 <= fbits <= 32) or not (1 <= vbits <= 32) or fbits + vbits > 56:
            raise ValueError("need 1 <= fbits, vbits <= 32 and fbits + vbits <= 56")
        self.fbits = int(fbits)
        self.vbits = int(vbits)
        self.seed = 0
        self.n = 0
        self.table = np.zeros(0, dtype=np.uint64)  # c cells of (f+v) bits

    # -- construction ----------------------------------------------------------
    @classmethod
    def build_from_hashes(
        cls,
        hashes: np.ndarray,
        values: np.ndarray,
        fbits: int = 8,
        vbits: int = 8,
        funnel: int = FUNNEL_UTF8,
    ) -> "XorStaticMap":
        """Solve the map for (64-bit key hash, value) pairs.  Duplicate
        hashes must agree on the value (raises otherwise — a silent pick
        would return the wrong label for half the duplicates)."""
        sk = cls(fbits=fbits, vbits=vbits, funnel=funnel)
        h = np.asarray(hashes, dtype=_U64)
        v = np.asarray(values, dtype=np.int64)
        if len(h) != len(v):
            raise ValueError("hashes and values must align")
        if len(v) and ((v < 0).any() or (v >= (1 << vbits)).any()):
            raise ValueError(f"values must fit {vbits} unsigned bits")
        order = np.argsort(h, kind="stable")
        h, v = h[order], v[order]
        first = np.concatenate(([True], h[1:] != h[:-1]))
        if not first.all():
            # duplicates: keep one copy, but only if values agree
            grp = np.cumsum(first) - 1
            vmin = np.full(grp[-1] + 1, np.iinfo(np.int64).max, dtype=np.int64)
            vmax = np.full(grp[-1] + 1, np.iinfo(np.int64).min, dtype=np.int64)
            np.minimum.at(vmin, grp, v)
            np.maximum.at(vmax, grp, v)
            if (vmin != vmax).any():
                raise ValueError("duplicate keys with conflicting values")
            h, v = h[first], v[first]
        sk.n = int(len(h))
        if sk.n == 0:
            return sk
        seg = max(2, (int(1.23 * sk.n) + 32 + 2) // 3)
        c = 3 * seg
        for seed in range(cls.MAX_SEED_ATTEMPTS):
            order2 = XorFilter._peel(h, seed, seg, c)
            if order2 is not None:
                sk.seed = seed
                sk.table = cls._assign_map(h, v, seed, seg, c, order2, fbits, vbits)
                return sk
        raise RuntimeError(
            f"xor map peeling failed after {cls.MAX_SEED_ATTEMPTS} seeds"
        )

    @staticmethod
    def _assign_map(keys, vals, seed, seg, c, order, fbits, vbits):
        peel_round, chosen = order
        pos, fp_src = _positions(keys, seed, seg)
        payload = (
            ((fp_src & _U64((1 << fbits) - 1)) << _U64(vbits))
            | vals.astype(_U64)
        )
        table = np.zeros(c, dtype=_U64)
        for r in range(int(peel_round.max()), -1, -1):
            sel = peel_round == r
            p = pos[sel]
            val = payload[sel] ^ table[p[:, 0]] ^ table[p[:, 1]] ^ table[p[:, 2]]
            table[chosen[sel]] = val
        return table

    # -- lookups ---------------------------------------------------------------
    def lookup_hashes(self, h1: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(found, values): ``found[i]`` True iff the fingerprint matches
        (always for members; 2^-f for strangers); ``values[i]`` the stored
        ``vbits``-bit value where found, else 0."""
        h1 = np.asarray(h1, dtype=_U64)
        if self.n == 0 or len(self.table) == 0:
            return np.zeros(len(h1), dtype=bool), np.zeros(len(h1), dtype=np.int64)
        seg = len(self.table) // 3
        pos, fp_src = _positions(h1, self.seed, seg)
        t = self.table
        cell = t[pos[:, 0]] ^ t[pos[:, 1]] ^ t[pos[:, 2]]
        fp = fp_src & _U64((1 << self.fbits) - 1)
        found = (cell >> _U64(self.vbits)) == fp
        vals = (cell & _U64((1 << self.vbits) - 1)).astype(np.int64)
        vals[~found] = 0
        return found, vals

    def lookup_batch(self, values) -> tuple[np.ndarray, np.ndarray]:
        from .base import hash_column

        _, h1, _ = hash_column(values, self.funnel)
        return self.lookup_hashes(h1)

    def get(self, e, default=None):
        from .base import element_to_hash

        _, h1, _ = element_to_hash(e)
        found, vals = self.lookup_hashes(np.array([h1], _U64))
        return int(vals[0]) if found[0] else default

    # -- static contract -------------------------------------------------------
    def update(self, values):
        raise NotImplementedError(
            "XorStaticMap is static: build via build_from_hashes / operators.freeze_map"
        )

    def merge(self, other: "Sketch") -> "Sketch":
        raise NotImplementedError(
            "XorStaticMap cannot merge (the solution is global); "
            "re-freeze the union of (key, value) pairs instead"
        )

    def false_match_rate(self) -> float:
        return 2.0 ** -self.fbits

    @property
    def size(self) -> int:
        return self.n

    def is_empty(self) -> bool:
        return self.n == 0

    def bits_per_key(self) -> float:
        return len(self.table) * (self.fbits + self.vbits) / self.n if self.n else 0.0

    # -- serialization ---------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (self.fbits, self.vbits)

    def _params_bytes(self) -> bytes:
        return struct.pack("<BBIq", self.fbits, self.vbits, self.seed, self.n)

    def _payload_bytes(self) -> bytes:
        return _pack_bits(self.table, self.fbits + self.vbits).tobytes()

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "XorStaticMap":
        fbits, vbits, seed, n = struct.unpack("<BBIq", params)
        sk = cls(fbits=fbits, vbits=vbits, funnel=funnel)
        sk.seed, sk.n = seed, n
        if n == 0:
            return sk
        seg = max(2, (int(1.23 * n) + 32 + 2) // 3)
        c = 3 * seg
        width = fbits + vbits
        expect = ((c * width + 63) // 64) * 8
        if len(payload) != expect:
            raise ValueError(
                f"corrupt xor map payload: {len(payload)} bytes, expected {expect}"
            )
        words = np.frombuffer(payload, dtype=np.uint64)
        sk.table = _unpack_bits(words, c, width)
        return sk
