"""HyperLogLog — dense registers, 64-bit hash, linear-counting correction.

North-rule extension sketch (SURVEY.md §2.2; not present in guava-probably).
Published algorithm: Flajolet–Fuss–Gandouet–Meunier 2007, with the 64-bit
hash treatment of Heule et al. 2013 (HLL++: no large-range correction needed).

- m = 2^p registers; idx = top p bits of h1; rho = (#leading zeros of the
  remaining 64−p bits) + 1
- update: register[idx] = max(register[idx], rho)  → merge = elementwise max
  (associative, commutative, idempotent → blobs byte-equal across merge
  orders/partitionings)
- estimate: alpha_m·m²/Σ2^(−M_j); if E ≤ 2.5m and V>0: m·ln(m/V)
- relative standard error σ = 1.04/√m (the BASELINE.md bound)
- serialized registers are 6-bit packed ("dense, 6-bit registers",
  BASELINE.json north star); in-memory uint8 for vectorized max.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import FUNNEL_UTF8, KIND_HLL, Sketch, element_to_hash, hash_column, register_kind


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _leading_zero_rho(w: np.ndarray, width: int) -> np.ndarray:
    """rho = position of leftmost 1-bit in the top `width` bits of w, else width+1.

    Vectorized via bit-smearing + SWAR popcount (exact, no float log2
    hazards, and NO per-bit expansion: the previous np.unpackbits popcount
    materialized an (n, 64) uint8 matrix — a measured 10× transient
    allocation on whole-partition inputs, against the codebase's own
    memory discipline; SWAR stays in uint64 and measured 26× faster).
    """
    v = w.copy()
    for s in (1, 2, 4, 8, 16, 32):
        v |= v >> np.uint64(s)
    with np.errstate(over="ignore"):
        v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
        v = (v & np.uint64(0x3333333333333333)) + (
            (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        pop = (v * np.uint64(0x0101010101010101)) >> np.uint64(56)
    clz = np.uint64(64) - pop  # leading zeros in the full 64-bit word
    rho = np.minimum(clz, np.uint64(width)) + np.uint64(1)
    return rho.astype(np.uint8)


@register_kind
class HllSketch(Sketch):
    KIND = KIND_HLL

    def __init__(self, p: int = 14, funnel: int = FUNNEL_UTF8):
        if not 4 <= p <= 18:
            raise ValueError("precision p must be in [4, 18]")
        super().__init__(funnel)
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    # -- serialization --------------------------------------------------------
    # Adaptive payload (content-deterministic, so blob byte-equality across
    # merge orders / partitionings is preserved):
    #   len(payload) == 3m/4      → legacy dense (pre-sparse blobs, no tag)
    #   tag 0 | 6-bit packed      → dense  (len = 1 + 3m/4)
    #   tag 2 | u32 nnz | u16 idx[nnz] asc | u8 rho[nnz]   (p ≤ 16)
    #   tag 1 | u32 nnz | u32 idx[nnz] asc | u8 rho[nnz]   (p > 16)
    # Rule: sparse iff its size < 3m/4 (strict — also keeps it length-disjoint
    # from legacy). A p=14 sketch of a 10-element group is ~55 bytes instead
    # of 12 KB — the 10^8-conv grouped sketch table shrinks ~200×.
    def _params_tuple(self) -> tuple:
        return (self.p,)

    def _params_bytes(self) -> bytes:
        return struct.pack("<B", self.p)

    def _sparse_entry_bytes(self) -> int:
        return 3 if self.p <= 16 else 5

    def _payload_bytes(self) -> bytes:
        nz = np.flatnonzero(self.registers)
        e = self._sparse_entry_bytes()
        if 5 + e * len(nz) < (self.m // 4) * 3:
            idx_dtype = "<u2" if self.p <= 16 else "<u4"
            tag = 2 if self.p <= 16 else 1
            return (
                struct.pack("<BI", tag, len(nz))
                + nz.astype(idx_dtype).tobytes()
                + self.registers[nz].tobytes()
            )
        r = self.registers.astype(np.uint32).reshape(-1, 4)
        word = r[:, 0] | (r[:, 1] << 6) | (r[:, 2] << 12) | (r[:, 3] << 18)  # 24 bits
        out = np.empty((len(word), 3), dtype=np.uint8)
        out[:, 0] = word & 0xFF
        out[:, 1] = (word >> 8) & 0xFF
        out[:, 2] = (word >> 16) & 0xFF
        return b"\x00" + out.tobytes()

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "HllSketch":
        (p,) = struct.unpack("<B", params)
        sk = cls.__new__(cls)
        Sketch.__init__(sk, funnel)
        sk.p = p
        sk.m = 1 << p
        dense_len = (sk.m // 4) * 3
        if len(payload) == dense_len:  # legacy untagged dense
            packed = payload
        elif payload[0] == 0:
            packed = payload[1:]
        else:
            (nnz,) = struct.unpack_from("<I", payload, 1)
            idx_dtype = np.uint16 if payload[0] == 2 else np.uint32
            idx = np.frombuffer(payload, dtype=idx_dtype, count=nnz, offset=5)
            off = 5 + idx.itemsize * nnz
            rho = np.frombuffer(payload, dtype=np.uint8, count=nnz, offset=off)
            sk.registers = np.zeros(sk.m, dtype=np.uint8)
            sk.registers[idx.astype(np.int64)] = rho
            return sk
        b = np.frombuffer(packed, dtype=np.uint8).reshape(-1, 3).astype(np.uint32)
        word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        regs = np.empty((len(word), 4), dtype=np.uint8)
        regs[:, 0] = word & 0x3F
        regs[:, 1] = (word >> 6) & 0x3F
        regs[:, 2] = (word >> 12) & 0x3F
        regs[:, 3] = (word >> 18) & 0x3F
        sk.registers = regs.reshape(-1)
        return sk

    # -- updates --------------------------------------------------------------
    def update_hashes(self, h1: np.ndarray) -> None:
        shift = np.uint64(64 - self.p)
        idx = (h1 >> shift).astype(np.int64)
        w = h1 << np.uint64(self.p)  # remaining 64-p bits at the top
        rho = _leading_zero_rho(w, 64 - self.p)
        np.maximum.at(self.registers, idx, rho)

    def ingest_hashes(self, h1: np.ndarray, h2: np.ndarray) -> int:
        self.update_hashes(h1)
        return 0

    def update(self, values) -> None:
        _, h1, _ = hash_column(values, self.funnel)
        self.update_hashes(h1)

    def put(self, e) -> None:
        _, h1, _ = element_to_hash(e)
        self.update_hashes(np.array([h1], dtype=np.uint64))

    # -- estimate / merge -------------------------------------------------------
    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        e = _alpha(self.m) * self.m * self.m / np.sum(np.exp2(-regs))
        if e <= 2.5 * self.m:
            v = int(np.count_nonzero(self.registers == 0))
            if v > 0:
                return self.m * math.log(self.m / v)
        return float(e)

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    def merge(self, other: "HllSketch") -> "HllSketch":
        self._check_compatible(other)
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def fold_to(self, p: int) -> "HllSketch":
        """EXACT precision fold p₁ → p ≤ p₁: returns a new sketch
        byte-identical to one built directly at precision p from the same
        elements — so tables of sketches built at different precisions can
        merge (fold the finer one first).

        Why exact: for an element with high-p index i₁ and register value
        ρ₁, the low-p remaining-bit stream is [low s=p₁−p bits of i₁][old
        stream]. If those s bits are nonzero, the new ρ is their
        leading-zero count + 1 (the same for every element in bucket i₁ —
        independent of ρ₁); if zero, the new ρ is s + ρ₁. max() commutes
        with both maps, so folding registers equals folding elements."""
        if not 4 <= p <= self.p:
            raise ValueError(f"can only fold to 4 <= p <= {self.p}, got {p}")
        out = HllSketch(p, self.funnel)
        if p == self.p:
            out.registers = self.registers.copy()
            return out
        s = self.p - p
        r1 = self.registers
        idx1 = np.arange(self.m, dtype=np.uint64)
        discarded = idx1 & np.uint64((1 << s) - 1)
        # leading-zero rho of the s discarded bits (s+1 where they are 0)
        rho_d = _leading_zero_rho(discarded << np.uint64(64 - s), s)
        contrib = np.where(
            discarded == 0, r1.astype(np.uint32) + np.uint32(s), rho_d.astype(np.uint32)
        )
        vals = np.where(r1 > 0, contrib, 0).astype(np.uint8)
        np.maximum.at(out.registers, (idx1 >> np.uint64(s)).astype(np.int64), vals)
        return out

    def relative_error_bound(self, nsigma: float = 3.0) -> float:
        return nsigma * 1.04 / math.sqrt(self.m)

    def union_estimate(self, other: "HllSketch") -> float:
        """|A ∪ B| without mutating either sketch (merge of copies)."""
        self._check_compatible(other)
        regs = np.maximum(self.registers, other.registers)
        tmp = HllSketch(self.p, self.funnel)
        tmp.registers = regs
        return tmp.estimate()

    def intersect_estimate(self, other: "HllSketch") -> float:
        """|A ∩ B| by inclusion–exclusion: |A| + |B| − |A∪B|.

        Error compounds (each term carries its own ±1.04/√m), so this is an
        indication, not a bounded estimate — documented deviation; the
        reference exposes no intersection either (SURVEY.md §2.3 set ops)."""
        self._check_compatible(other)
        return max(0.0, self.estimate() + other.estimate() - self.union_estimate(other))

    def is_empty(self) -> bool:
        return not self.registers.any()

    def clear(self) -> None:
        self.registers[:] = 0
