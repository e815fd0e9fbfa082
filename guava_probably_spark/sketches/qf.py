"""Quotient filter — the third classic filter family beside Bloom and cuckoo.

Bender, Farach-Colton, Johnson, Kraner, Kuszmaul, Medjedovic, Montes,
Shetty, Spillane, Zadok, "Don't Thrash: How to Cache Your Hash on Flash"
(PVLDB 5(11), 2012).  A quotient filter stores the multiset of p-bit
fingerprints fp = top-p-bits(h) split into a q-bit *quotient* (home slot)
and an r-bit *remainder*; remainders live in a table of 2^q slots at
(r + 3) bits per slot — the 3 metadata bits (is_occupied, is_continuation,
is_shifted) recover, losslessly, which remainder belongs to which quotient
after linear-probe shifting.  Because the table is a lossless encoding of
the sorted fingerprint multiset, two quotient filters merge by a single
sorted-stream merge of their fingerprints — the property that makes the QF
the filter of choice for LSM/compaction workloads, and here for Spark
tree-folds.

Extends the guava-probably ``ProbabilisticFilter`` contract (SURVEY.md §2
rows 1-16 — put/putAll/mightContain/remove/isCompatible/writeTo/readFrom/
expectedFpp semantics; the reference ships Bloom + cuckoo, this is a
north-rule extension completing the filter-family triangle):

- **Canonical state**: the in-memory view is the sorted fingerprint array;
  the serialized payload is the classic bit-packed QF table derived
  canonically from it (runs laid out by ``start_i = prefix_i +
  running_max(quotient_i - prefix_i)``, the offline construction).  State
  is a pure function of the inserted fingerprint (multi)set, so merges are
  **byte-associative, commutative and (under set semantics) idempotent** —
  the bloom/HLL/CMS blob-equality class, and whole-build == merged-parts.
- **Deletable**: ``remove`` deletes one stored instance of the element's
  fingerprint (cuckoo-style; a collision delete carries the same caveat as
  the reference's cuckoo ``remove`` — only delete elements known present).
  ``dedup_build=False`` keeps duplicate fingerprints (multiset semantics)
  so per-copy deletes are safe; the default builds set-semantics tables
  (half the slots of a multiset build on duplicate-heavy streams).
- **Space**: 2^q · (r + 3) bits ≈ n/α · (log2(α/ε) + 3) bits — within ~1.2×
  of cuckoo at the same FPP, with in-order fingerprint enumeration the
  cuckoo table cannot offer (that is what buys the canonical merge).
- ``expected_fpp`` is occupancy-honest: 1 − (1 − 2^−p)^n_distinct, the
  exact hard-collision probability at the current fill, ≈ α·2^−r at design
  load.

Batch probes (the Spark hot path) run against the decoded sorted array via
``searchsorted`` — O(log n) per probe, fully vectorized; the packed table
is the at-rest / on-the-wire form, decoded once in ``from_bytes``.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import (
    FUNNEL_UTF8,
    KIND_QF,
    Sketch,
    element_to_hash,
    hash_column,
    register_kind,
)


def qf_geometry(capacity: int, fpp: float) -> tuple[int, int]:
    """(q quotient bits, r remainder bits) for ``capacity`` elements at
    design load α ≤ 0.95 with hard-collision rate α·2^−r ≤ fpp."""
    if capacity <= 0:
        capacity = 1
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    q = max(4, math.ceil(math.log2(capacity / 0.95)))
    alpha = capacity / float(1 << q)
    r = max(2, math.ceil(math.log2(max(alpha, 1e-3) / fpp)))
    if q + r > 64:
        raise ValueError(f"fingerprint q+r={q + r} exceeds 64 bits")
    return q, r


_PACK_CHUNK = 1 << 20  # values per packing chunk; a multiple of 8, so every
# full chunk spans a whole number of bytes for any width and chunked output
# is byte-identical to a one-shot pack


def _pack_bits(values: np.ndarray, width: int) -> np.ndarray:
    """Pack n width-bit values (little-endian bit order) into uint64 words.

    Goes through a (chunk, width) u8 bit matrix + ``np.packbits`` — all C
    loops (a scattered ``bitwise_or.at`` over per-value word positions
    measured ~10× slower on the 2^q-slot tables this serializes).  Packing
    runs in ``_PACK_CHUNK``-value chunks so the transient bit matrix is
    bounded (~``width`` MB) instead of O(n·width) — at serving load
    (capacity 1e9, q=30, r=10) a one-shot matrix would be a ~10 GB
    transient for a ~1.7 GB blob.  Output bytes are identical either way."""
    n = len(values)
    nwords = (n * width + 63) // 64
    buf = np.zeros(nwords * 8, dtype=np.uint8)
    if n == 0:
        return buf.view(np.uint64)
    sh = np.arange(width, dtype=np.uint64)
    off = 0
    for s in range(0, n, _PACK_CHUNK):
        v = values[s : s + _PACK_CHUNK].astype(np.uint64)
        bits = ((v[:, None] >> sh) & np.uint64(1)).astype(np.uint8)
        by = np.packbits(bits.ravel(), bitorder="little")
        buf[off : off + len(by)] = by
        off += len(by)  # full chunks advance exactly CHUNK*width/8 bytes
    return buf.view(np.uint64)


def _unpack_bits(words: np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`_pack_bits`; returns n uint64 values."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    bits = np.unpackbits(
        words.view(np.uint8), bitorder="little", count=n * width
    ).reshape(n, width)
    # one OR pass per bit plane: O(width·n) u64 ops, no (n, width) u64
    # temporary (a broadcast multiply-reduce there measured ~15× slower)
    out = np.zeros(n, dtype=np.uint64)
    for k in range(width):
        out |= bits[:, k].astype(np.uint64) << np.uint64(k)
    return out


def _gather_packed(
    words: np.ndarray, idx: np.ndarray, width: int, n_slots: int
) -> np.ndarray:
    """Values at SORTED slot indices ``idx`` from a packed bit array —
    the decode twin of the chunked pack: unpacks ``_PACK_CHUNK`` slots at
    a time (chunk byte-offsets are whole bytes since CHUNK·width % 8 == 0)
    so decoding a dense 2^q-slot table never materializes an
    O(n_slots) uint64 temporary."""
    out = np.zeros(len(idx), dtype=np.uint64)
    if len(idx) == 0:
        return out
    bview = words.view(np.uint8)
    for s in range(0, n_slots, _PACK_CHUNK):
        e = min(s + _PACK_CHUNK, n_slots)
        lo = int(np.searchsorted(idx, s))
        hi = int(np.searchsorted(idx, e))
        if lo == hi:
            continue
        b0 = s * width // 8
        nbits = (e - s) * width
        bits = np.unpackbits(
            bview[b0 : b0 + (nbits + 7) // 8], bitorder="little", count=nbits
        ).reshape(e - s, width)
        rows = bits[idx[lo:hi] - s]
        vals = np.zeros(hi - lo, dtype=np.uint64)
        for k in range(width):
            vals |= rows[:, k].astype(np.uint64) << np.uint64(k)
        out[lo:hi] = vals
    return out


def _bits_at(words: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Boolean test of bit positions ``idx`` in a packed bit array."""
    return (words[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1) != 0


@register_kind
class QuotientFilterSketch(Sketch):
    KIND = KIND_QF

    def __init__(
        self,
        capacity: int,
        fpp: float = 0.01,
        funnel: int = FUNNEL_UTF8,
        dedup_build: bool = True,
    ):
        super().__init__(funnel)
        self.capacity = int(capacity)
        self.design_fpp = float(fpp)
        self.qbits, self.rbits = qf_geometry(self.capacity, self.design_fpp)
        self.dedup_build = bool(dedup_build)
        # canonical in-memory state: the sorted fingerprint (multi)set.
        # Ingest batches buffer in _pending and consolidate lazily (one
        # sort per consolidation instead of one per Arrow batch — the
        # distributed build path ingests many batches per partition and
        # only serializes once).
        self._sorted = np.zeros(0, dtype=np.uint64)
        self._pending: list[np.ndarray] = []

    @property
    def fps(self) -> np.ndarray:
        if self._pending:
            merged = np.concatenate([self._sorted, *self._pending])
            merged.sort(kind="stable")
            if self.dedup_build:
                merged = np.unique(merged)
            self._sorted = merged
            self._pending = []
        return self._sorted

    @fps.setter
    def fps(self, value: np.ndarray) -> None:
        self._sorted = value
        self._pending = []

    # -- geometry -------------------------------------------------------------
    @property
    def pbits(self) -> int:
        return self.qbits + self.rbits

    def _fingerprints(self, h1: np.ndarray) -> np.ndarray:
        shift = np.uint64(64 - self.pbits)
        return h1.astype(np.uint64) >> shift

    def _params_tuple(self) -> tuple:
        return (
            self.capacity,
            round(self.design_fpp, 12),
            self.qbits,
            self.rbits,
            self.dedup_build,
        )

    def _params_bytes(self) -> bytes:
        return struct.pack(
            "<qdBBB",
            self.capacity,
            self.design_fpp,
            self.qbits,
            self.rbits,
            int(self.dedup_build),
        )

    # -- serialization: canonical bit-packed QF table --------------------------
    def _table_layout(self):
        """(starts, counts, uq, slot_idx, total_slots) of the canonical
        (non-circular, overflow-tailed) table for the current fingerprints."""
        n = len(self.fps)
        slots = 1 << self.qbits
        if n == 0:
            return (
                np.zeros(0, np.int64),
                np.zeros(0, np.int64),
                np.zeros(0, np.int64),
                np.zeros(0, np.int64),
                slots,
            )
        quot = (self.fps >> np.uint64(self.rbits)).astype(np.int64)
        uq, counts = np.unique(quot, return_counts=True)
        prefix = np.concatenate(([0], np.cumsum(counts)[:-1]))
        # run i starts at max(q_i, end of run i-1):
        # s_i = prefix_i + running_max(q_i - prefix_i)
        starts = prefix + np.maximum.accumulate(uq - prefix)
        total_slots = max(slots, int(starts[-1] + counts[-1]))
        slot_idx = np.repeat(starts, counts) + (
            np.arange(n, dtype=np.int64) - np.repeat(prefix, counts)
        )
        return starts, counts, uq, slot_idx, total_slots

    # Below this load the packed table is mostly empty slots: serialize the
    # sorted fingerprint array itself (the table is a lossless re-encoding
    # of it) — same size at 8 B/fp vs (r+3)/8 B over 2^q slots, but O(n)
    # instead of O(2^q) to encode/decode.  This is what tree-fold PARTIALS
    # ship (each partition holds a fraction of the keys); the final
    # serving-load blob still serializes the classic table.  The mode is a
    # pure function of the state, so blob determinism/byte-equality across
    # merge orders is unaffected.
    _SPARSE_LOAD_DEN = 4

    def _payload_bytes(self) -> bytes:
        n = len(self.fps)
        if n * self._SPARSE_LOAD_DEN < (1 << self.qbits):
            return struct.pack("<qq", n, -1) + self.fps.tobytes()
        starts, counts, uq, slot_idx, total_slots = self._table_layout()
        nwords = (total_slots + 63) // 64
        occ = np.zeros(nwords, dtype=np.uint64)
        cont = np.zeros(nwords, dtype=np.uint64)
        shift = np.zeros(nwords, dtype=np.uint64)
        if n:
            bit = np.uint64(1)
            np.bitwise_or.at(occ, uq >> 6, bit << (uq & 63).astype(np.uint64))
            within = np.arange(n, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(counts)[:-1])), counts
            )
            cont_idx = slot_idx[within > 0]
            np.bitwise_or.at(
                cont, cont_idx >> 6, bit << (cont_idx & 63).astype(np.uint64)
            )
            home = np.repeat(uq, counts)
            sh_idx = slot_idx[slot_idx != home]
            np.bitwise_or.at(
                shift, sh_idx >> 6, bit << (sh_idx & 63).astype(np.uint64)
            )
        # remainders at their slots (empty slots stay 0), packed in slot
        # chunks: slot_idx is strictly increasing, so each chunk's occupants
        # are one searchsorted range — no O(total_slots) u64 temporary
        # (8·2^q bytes, ~8 GB at q=30) is ever materialized
        rem_nwords = (total_slots * self.rbits + 63) // 64
        rem_buf = np.zeros(rem_nwords * 8, dtype=np.uint8)
        rmask = np.uint64((1 << self.rbits) - 1)
        off = 0
        for s in range(0, total_slots, _PACK_CHUNK):
            e = min(s + _PACK_CHUNK, total_slots)
            chunk = np.zeros(e - s, dtype=np.uint64)
            if n:
                lo = int(np.searchsorted(slot_idx, s))
                hi = int(np.searchsorted(slot_idx, e))
                chunk[slot_idx[lo:hi] - s] = self.fps[lo:hi] & rmask
            by = _pack_bits(chunk, self.rbits).view(np.uint8)[
                : ((e - s) * self.rbits + 7) // 8
            ]
            rem_buf[off : off + len(by)] = by
            off += len(by)
        rem_words = rem_buf.view(np.uint64)
        return (
            struct.pack("<qq", n, total_slots)
            + occ.tobytes()
            + cont.tobytes()
            + shift.tobytes()
            + rem_words.tobytes()
        )

    @classmethod
    def _from_parts(
        cls, funnel: int, params: bytes, payload: bytes
    ) -> "QuotientFilterSketch":
        capacity, fpp, qbits, rbits, dedup = struct.unpack("<qdBBB", params)
        sk = cls.__new__(cls)
        Sketch.__init__(sk, funnel)
        sk.capacity, sk.design_fpp = capacity, fpp
        sk.qbits, sk.rbits, sk.dedup_build = qbits, rbits, bool(dedup)
        if qbits + rbits > 64 or rbits == 0:
            raise ValueError(f"corrupt qf geometry q={qbits} r={rbits}")
        n, total_slots = struct.unpack_from("<qq", payload, 0)
        if total_slots == -1:  # sparse transport mode: raw sorted fps
            if n < 0 or len(payload) != 16 + 8 * n or n * cls._SPARSE_LOAD_DEN >= (
                1 << qbits
            ):
                raise ValueError(
                    f"corrupt sparse qf payload: {len(payload)} bytes for n={n}"
                )
            fps = np.frombuffer(payload, dtype=np.uint64, offset=16)
            pb = qbits + rbits
            if (fps[1:] < fps[:-1]).any() or (
                n and pb < 64 and (fps >> np.uint64(pb)).any()
            ):
                raise ValueError("corrupt sparse qf payload: not canonical")
            sk.fps = fps.copy()
            return sk
        nwords = (total_slots + 63) // 64
        rem_nwords = (total_slots * rbits + 63) // 64
        expect = 16 + (3 * nwords + rem_nwords) * 8
        if n < 0 or total_slots < (1 << qbits) or len(payload) != expect:
            raise ValueError(
                f"corrupt qf payload: {len(payload)} bytes, expected {expect}"
            )
        buf = np.frombuffer(payload, dtype=np.uint64, offset=16)
        occ = buf[:nwords]
        cont = buf[nwords : 2 * nwords]
        shift = buf[2 * nwords : 3 * nwords]
        rem_words = buf[3 * nwords :]
        used_words = occ | cont | shift
        used = np.nonzero(
            np.unpackbits(
                used_words.view(np.uint8), bitorder="little", count=total_slots
            )
        )[0].astype(np.int64)
        if len(used) != n:
            raise ValueError(f"corrupt qf table: {len(used)} used slots for n={n}")
        uq = np.nonzero(
            np.unpackbits(occ.view(np.uint8), bitorder="little", count=total_slots)
        )[0].astype(np.int64)
        if n == 0:
            sk.fps = np.zeros(0, dtype=np.uint64)
            return sk
        is_start = ~_bits_at(cont, used)
        if not is_start[0] or is_start.sum() != len(uq) or (uq >= (1 << qbits)).any():
            raise ValueError("corrupt qf table: run/occupied mismatch")
        run_id = np.cumsum(is_start) - 1
        quot = uq[run_id]
        fps = (quot.astype(np.uint64) << np.uint64(rbits)) | _gather_packed(
            rem_words, used, rbits, total_slots
        )
        if (fps[1:] < fps[:-1]).any():
            # canonical tables enumerate fingerprints in sorted order
            raise ValueError("corrupt qf table: fingerprints not in canonical order")
        sk.fps = fps
        return sk

    # -- inserts ---------------------------------------------------------------
    def _insert_fps(self, fp: np.ndarray) -> np.ndarray:
        """Insert fingerprints; returns 'was new' per element (pre-insert)."""
        if len(fp) == 0:
            return np.zeros(0, dtype=bool)
        pos = np.searchsorted(self.fps, fp)
        pos = np.minimum(pos, len(self.fps) - 1) if len(self.fps) else pos
        existed = (
            self.fps[pos] == fp if len(self.fps) else np.zeros(len(fp), dtype=bool)
        )
        # merge-in-place (searchsorted + insert): one O(n + batch) memcpy
        # per call instead of a full re-sort, so the guava-style scalar
        # streaming surface (put per element) is O(n^2) memcpy, not
        # O(n^2 log n) sort — the accessed `self.fps` property above has
        # already consolidated any _pending batches into _sorted
        fresh = np.unique(fp[~existed]) if self.dedup_build else np.sort(fp)
        if len(fresh):
            at = np.searchsorted(self._sorted, fresh)
            self._sorted = np.insert(self._sorted, at, fresh)
        return ~existed

    def put_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        return self._insert_fps(self._fingerprints(h1))

    def ingest_hashes(self, h1: np.ndarray, h2: np.ndarray) -> int:
        # build-path fast ingest: append raw fingerprints, consolidate once
        # at serialize/probe time (nobody consumes per-element newness here)
        fp = self._fingerprints(h1)
        if len(fp):
            self._pending.append(fp)
        return 0  # a quotient filter cannot overflow (table grows a tail)

    def update(self, values) -> np.ndarray:
        _, h1, h2 = hash_column(values, self.funnel)
        return self.put_hashes(h1, h2)

    # -- probes ----------------------------------------------------------------
    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        fp = self._fingerprints(h1)
        if len(self.fps) == 0:
            return np.zeros(len(fp), dtype=bool)
        pos = np.minimum(np.searchsorted(self.fps, fp), len(self.fps) - 1)
        return self.fps[pos] == fp

    def might_contain_batch(self, values) -> np.ndarray:
        _, h1, h2 = hash_column(values, self.funnel)
        return self.contains_hashes(h1, h2)

    # -- deletes ---------------------------------------------------------------
    def remove_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Delete ONE stored instance per matching probe; returns 'removed'.
        Under dedup_build (set semantics) deleting a fingerprint shared by
        colliding elements false-negatives the survivors — same caveat as
        the reference cuckoo remove; use dedup_build=False for delete
        workflows."""
        fp = self._fingerprints(h1)
        removed = np.zeros(len(fp), dtype=bool)
        if len(self.fps) == 0 or len(fp) == 0:
            return removed
        order = np.argsort(fp, kind="stable")
        uniq, want = np.unique(fp, return_counts=True)
        lo = np.searchsorted(self.fps, uniq, side="left")
        hi = np.searchsorted(self.fps, uniq, side="right")
        have = hi - lo
        take = np.minimum(want, have)
        # mark the first `take[g]` probes (stable order) of each group removed
        group_start = np.concatenate(([0], np.cumsum(want)[:-1]))
        within = np.arange(len(fp)) - np.repeat(group_start, want)
        removed[order] = within < np.repeat(take, want)
        # drop `take[g]` stored copies from the head of each matching range
        keep = np.ones(len(self.fps), dtype=bool)
        drop_idx = np.repeat(lo, take) + (
            np.arange(int(take.sum())) - np.repeat(np.concatenate(([0], np.cumsum(take)[:-1])), take)
        )
        keep[drop_idx] = False
        self.fps = self.fps[keep]
        return removed

    # -- guava-style scalar surface --------------------------------------------
    def put(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(
            self.put_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0]
        )

    def put_all(self, elements) -> bool:
        return bool(self.update(list(elements)).all())

    def might_contain(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(
            self.contains_hashes(
                np.array([h1], np.uint64), np.array([h2], np.uint64)
            )[0]
        )

    def contains_all(self, elements) -> bool:
        return bool(self.might_contain_batch(elements).all())

    def remove(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(
            self.remove_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0]
        )

    def remove_all(self, elements) -> int:
        _, h1, h2 = hash_column(elements, self.funnel)
        return int(self.remove_hashes(h1, h2).sum())

    # -- merge -----------------------------------------------------------------
    def merge(self, other: "QuotientFilterSketch") -> "QuotientFilterSketch":
        # lazy like ingest: append the other side's fingerprints and let the
        # next consolidation do ONE sort — a driver fold over P partials is
        # O(total log total) instead of P re-sorts of the accumulator
        self._check_compatible(other)
        fp_other = other.fps
        if len(fp_other):
            self._pending.append(fp_other)
        return self

    # -- cross-parameter fold --------------------------------------------------
    def fold_to(self, rbits: int) -> "QuotientFilterSketch":
        """EXACT fold to fewer remainder bits: since fp = quot·2^r + rem,
        dropping Δ = r − r' low remainder bits is ``fp >> Δ`` — the folded
        fingerprint set equals that of a filter built directly at (q, r')
        over the same keys (FPP grows 2^Δ×), and the fold commutes with
        merge byte-for-byte (shift-then-union == union-then-shift; dedup
        after either).  The mixed-parameter sketch-table story: fold the
        finer side down, then merge — SQL-reachable via
        ``sketch_fold(sketch, r')``."""
        rbits = int(rbits)
        if rbits > self.rbits:
            raise ValueError(f"cannot fold r={self.rbits} UP to {rbits}")
        if rbits < 1:
            raise ValueError("rbits must be >= 1")
        delta = self.rbits - rbits
        out = QuotientFilterSketch.__new__(QuotientFilterSketch)
        Sketch.__init__(out, self.funnel)
        out.capacity = self.capacity
        out.design_fpp = min(1.0 - 1e-12, self.design_fpp * (1 << delta))
        out.qbits, out.rbits = self.qbits, rbits
        out.dedup_build = self.dedup_build
        fps = self.fps >> np.uint64(delta)
        if self.dedup_build:
            fps = np.unique(fps)
        out._sorted = fps
        out._pending = []
        return out

    # -- introspection ---------------------------------------------------------
    def expected_fpp(self) -> float:
        n = len(self.fps)
        if not self.dedup_build and n:
            # distinct stored fingerprints (sorted → boundary count)
            n = int((np.diff(self.fps) != 0).sum()) + 1
        if n == 0:
            return 0.0
        return -math.expm1(n * math.log1p(-(2.0 ** -self.pbits)))

    def fpp(self) -> float:
        return self.design_fpp

    @property
    def size(self) -> int:
        return len(self.fps)

    def is_empty(self) -> bool:
        return len(self.fps) == 0

    def clear(self) -> None:
        self.fps = np.zeros(0, dtype=np.uint64)

    def load_factor(self) -> float:
        return len(self.fps) / float(1 << self.qbits)
