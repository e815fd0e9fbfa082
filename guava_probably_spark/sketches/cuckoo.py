"""Cuckoo filter — deletable membership sketch, semi-sort bucket encoding.

From-scratch vectorized re-expression of guava-probably's ``CuckooFilter``
semantics (reference: bdupras/guava-probably
``src/main/java/com/duprasville/guava/probably/{CuckooFilter,CuckooTable,
CuckooStrategies}.java`` — semantics only, SURVEY.md §0/§2 rows 1-18,
§3.1-3.3) per Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014:

- geometry: b entries/bucket (default 4), f = ⌈log2(2b/fpp)⌉ fingerprint
  bits, m = ⌈capacity/(α_b·b)⌉ buckets with load factor α = {2: 0.84,
  4: 0.955, 8: 0.98}; m is arbitrary (NOT a power of two) — enabled by an
  involutive alt-index in the spirit of the reference's
  MURMUR128_BEALDUPRAS_32 strategy.
- hash pipeline: one murmur3_x64_128 per element; i1 = h1 mod m;
  fp = low f bits of h2, 0 remapped to 1 (0 = empty-slot sentinel);
  alt(i, fp) = (offset(fp) − i) mod m with offset(fp) = fmix64(fp·ODD) mod m
  — an involution for ARBITRARY m: alt(alt(i, fp), fp) == i.  (Our
  arithmetic differs from the reference's — we designed our own involution —
  but the contract property is identical and hypothesis-tested.)
- insert: try i1, then i2; if both full, evict-and-kick random walk up to
  MAX_KICKS=500; on exhaustion the kick chain is ROLLED BACK and put returns
  False — a failed put leaves the filter semantically unchanged, preserving
  the zero-false-negative guarantee for everything previously inserted.
- remove: deletes one matching fingerprint from i1 or i2 (reference hazard
  applies: only remove elements known to have been added).
- merge (putAll(filter)): walk the other table's occupied slots and re-insert
  each fingerprint at (bucket, alt(bucket, fp)) — no original elements needed
  (the distributive-merge enabler, SURVEY.md §3.3).  Returns success flag;
  overflowing entries are counted and reported.
- serialization: semi-sort bucket encoding when b == 4 and 5 ≤ f ≤ 17 (Fan
  et al. §5): per bucket, fingerprints sorted, the 4 high nibbles (only 3876
  nondecreasing 4-tuples) are codebook-encoded into 12 bits + 4·(f−4)-bit
  remainders — saving ~1 bit per entry vs raw packing.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import (
    FUNNEL_UTF8,
    KIND_CUCKOO,
    Sketch,
    element_to_hash,
    hash_column,
    register_kind,
)
from .hashing import _fmix64, _fmix64_s

MAX_KICKS = 500
_ODD = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier
_LOAD_FACTOR = {2: 0.84, 4: 0.955, 8: 0.98}


def cuckoo_geometry(capacity: int, fpp: float, b: int | None = None) -> tuple[int, int, int]:
    """(m buckets, b entries/bucket, f bits/entry) per Fan et al. sizing."""
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    if b is None:
        b = 4  # optimal across practical fpp range (Fan et al. §5.1)
    if b not in _LOAD_FACTOR:
        raise ValueError("entries per bucket must be one of {2, 4, 8}")
    f = max(2, int(math.ceil(math.log2(2.0 * b / fpp))))
    if f > 32:
        # the table stores uint32 fingerprints; a wider f would silently
        # truncate (actual FPP floors at ~2b·2^-32 regardless of request,
        # and an fp with 32 low zero bits would alias the 0=empty sentinel)
        raise ValueError(
            f"fpp={fpp:g} needs {f} fingerprint bits > the 32-bit table "
            f"limit (reachable floor ≈ {2.0 * b / 2**32:.2e})"
        )
    alpha = _LOAD_FACTOR[b]
    m = max(2, int(math.ceil(capacity / (alpha * b))))
    return m, b, f


# --- semi-sort codebook: all nondecreasing 4-tuples of nibbles (3876 < 2^12)
def _build_codebook() -> tuple[np.ndarray, np.ndarray]:
    decode = []
    encode = np.full(16 ** 4, -1, dtype=np.int16)
    code = 0
    for a in range(16):
        for bb in range(a, 16):
            for c in range(bb, 16):
                for d in range(c, 16):
                    decode.append((a, bb, c, d))
                    encode[(a << 12) | (bb << 8) | (c << 4) | d] = code
                    code += 1
    return encode, np.array(decode, dtype=np.uint32)


_ENCODE_LUT, _DECODE_LUT = _build_codebook()


@register_kind
class CuckooSketch(Sketch):
    KIND = KIND_CUCKOO

    def __init__(
        self,
        capacity: int,
        fpp: float = 0.032,
        b: int | None = None,
        funnel: int = FUNNEL_UTF8,
        dedup_build: bool = True,
    ):
        """``dedup_build`` picks the distributed-build ingest semantics:
        True (default) = SET union per (pair, fingerprint) — the right
        choice for membership builds on skewed keys (see ingest_hashes);
        False = guava's multiset puts, REQUIRED for delete workflows:
        under set semantics two keys whose fingerprints collide in one
        pair share a single copy, so removing one makes the other a false
        negative (multiset keeps one copy per insert, and a collided
        remove leaves the shared fingerprint present). SERIALIZED in the
        blob (high bit of the b params byte) so a restored multiset filter
        keeps multiset semantics under the default merge(); excluded from
        is_compatible (set and multiset filters of the same geometry may
        merge — the caller's dedup choice decides the semantics)."""
        super().__init__(funnel)
        self.capacity = int(capacity)
        self.design_fpp = float(fpp)
        self.dedup_build = bool(dedup_build)
        self.m, self.b, self.f = cuckoo_geometry(self.capacity, self.design_fpp, b)
        dtype = np.uint16 if self.f <= 16 else np.uint32
        self.table = np.zeros((self.m, self.b), dtype=dtype)
        self.occ = np.zeros(self.m, dtype=np.int8)
        self._count = 0
        self._rng = np.random.default_rng(0xC0FFEE)

    # ------------------------------------------------------------------ hash
    def _fingerprints(self, h2: np.ndarray) -> np.ndarray:
        fp = h2 & np.uint64((1 << self.f) - 1)
        return np.where(fp == 0, np.uint64(1), fp)  # 0 = empty sentinel

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Involutive alternate bucket for arbitrary m: (offset(fp) − i) mod m."""
        with np.errstate(over="ignore"):
            m = np.uint64(self.m)
            off = _fmix64(fp.astype(np.uint64) * _ODD) % m
            return (off + m - i.astype(np.uint64) % m) % m

    def _alt_scalar(self, i: int, fp: int) -> int:
        off = _fmix64_s((fp * int(_ODD)) & ((1 << 64) - 1)) % self.m
        return (off + self.m - i % self.m) % self.m

    def _index_fp(self, h1: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        i1 = (h1 % np.uint64(self.m)).astype(np.int64)
        fp = self._fingerprints(h2).astype(self.table.dtype)
        return i1, fp

    # ------------------------------------------------------------- placement
    def _place_vectorized(self, tgt: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Try to place each fp into bucket tgt[i] (no eviction). Returns
        placed mask. Intra-batch bucket contention resolved by ranking."""
        n = len(tgt)
        if n == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(tgt, kind="stable")
        st = tgt[order]
        uniq, start_idx, counts = np.unique(st, return_index=True, return_counts=True)
        ranks = np.arange(n) - np.repeat(start_idx, counts)
        free = (self.b - self.occ[st]).astype(np.int64)
        can = ranks < free
        slots = self.occ[st].astype(np.int64) + ranks
        self.table[st[can], slots[can]] = fps[order][can]
        placed_per_bucket = np.minimum(
            counts, np.maximum(self.b - self.occ[uniq].astype(np.int64), 0)
        )
        self.occ[uniq] += placed_per_bucket.astype(np.int8)
        placed = np.zeros(n, dtype=bool)
        placed[order] = can
        self._count += int(can.sum())
        return placed

    def _kick_insert(self, i: int, fp: int) -> bool:
        """Sequential evict-and-relocate with full rollback on failure.

        Bounded depth-first search with backtracking instead of the classic
        single random walk, for two reasons discovered on skewed (power-law
        conv_id) builds where hot keys duplicate-saturate their bucket pair:

        1. Evicting a copy of the fingerprint IN HAND is provably useless —
           it lands in the other bucket of its own pair (the alt-index is an
           involution within the pair), which is full or we would have
           placed there; since slots are fungible, permuting own copies
           never changes reachability. The random walk spends ~c/b of its
           kicks on exactly that (measured: ~every hot-key insert burned the
           full MAX_KICKS, 323 s for one 800k-row merge).
        2. A single chain that hits a dead end (a bucket whose residents all
           lead to full buckets) gives up even when a DIFFERENT victim at an
           earlier bucket would have succeeded — observed as ~1e-3 FALSE
           NEGATIVES on first copies of cold keys whose buckets were clogged
           by saturated neighbors. Backtracking restores the evicted victim
           and tries the next alternative, so failure means no relocation
           sequence of ≤ MAX_KICKS evictions exists, not bad luck.

        Victims are deduped by fingerprint value per bucket (copies are
        fungible). Total evictions are capped at MAX_KICKS; on failure every
        frame is unwound, leaving the filter byte-identical.
        """
        alt = self._alt_scalar(i, fp)
        for b_ in (i, alt):
            if self.occ[b_] < self.b:
                self.table[b_, self.occ[b_]] = fp
                self.occ[b_] += 1
                self._count += 1
                return True

        def _victims(bucket: int, held: int) -> list[int]:
            # one slot per distinct non-held fingerprint, in RANDOM order: a
            # fixed order makes the descent deterministic and it cycles among
            # the same few buckets until the budget burns (measured 6% insert
            # failures at design load vs 0 for the random walk); shuffling
            # restores the walk's cycle-escaping randomness while keeping
            # backtracking
            row = self.table[bucket]
            out: list[int] = []
            seen: set[int] = set()
            for j in range(self.b):
                v = int(row[j])
                if v != held and v not in seen:
                    seen.add(v)
                    out.append(j)
            if len(out) > 1:
                self._rng.shuffle(out)
            return out

        evictions = 0
        for root in (i, alt):
            # frame: [bucket, held fp, victim slots, next victim idx,
            #         (slot, victim) eviction made INTO the child frame]
            stack: list[list] = [[root, fp, _victims(root, fp), 0, None]]
            while stack:
                f = stack[-1]
                bucket, held, cands, idx = f[0], f[1], f[2], f[3]
                if idx >= len(cands) or evictions >= MAX_KICKS:
                    # dead end (or budget spent): unwind one frame, undoing
                    # the eviction that spawned it; when the budget is spent
                    # this branch repeats until the stack is empty and the
                    # filter is byte-identical to its pre-call state
                    stack.pop()
                    if stack:
                        parent = stack[-1]
                        slot, victim = parent[4]
                        self.table[parent[0], slot] = victim
                        parent[4] = None
                    continue
                f[3] += 1
                j = cands[idx]
                victim = int(self.table[bucket, j])
                dest = self._alt_scalar(bucket, victim)
                evictions += 1
                self.table[bucket, j] = held  # evict victim, keep held here
                if self.occ[dest] < self.b:
                    self.table[dest, self.occ[dest]] = victim
                    self.occ[dest] += 1
                    self._count += 1
                    return True
                f[4] = (j, victim)
                stack.append([dest, victim, _victims(dest, victim), 0, None])
            if evictions >= MAX_KICKS:
                break
        return False

    def put_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        i1, fp = self._index_fp(h1, h2)
        return self._insert(i1, fp)

    def _insert(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        n = len(i1)
        success = np.zeros(n, dtype=bool)
        if n == 0:
            return success
        placed = self._place_vectorized(i1, fp)
        success |= placed
        rest = ~placed
        if rest.any():
            i2 = self._alt(i1[rest].astype(np.uint64), fp[rest]).astype(np.int64)
            placed2 = self._place_vectorized(i2, fp[rest])
            success[np.nonzero(rest)[0][placed2]] = True
            # vectorized duplicate-saturation pre-filter: a pair {i1, i2}
            # holds at most 2b copies of one fingerprint, and once it is
            # entirely fp the kick chain provably cannot free a slot (every
            # victim is fp; its alt stays inside the pair). Skewed keys
            # (power-law conv_id) make this the COMMON residue case — the
            # scalar kick loop measured minutes on an 800k-row transcripts
            # build vs milliseconds with this mask.
            residue = np.nonzero(rest)[0][~placed2]
            if len(residue):
                ri1 = i1[residue]
                ri2 = self._alt(ri1.astype(np.uint64), fp[residue]).astype(np.int64)
                rfp = fp[residue][:, None]
                sat = (self.table[ri1] == rfp).all(axis=1) & (
                    self.table[ri2] == rfp
                ).all(axis=1)
                for k in residue[~sat]:
                    success[k] = self._kick_insert(int(i1[k]), int(fp[k]))
        return success

    # --------------------------------------------------------------- queries
    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        i1, fp = self._index_fp(h1, h2)
        found1 = (self.table[i1] == fp[:, None]).any(axis=1)
        i2 = self._alt(i1.astype(np.uint64), fp).astype(np.int64)
        found2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return found1 | found2

    def ingest_hashes(self, h1: np.ndarray, h2: np.ndarray) -> int:
        """Distributed-build ingest: SET semantics (first copy wins).
        Returns the number of elements that did NOT fit (capacity overflow —
        each one is a would-be false negative the build must surface).

        put_hashes keeps guava's multiset behavior (up to 2b copies of a key,
        preserving put/remove symmetry). The build path instead dedups each
        batch against the table and itself: membership needs one copy, and
        at power-law key scale duplicate copies saturate hot pairs, waste
        2b slots per hot key, and wall off neighboring cold keys into
        insert failures = FALSE NEGATIVES (measured 47 FNs over 79k keys on
        an 800k-turn skewed transcripts build; 0 after dedup).

        Delete workflows construct with ``dedup_build=False`` (see __init__)
        to get guava's multiset puts instead.
        """
        if not self.dedup_build:
            success = self.put_hashes(h1, h2)
            return int((~success).sum())
        i1, fp = self._index_fp(h1, h2)
        i2 = self._alt(i1.astype(np.uint64), fp).astype(np.int64)
        present = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        fresh = np.nonzero(~present)[0]
        if not len(fresh):
            return 0
        # first occurrence per (pair, fp) within the batch; pair id is the
        # smaller bucket index (the alt-index is an involution, so both
        # buckets of a key map to the same id)
        pair = np.minimum(i1[fresh], i2[fresh]).astype(np.uint64)
        key = (pair << np.uint64(self.f + 1)) | fp[fresh].astype(np.uint64)
        _, first = np.unique(key, return_index=True)
        sel = fresh[np.sort(first)]
        success = self._insert(i1[sel], fp[sel])
        return int((~success).sum())

    def update(self, values) -> np.ndarray:
        _, h1, h2 = hash_column(values, self.funnel)
        return self.put_hashes(h1, h2)

    def might_contain_batch(self, values) -> np.ndarray:
        _, h1, h2 = hash_column(values, self.funnel)
        return self.contains_hashes(h1, h2)

    # ---------------------------------------------------------------- delete
    def remove_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per element; True if found.
        Sequential (delete is order-sensitive; not the distributed hot path —
        SURVEY.md §2 row 7)."""
        i1, fp = self._index_fp(h1, h2)
        i2 = self._alt(i1.astype(np.uint64), fp).astype(np.int64)
        out = np.zeros(len(i1), dtype=bool)
        for k in range(len(i1)):
            out[k] = self._remove_one(int(i1[k]), int(i2[k]), int(fp[k]))
        return out

    def _remove_one(self, i1: int, i2: int, fp: int) -> bool:
        for b_ in (i1, i2):
            occ = int(self.occ[b_])
            row = self.table[b_, :occ]
            hits = np.nonzero(row == fp)[0]
            if len(hits):
                j = int(hits[0])
                self.table[b_, j] = self.table[b_, occ - 1]  # compact: swap last
                self.table[b_, occ - 1] = 0
                self.occ[b_] -= 1
                self._count -= 1
                return True
        return False

    def remove(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(
            self.remove_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0]
        )

    def remove_all(self, elements) -> bool:
        _, h1, h2 = hash_column(list(elements), self.funnel)
        return bool(self.remove_hashes(h1, h2).all())

    # -- guava-style scalar surface -------------------------------------------
    def put(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(self.put_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0])

    def put_all(self, elements) -> bool:
        return bool(self.update(list(elements)).all())

    def might_contain(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(
            self.contains_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0]
        )

    def contains_all(self, elements) -> bool:
        return bool(self.might_contain_batch(list(elements)).all())

    # ----------------------------------------------------------------- merge
    def merge(self, other: "CuckooSketch", dedup: bool | None = None) -> "CuckooSketch":
        """putAll(filter). ``dedup`` defaults to ``self.dedup_build``: a
        set-union build (dedup_build=True, the distributed default) collapses
        duplicate copies of a key, while a multiset filter
        (dedup_build=False, the delete workflow) re-inserts every copy so
        put/remove symmetry survives the merge — including after a
        to_bytes/from_bytes round trip, which preserves the flag. Pass an
        explicit bool to override per call; see merge_counted for details."""
        ok, overflow = self.merge_counted(other, dedup=dedup)
        if not ok:
            raise OverflowError(
                f"cuckoo merge overflow: {overflow} fingerprints did not fit "
                f"(combined load exceeds capacity {self.capacity})"
            )
        return self

    def merge_counted(
        self, other: "CuckooSketch", dedup: bool | None = None
    ) -> tuple[bool, int]:
        """putAll(filter): fingerprint walk + re-insert (SURVEY.md §3.3).
        Returns (all_fit, overflow_count).

        ``dedup=None`` (default) follows ``self.dedup_build``, so set-union
        filters dedup and multiset (delete-workflow) filters re-insert
        every copy without call sites having to thread the flag.

        ``dedup=True`` takes SET union at pair granularity: an
        incoming fingerprint already present in its destination pair is
        skipped (not an overflow). Letting duplicate copies accumulate
        across merges saturates hot pairs on skewed data and turns cold-key
        inserts into false negatives (see ingest_hashes) — membership
        builds always want this. The cost: put/remove symmetry does NOT
        survive a dedup merge (an element put() N times across the two
        filters keeps ONE copy, so one remove() deletes it entirely).
        Delete workflows that count on N puts surviving N−1 removes must
        merge with ``dedup=False``, which re-inserts every copy exactly as
        guava-probably's putAll does. Genuine capacity overflow is counted
        either way.
        """
        if dedup is None:
            dedup = self.dedup_build
        self._check_compatible(other)
        mask = np.arange(other.b)[None, :] < other.occ[:, None]
        buckets, slots = np.nonzero(mask)
        fps = other.table[buckets, slots]
        b64 = buckets.astype(np.int64)
        if not dedup:
            success = self._insert(b64, fps)
            overflow = int((~success).sum())
            return overflow == 0, overflow
        alt = self._alt(b64.astype(np.uint64), fps).astype(np.int64)
        present = (self.table[b64] == fps[:, None]).any(axis=1) | (
            self.table[alt] == fps[:, None]
        ).any(axis=1)
        fresh = np.nonzero(~present)[0]
        if not len(fresh):
            return True, 0
        pair = np.minimum(b64[fresh], alt[fresh]).astype(np.uint64)
        key = (pair << np.uint64(self.f + 1)) | fps[fresh].astype(np.uint64)
        _, first = np.unique(key, return_index=True)
        sel = fresh[np.sort(first)]
        success = self._insert(b64[sel], fps[sel])
        overflow = int((~success).sum())
        return overflow == 0, overflow

    # --------------------------------------------------------- introspection
    def fpp(self) -> float:
        return self.design_fpp

    def expected_fpp(self) -> float:
        """Expected FPP at current load: 1 − (1 − 2^−f)^(2b·load)."""
        load = self._count / float(self.m * self.b)
        return 1.0 - (1.0 - 2.0 ** -self.f) ** (2.0 * self.b * load)

    @property
    def size(self) -> int:
        return self._count  # exact live-entry count (reference row 11)

    def load_factor(self) -> float:
        return self._count / float(self.m * self.b)

    def is_empty(self) -> bool:
        return self._count == 0

    def clear(self) -> None:
        self.table[:] = 0
        self.occ[:] = 0
        self._count = 0

    # --------------------------------------------------------- serialization
    def _params_tuple(self) -> tuple:
        return (self.capacity, round(self.design_fpp, 12), self.m, self.b, self.f)

    def _params_bytes(self) -> bytes:
        # dedup_build rides in the high bit of the b byte (b is always small)
        # so multiset filters keep multiset merge semantics across a
        # to_bytes/from_bytes round trip; legacy blobs have the bit clear,
        # which decodes to dedup_build=True — the old behavior.
        b_field = self.b | (0 if self.dedup_build else 0x80)
        return struct.pack(
            "<qdqBBq", self.capacity, self.design_fpp, self.m, b_field, self.f, self._count
        )

    def _semisort_active(self) -> bool:
        return self.b == 4 and 5 <= self.f <= 17

    def _payload_bytes(self) -> bytes:
        if not self._semisort_active():
            return self.table.tobytes()
        # semi-sort: per bucket sort fps; encode sorted high nibbles via
        # codebook (12 bits) + 4 remainders of (f-4) bits each
        srt = np.sort(self.table, axis=1).astype(np.uint64)  # zeros (empty) first
        r = self.f - 4
        high = (srt >> np.uint64(r)).astype(np.int64)  # 4 bits each, nondecreasing
        low = srt & np.uint64((1 << r) - 1)
        key = (high[:, 0] << 12) | (high[:, 1] << 8) | (high[:, 2] << 4) | high[:, 3]
        code = _ENCODE_LUT[key].astype(np.uint64)
        word = code
        shift = 12
        for j in range(4):
            word = word | (low[:, j] << np.uint64(shift))
            shift += r
        nbytes = (12 + 4 * r + 7) // 8
        by = word.astype("<u8").view(np.uint8).reshape(self.m, 8)[:, :nbytes]
        return np.ascontiguousarray(by).tobytes()

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "CuckooSketch":
        capacity, fpp, m, b_field, f, count = struct.unpack("<qdqBBq", params)
        b = b_field & 0x7F
        sk = cls.__new__(cls)
        Sketch.__init__(sk, funnel)
        sk.capacity, sk.design_fpp, sk.m, sk.b, sk.f = capacity, fpp, m, b, f
        sk.dedup_build = not (b_field & 0x80)
        sk._count = count
        sk._rng = np.random.default_rng(0xC0FFEE)
        dtype = np.uint16 if f <= 16 else np.uint32
        if not (b == 4 and 5 <= f <= 17):
            sk.table = np.frombuffer(payload, dtype=dtype).reshape(m, b).copy()
        else:
            r = f - 4
            nbytes = (12 + 4 * r + 7) // 8
            raw = np.frombuffer(payload, dtype=np.uint8).reshape(m, nbytes)
            wide = np.zeros((m, 8), dtype=np.uint8)
            wide[:, :nbytes] = raw
            word = wide.reshape(-1).view("<u8")
            code = (word & np.uint64(0xFFF)).astype(np.int64)
            highs = _DECODE_LUT[code]  # (m, 4)
            fps = np.empty((m, 4), dtype=np.uint64)
            shift = 12
            lowmask = np.uint64((1 << r) - 1)
            for j in range(4):
                low = (word >> np.uint64(shift)) & lowmask
                fps[:, j] = (highs[:, j].astype(np.uint64) << np.uint64(r)) | low
                shift += r
            # sorted ascending ⇒ zeros (empty) first; flip for compactness
            sk.table = fps[:, ::-1].astype(dtype)
        sk.occ = (sk.table != 0).sum(axis=1).astype(np.int8)
        return sk


def cuckoo_for_longs(capacity: int, fpp: float = 0.032, b: int | None = None) -> CuckooSketch:
    from .base import FUNNEL_LONG

    return CuckooSketch(capacity, fpp, b, funnel=FUNNEL_LONG)


def cuckoo_for_strings(capacity: int, fpp: float = 0.032, b: int | None = None) -> CuckooSketch:
    return CuckooSketch(capacity, fpp, b, funnel=FUNNEL_UTF8)
