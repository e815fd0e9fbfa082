"""Scalable Bloom filter — unknown-capacity membership with a compound bound.

Almeida, Baquero, Preguiça, Hutchison, "Scalable Bloom Filters"
(Information Processing Letters 101(6), 2007): a sequence of plain Bloom
stages whose capacities grow geometrically (``growth``) and whose per-stage
FPPs shrink geometrically (``tightening`` ratio r), so the compound false-
positive probability of a SINGLE-WRITER filter is bounded by the configured
``fpp`` regardless of how many elements arrive:

    stage i:  capacity = initial_capacity * growth^i
              fpp_i    = fpp * (1 - r) * r^i          (sum over i = fpp)

This removes the capacity-up-front requirement of ``BloomSketch`` — the use
case is one-pass builds over inputs whose cardinality is unknown until the
scan finishes (e.g. the exploded n-gram stream of a decontamination pass,
where a plain bloom needs a separate ``count()`` job first).

Extends the guava-probably ``ProbabilisticFilter`` contract (SURVEY.md §2
rows 1-16 — semantics of put/putAll/mightContain/isCompatible/writeTo/
readFrom/expectedFpp; the reference has no scalable variant, this is a
north-rule extension) with DISTRIBUTED merge semantics chosen for Spark
tree-folds:

- ``merge`` is the canonical SET UNION of the two stage lists (stages are
  self-describing plain blooms; exact byte-duplicates collapse).  Unlike a
  stage-wise OR — which silently overfills a stage when both sides are near
  capacity and destroys the per-stage bound — the union keeps every stage
  at its writer's fill, so zero false negatives AND every per-stage bound
  survive any merge tree.  Canonical ordering makes merge associative,
  commutative and idempotent at the BLOB-BYTE level (the library's
  merge-associativity contract).
- The price is additive compound FPP: a fold over P partial builders
  yields expected_fpp ≤ P·fpp (union bound — needs no independence
  assumption).  Size ``fpp`` for the fold fan-in (fpp_target / P), or run
  :meth:`compact` after the fold: it ORs same-geometry stages back together
  whenever their combined occupancy still fits the stage capacity, which
  collapses the under-filled stages partial builders mostly produce.
- ``expected_fpp()`` is always occupancy-honest: 1 − Π(1 − stage fpp_i)
  with stage fpp_i = (set_bits/m)^k, so post-merge degradation is visible,
  never hidden.

Probe cost is one vectorized bloom probe per stage (rows already matched
drop out of later probes).  A filter that grew to S stages probes ≤ S·k
bit-gathers per element — the intended shape is huge-build/small-probe
(decontamination: train is 10^9 rows, eval is 10^3-10^6).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import (
    FUNNEL_UTF8,
    KIND_SBF,
    Sketch,
    element_to_hash,
    hash_column,
    register_kind,
)
from .bloom import BloomSketch, bloom_geometry


class _Stage:
    """One plain-bloom stage: explicit geometry + bit array + insert count.

    Self-describing (geometry rides in the blob) so a merged filter can
    carry stages from any point of any writer's growth schedule.
    """

    __slots__ = ("capacity", "fpp", "m", "k", "bits", "n_est")

    def __init__(self, capacity: int, fpp: float):
        self.capacity = int(capacity)
        self.fpp = float(fpp)
        self.m, self.k = bloom_geometry(self.capacity, self.fpp)
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)
        self.n_est = 0  # inserts routed here (upper bound on distinct)

    # geometry-only constructor for deserialization / merge
    @classmethod
    def _raw(cls, capacity: int, fpp: float, m: int, k: int, bits: np.ndarray):
        st = cls.__new__(cls)
        st.capacity, st.fpp, st.m, st.k = capacity, fpp, m, k
        st.bits = bits
        st.n_est = st.size_estimate()
        return st

    def _indexes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            i = np.arange(self.k, dtype=np.uint64)
            combined = h1[:, None] + i * h2[:, None]
            return (combined & np.uint64(0x7FFFFFFFFFFFFFFF)) % np.uint64(self.m)

    def insert(self, h1: np.ndarray, h2: np.ndarray) -> None:
        idx = self._indexes(h1, h2)
        word = (idx >> np.uint64(6)).astype(np.int64)
        mask = np.uint64(1) << (idx & np.uint64(63))
        np.bitwise_or.at(self.bits, word, mask)
        self.n_est += len(h1)

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        idx = self._indexes(h1, h2)
        word = (idx >> np.uint64(6)).astype(np.int64)
        mask = np.uint64(1) << (idx & np.uint64(63))
        return ((self.bits[word] & mask) != 0).all(axis=1)

    def set_bits(self) -> int:
        return int(np.unpackbits(self.bits.view(np.uint8)).sum())

    def size_estimate(self) -> int:
        """Occupancy-derived element count: −m/k·ln(1−x/m) (classic)."""
        x = self.set_bits()
        if x == 0:
            return 0
        if x >= self.m:
            return self.capacity
        return int(round(-self.m / self.k * math.log1p(-x / self.m)))

    def expected_fpp(self) -> float:
        return (self.set_bits() / self.m) ** self.k

    def geometry(self) -> tuple:
        return (self.capacity, round(self.fpp, 15), self.m, self.k)

    def sort_key(self) -> tuple:
        return (self.capacity, self.m, self.k, self.fpp, self.bits.tobytes())


@register_kind
class ScalableBloomSketch(Sketch):
    """Unknown-capacity Bloom filter (Almeida et al. 2007) — see module doc."""

    KIND = KIND_SBF

    def __init__(
        self,
        initial_capacity: int = 4096,
        fpp: float = 0.01,
        growth: int = 4,
        tightening: float = 0.5,
        funnel: int = FUNNEL_UTF8,
    ):
        super().__init__(funnel)
        if initial_capacity <= 0:
            raise ValueError("initial_capacity must be positive")
        if not (0.0 < fpp < 1.0):
            raise ValueError("fpp must be in (0, 1)")
        if growth < 2:
            raise ValueError("growth must be >= 2")
        if not (0.0 < tightening < 1.0):
            raise ValueError("tightening must be in (0, 1)")
        self.initial_capacity = int(initial_capacity)
        self.design_fpp = float(fpp)
        self.growth = int(growth)
        self.tightening = float(tightening)
        self.stages: list[_Stage] = []

    # -- schedule -------------------------------------------------------------
    def _schedule(self, i: int) -> tuple[int, float]:
        """(capacity, fpp) of schedule level i."""
        cap = self.initial_capacity * self.growth**i
        p = self.design_fpp * (1.0 - self.tightening) * self.tightening**i
        return cap, max(p, 1e-15)

    def _level_of(self, stage: _Stage) -> int:
        if stage.capacity <= self.initial_capacity:
            return 0
        return round(math.log(stage.capacity / self.initial_capacity, self.growth))

    def _open_stage(self) -> _Stage:
        nxt = 0 if not self.stages else max(self._level_of(s) for s in self.stages) + 1
        st = _Stage(*self._schedule(nxt))
        # no _canonicalize here: it drops empty stages, and this one must
        # stay in the list to receive the insert that motivated opening it
        # (appending keeps capacity-ascending order — nxt is a new max level)
        self.stages.append(st)
        return st

    def _active_stage(self) -> _Stage:
        """Largest stage with room; opens the next schedule level if none."""
        for st in reversed(self.stages):  # canonical order: capacity ascending
            if st.n_est < st.capacity:
                return st
        return self._open_stage()

    def _canonicalize(self) -> None:
        """Sort stages by (geometry, content) and drop exact duplicates +
        empty stages — the canonical form that makes merge associative,
        commutative and idempotent at the blob-byte level."""
        seen: set = set()
        out = []
        for st in sorted(self.stages, key=_Stage.sort_key):
            if not st.bits.any():
                continue
            key = (st.geometry(), st.bits.tobytes())
            if key in seen:
                continue
            seen.add(key)
            out.append(st)
        self.stages = out

    # -- serialization ---------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (
            self.initial_capacity,
            round(self.design_fpp, 12),
            self.growth,
            round(self.tightening, 12),
        )

    def _params_bytes(self) -> bytes:
        return struct.pack(
            "<qdqd", self.initial_capacity, self.design_fpp, self.growth, self.tightening
        )

    def _payload_bytes(self) -> bytes:
        self._canonicalize()
        parts = [struct.pack("<I", len(self.stages))]
        for st in self.stages:
            parts.append(struct.pack("<qdqi", st.capacity, st.fpp, st.m, st.k))
            parts.append(st.bits.tobytes())
        return b"".join(parts)

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "ScalableBloomSketch":
        cap0, fpp, growth, tight = struct.unpack("<qdqd", params)
        sk = cls(cap0, fpp, growth, tight, funnel=funnel)
        (n_stages,) = struct.unpack_from("<I", payload, 0)
        if n_stages > 1_000_000:
            raise ValueError(f"implausible sbf stage count {n_stages}")
        off = 4
        for _ in range(n_stages):
            if off + 28 > len(payload):
                raise ValueError("truncated sbf stage header")
            cap, p, m, k = struct.unpack_from("<qdqi", payload, off)
            off += 28
            if m <= 0 or m % 64 or k <= 0 or cap <= 0 or not (0.0 < p < 1.0):
                raise ValueError("corrupt sbf stage geometry")
            # plausibility bounds (same posture as the FD decoder): a
            # hostile k would allocate an (n, k) index matrix at first
            # probe — OOM, not the ValueError the heal path catches.
            # bloom_geometry caps real k at round(m/cap·ln2) and real
            # fpp ≥ 1e-15 gives k ≤ ~50; 4096 is far past any schedule.
            if k > 4096 or m > (1 << 45):
                raise ValueError("implausible sbf stage geometry")
            nbytes = m // 8
            if off + nbytes > len(payload):
                raise ValueError("truncated sbf stage payload")
            bits = np.frombuffer(payload, dtype=np.uint64, count=m // 64, offset=off).copy()
            off += nbytes
            sk.stages.append(_Stage._raw(cap, p, m, k, bits))
        if off != len(payload):
            raise ValueError("trailing bytes in sbf payload")
        sk._canonicalize()
        return sk

    # -- insert ----------------------------------------------------------------
    def ingest_hashes(self, h1: np.ndarray, h2: np.ndarray) -> int:
        """Insert pre-hashed elements (the multi-sketch build path).

        Elements already present in ANY stage are skipped (Almeida's insert
        rule) so duplicates never inflate newer stages; the batch is then
        routed to the active stage in remaining-room chunks so one huge
        batch cannot blow a small stage past its capacity.  Returns 0 (a
        scalable bloom cannot overflow — it grows).
        """
        if not len(h1):
            return 0
        fresh = ~self._contains_hashes(h1, h2)
        self._route_fresh(h1[fresh], h2[fresh])
        return 0

    def _route_fresh(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Chunk already-probed-fresh hashes across the growth schedule."""
        pos = 0
        while pos < len(h1):
            st = self._active_stage()
            take = min(len(h1) - pos, max(st.capacity - st.n_est, 1))
            st.insert(h1[pos : pos + take], h2[pos : pos + take])
            pos += take

    def put_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Insert; True per element iff it was not already present.
        One containment scan per batch — the routed subset is known fresh."""
        fresh = ~self._contains_hashes(h1, h2)
        self._route_fresh(h1[fresh], h2[fresh])
        return fresh

    def update(self, values) -> np.ndarray:
        _, h1, h2 = hash_column(values, self.funnel)
        return self.put_hashes(h1, h2)

    # -- probe -------------------------------------------------------------------
    def _contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.zeros(len(h1), dtype=bool)
        # probe most-populated stages first: a present element most likely
        # matches where the mass is, dropping out of the remaining probes
        # (read-path ordering only — no effect on results or serialization;
        # canonical order ascends by capacity, i.e. mass usually LAST)
        for st in sorted(self.stages, key=lambda s: -s.n_est):
            todo = np.nonzero(~out)[0]
            if not len(todo):
                break
            out[todo] = st.contains(h1[todo], h2[todo])
        return out

    def might_contain_batch(self, values) -> np.ndarray:
        _, h1, h2 = hash_column(values, self.funnel)
        return self._contains_hashes(h1, h2)

    # -- guava-style scalar surface ------------------------------------------------
    def put(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(self.put_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0])

    def put_all(self, elements) -> bool:
        return bool(self.update(list(elements)).all())

    def might_contain(self, e) -> bool:
        _, h1, h2 = element_to_hash(e)
        return bool(
            self._contains_hashes(np.array([h1], np.uint64), np.array([h2], np.uint64))[0]
        )

    def contains_all(self, elements) -> bool:
        return bool(self.might_contain_batch(list(elements)).all())

    def remove(self, e) -> bool:
        raise NotImplementedError(
            "ScalableBloomFilter does not support remove (bloom semantics)"
        )

    # -- merge / compact ------------------------------------------------------------
    def merge(self, other: "ScalableBloomSketch") -> "ScalableBloomSketch":
        """Canonical set-union of stage lists — see module doc for why this
        (not stage-wise OR) is the distributed-fold-safe merge."""
        self._check_compatible(other)
        self.stages = self.stages + [
            _Stage._raw(st.capacity, st.fpp, st.m, st.k, st.bits.copy())
            for st in other.stages
        ]
        self._canonicalize()
        return self

    def compact(self) -> "ScalableBloomSketch":
        """OR same-geometry stages together whenever their combined occupancy
        estimate still fits the stage capacity (per-stage bound preserved).

        Post-fold cleanup for merged filters: collapses the under-filled
        stages that low-volume partial builders produce (a fold over many
        small partitions), cutting probe cost per element.  Stages near
        capacity stay separate — a fold of equally-loaded partials compacts
        little, which is the honest outcome (ORing full stages would break
        their bound).  Note the occupancy-based ``expected_fpp`` typically
        RISES toward the per-stage design bound after compaction — ORing
        two quarter-full stages more than doubles (x/m)^k — while staying
        within the surviving stages' design fpps.  Deterministic
        given the stage multiset, but NOT fold-safe — compact once after
        the final merge, not inside the merge tree (intermediate compaction
        breaks blob byte-associativity)."""
        by_geo: dict[tuple, list[_Stage]] = {}
        for st in self.stages:
            by_geo.setdefault(st.geometry(), []).append(st)
        out = []
        for geo, group in sorted(by_geo.items()):
            group.sort(key=_Stage.sort_key)
            acc = None
            for st in group:
                if acc is not None and acc.n_est + st.n_est <= acc.capacity:
                    np.bitwise_or(acc.bits, st.bits, out=acc.bits)
                    acc.n_est = acc.size_estimate()
                else:
                    if acc is not None:
                        out.append(acc)
                    acc = st
            out.append(acc)
        self.stages = out
        self._canonicalize()
        return self

    # -- introspection ------------------------------------------------------------
    def fpp(self) -> float:
        """The design compound bound (single-writer; a fold over P partials
        weakens it to ≤ P·fpp — see module doc)."""
        return self.design_fpp

    def expected_fpp(self) -> float:
        p_clean = 1.0
        for st in self.stages:
            p_clean *= 1.0 - st.expected_fpp()
        return 1.0 - p_clean

    @property
    def size(self) -> int:
        return sum(st.size_estimate() for st in self.stages)

    @property
    def capacity(self) -> int:
        """Current total capacity across stages (grows on demand)."""
        return sum(st.capacity for st in self.stages)

    def is_empty(self) -> bool:
        return not any(st.bits.any() for st in self.stages)

    def clear(self) -> None:
        self.stages = []
