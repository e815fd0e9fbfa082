"""Misra–Gries mergeable heavy-hitter summary (SpaceSaving-equivalent).

Closes the scalability gap in CMS-based heavy hitters: a CMS answers
`freq(item)` but needs a CANDIDATE SET to enumerate heavy hitters — at
10^8+ distinct keys, collecting candidates is itself a full distinct
aggregation. Misra–Gries keeps the candidates inside the summary: k
counters, guarantee `c(x) ≤ f(x) ≤ c(x) + e` with total decrement
`e ≤ n/(k+1)`, so every item with true frequency > n/(k+1) survives —
no false negatives above the bound (Misra & Gries 1982).

Merge (Agarwal et al., "Mergeable Summaries", PODS'12): add counters,
then one decrement round by the (k+1)-th largest count; the combined
error stays ≤ (n1+n2)/(k+1). This is what makes it a treeAggregate-able
partial like every other sketch here (same partial-build + tree-merge
pipeline; no raw-row shuffle).

Batched update: per-batch exact counts via arrow `value_counts` (C++
hash table) folded into the counter dict, then one decrement round —
each round subtracts t from ≥ k+1 counters, so Σt ≤ n/(k+1) holds
batch-size-independently. Python work is O(unique-per-batch), not
O(rows).

Determinism class: counters depend on merge order (like KLL/t-digest);
the e-bound and no-false-negative guarantees hold for every order.
Serialization is canonical (sorted by count desc, key asc).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import FUNNEL_NONE, KIND_MG, Sketch, register_kind


def _to_counts(values) -> tuple[list, np.ndarray]:
    """Column batch → (unique items, counts). Arrow fast path, else numpy."""
    try:
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            vc = values.drop_null().value_counts()
            return vc.field(0).to_pylist(), vc.field(1).to_numpy(zero_copy_only=False)
    except ImportError:
        pass
    arr = np.asarray(values)
    uniq, counts = np.unique(arr, return_counts=True)
    return uniq.tolist(), counts


def _to_weighted_counts(values, weights) -> tuple[list, np.ndarray]:
    """(items, weights) → per-unique weight sums. Arrow C++ hash-agg fast
    path; negative weights rejected (MG counters must stay monotone up)."""
    w = np.asarray(weights, dtype=np.int64)
    if len(w) and w.min() < 0:
        raise ValueError("MG weights must be non-negative")
    try:
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            if len(values) != len(w):
                raise ValueError("values/weights length mismatch")
            tb = (
                pa.table({"k": values, "w": pa.array(w)})
                .filter(values.is_valid())
                .group_by("k")
                .aggregate([("w", "sum")])
            )
            return tb.column("k").to_pylist(), tb.column("w_sum").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
    except ImportError:
        pass
    if len(np.asarray(values, dtype=object)) != len(w):
        raise ValueError("values/weights length mismatch")
    acc: dict = {}
    for key, wt in zip(values, w):
        if key is None:
            continue
        acc[key] = acc.get(key, 0) + int(wt)
    return list(acc), np.array(list(acc.values()), dtype=np.int64)


@register_kind
class MisraGriesSketch(Sketch):
    KIND = KIND_MG

    def __init__(self, k: int = 256, funnel: int = FUNNEL_NONE):
        super().__init__(funnel)
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counters: dict = {}
        self.n = 0  # total stream length summarized
        self.e = 0  # total decrement ≤ n/(k+1): the one-sided error bound

    # -- contract ------------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (self.k,)

    def _params_bytes(self) -> bytes:
        return struct.pack("<I", self.k)

    # Key-type tags (ADVICE r1: bytes keys used to be written raw under the
    # str tag and decoded utf-8 — non-UTF-8 bytes made from_bytes raise
    # (masked as "corrupt blob", sending checkpoint heal into futile
    # rebuilds) and valid bytes/int keys silently became str across a
    # round-trip, so estimate_count(original_key) returned 0):
    #   1 = all-int64 keys, 2 = all-str keys (both the legacy layouts —
    #   old blobs still decode), 3 = all-bytes keys (raw, decoded as bytes),
    #   4 = mixed (per-key 1-byte type prefix inside each slot).
    _KEY_INT, _KEY_STR, _KEY_BYTES = 0, 1, 2

    @staticmethod
    def _key_slot(key) -> bytes:
        """Mixed-tag slot: type byte + payload; round-trips the key type."""
        if isinstance(key, (bool,)):
            raise TypeError("unsupported MG key type: bool")
        if isinstance(key, (int, np.integer)):
            return b"\x00" + struct.pack("<q", int(key))
        if isinstance(key, str):
            return b"\x01" + key.encode("utf-8")
        if isinstance(key, (bytes, bytearray)):
            return b"\x02" + bytes(key)
        raise TypeError(f"unsupported MG key type: {type(key).__name__}")

    def _payload_bytes(self) -> bytes:
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], str(kv[0])))
        kinds = {
            (
                self._KEY_INT
                if isinstance(key, (int, np.integer)) and not isinstance(key, bool)
                else self._KEY_STR
                if isinstance(key, str)
                else self._KEY_BYTES
                if isinstance(key, (bytes, bytearray))
                else -1
            )
            for key, _ in items
        }
        if -1 in kinds:
            bad = next(
                type(key).__name__
                for key, _ in items
                if not isinstance(key, (int, np.integer, str, bytes, bytearray))
                or isinstance(key, bool)
            )
            raise TypeError(f"unsupported MG key type: {bad}")
        counts = np.array([c for _, c in items], dtype=np.int64)
        if items and kinds == {self._KEY_INT}:
            head = struct.pack("<QQIB", self.n, self.e, len(items), 1)
            keys = np.array([int(key) for key, _ in items], dtype=np.int64)
            return head + counts.tobytes() + keys.tobytes()
        if not items or kinds == {self._KEY_STR}:
            tag, blobs = 2, [key.encode("utf-8") for key, _ in items]
        elif kinds == {self._KEY_BYTES}:
            tag, blobs = 3, [bytes(key) for key, _ in items]
        else:
            tag, blobs = 4, [self._key_slot(key) for key, _ in items]
        head = struct.pack("<QQIB", self.n, self.e, len(items), tag)
        offs = np.zeros(len(blobs) + 1, dtype=np.int64)
        if blobs:
            offs[1:] = np.cumsum([len(b) for b in blobs])
        return head + counts.tobytes() + offs.tobytes() + b"".join(blobs)

    @staticmethod
    def _decode_slot(slot: bytes):
        t = slot[0]
        if t == 0:
            return struct.unpack("<q", slot[1:9])[0]
        if t == 1:
            return slot[1:].decode("utf-8")
        if t == 2:
            return bytes(slot[1:])
        raise ValueError(f"unknown MG key slot type {t}")

    @classmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes):
        (k,) = struct.unpack_from("<I", params, 0)
        sk = cls(k=k, funnel=funnel)
        n, e, m, tag = struct.unpack_from("<QQIB", payload, 0)
        sk.n, sk.e = int(n), int(e)
        off = struct.calcsize("<QQIB")
        counts = np.frombuffer(payload, dtype=np.int64, count=m, offset=off)
        off += 8 * m
        if tag == 1:
            keys = np.frombuffer(payload, dtype=np.int64, count=m, offset=off)
            sk.counters = {int(key): int(c) for key, c in zip(keys, counts)}
            return sk
        if tag not in (2, 3, 4):
            raise ValueError(f"unknown MG key tag {tag}")
        offs = np.frombuffer(payload, dtype=np.int64, count=m + 1, offset=off)
        off += 8 * (m + 1)
        data = payload[off:]
        if tag == 2:
            sk.counters = {
                data[offs[i] : offs[i + 1]].decode("utf-8"): int(counts[i])
                for i in range(m)
            }
        elif tag == 3:
            sk.counters = {
                bytes(data[offs[i] : offs[i + 1]]): int(counts[i]) for i in range(m)
            }
        else:
            sk.counters = {
                cls._decode_slot(data[offs[i] : offs[i + 1]]): int(counts[i])
                for i in range(m)
            }
        return sk

    # -- updates -------------------------------------------------------------
    def _decrement_round(self) -> None:
        if len(self.counters) <= self.k:
            return
        t = sorted(self.counters.values(), reverse=True)[self.k]  # (k+1)-th largest
        self.counters = {
            key: c - t for key, c in self.counters.items() if c > t
        }
        self.e += t

    def update(self, values, weights=None) -> None:
        """Ingest a column batch; with ``weights``, item i counts for
        weights[i] (DataSketches ItemsSketch parity). Weighted updates keep
        every guarantee with n = total WEIGHT: the decrement round still
        subtracts t from ≥ k+1 counters, so Σt ≤ W/(k+1) — which is what
        lets an MG build ride pre-aggregated (item, count) pairs (the
        CMS-style JVM-side combine) instead of raw instances."""
        if weights is None:
            items, counts = _to_counts(values)
        else:
            items, counts = _to_weighted_counts(values, weights)
        get = self.counters.get
        for key, c in zip(items, counts):
            self.counters[key] = get(key, 0) + int(c)
        self.n += int(counts.sum()) if len(counts) else 0
        self._decrement_round()

    def put(self, e, weight: int = 1) -> None:
        if weight < 0:
            raise ValueError("MG weight must be non-negative")
        self.counters[e] = self.counters.get(e, 0) + int(weight)
        self.n += int(weight)
        self._decrement_round()

    def put_all(self, values) -> None:
        self.update(values)

    def merge(self, other: "MisraGriesSketch") -> "MisraGriesSketch":
        self._check_compatible(other)
        get = self.counters.get
        for key, c in other.counters.items():
            self.counters[key] = get(key, 0) + c
        self.n += other.n
        self.e += other.e
        self._decrement_round()
        return self

    # -- queries -------------------------------------------------------------
    def error_bound(self) -> int:
        """Guaranteed max undercount: stored c(x) ≤ f(x) ≤ c(x) + error_bound()."""
        return self.e

    def estimate_count(self, item) -> int:
        """Lower-bound estimate (0 for untracked items)."""
        return self.counters.get(item, 0)

    def heavy_hitters(self, phi: float) -> dict:
        """Every item with true frequency ≥ phi·n is returned (no false
        negatives when phi·n > e); values are the stored lower-bound counts."""
        thresh = phi * self.n - self.e
        return {key: c for key, c in self.counters.items() if c >= thresh}

    def is_empty(self) -> bool:
        return self.n == 0

    def clear(self) -> None:
        self.counters = {}
        self.n = 0
        self.e = 0

    @property
    def size(self) -> int:
        return self.n
