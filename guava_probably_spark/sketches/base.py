"""Sketch contract + binary serialization format.

The contract mirrors guava-probably's ``ProbabilisticFilter`` interface
(reference: bdupras/guava-probably
``src/main/java/com/duprasville/guava/probably/ProbabilisticFilter.java`` —
semantics only, see SURVEY.md §0/§2 rows 1-16) generalized to all six sketch
kinds required by the north rule: put/put_all (insert), might_contain
(membership, filters only), merge (``putAll(filter)``), is_compatible,
expected_fpp / error introspection, writeTo/readFrom (``to_bytes`` /
``from_bytes``), copy, equals.

Serialized form (little-endian):

    magic  b"GPSK" | version u8 | kind u8 | funnel u8 | reserved u8
    | params (kind-specific, fixed struct) | payload (numpy buffers)

``is_compatible`` is exactly header-equality of (kind, funnel, params) on a
*different* instance — the Spark merge path raises on incompatible blobs.
"""

from __future__ import annotations

import struct
from abc import ABC, abstractmethod

import numpy as np

MAGIC = b"GPSK"
VERSION = 1

KIND_BLOOM = 1
KIND_CUCKOO = 2
KIND_HLL = 3
KIND_CMS = 4
KIND_KLL = 5
KIND_TDIGEST = 6
KIND_MG = 7
KIND_THETA = 8
KIND_FD = 9
KIND_SBF = 10
KIND_DD = 11
KIND_REQ = 12
KIND_BOTTOMK = 13
KIND_COUNTSKETCH = 14
KIND_TUPLE = 15
KIND_SHLL = 16
KIND_QF = 17
KIND_XOR = 18
KIND_VAROPT = 19
KIND_XORMAP = 20

# Funnels: how an element column is reduced to hashable bytes.  The funnel id
# is part of filter compatibility, mirroring Guava Funnel identity semantics
# (SURVEY.md §1.1).
FUNNEL_NONE = 0   # value sketches (KLL / t-digest): raw float64, no hashing
FUNNEL_UTF8 = 1   # string/binary column: raw UTF-8 bytes (Funnels.stringFunnel)
FUNNEL_LONG = 2   # integer column: 8-byte little-endian (Funnels.longFunnel)
FUNNEL_PREHASHED = 3  # values pre-hashed JVM-side (xxhash64) — the 64-bit
# hash IS the sketch input, no murmur3 re-hash. Distinct funnel id so these
# blobs refuse to merge with murmur3-funnel blobs of the same logical
# column (the register domains differ).

_REGISTRY: dict[int, type["Sketch"]] = {}


def register_kind(cls: type["Sketch"]) -> type["Sketch"]:
    _REGISTRY[cls.KIND] = cls
    return cls


class IncompatibleSketchError(ValueError):
    pass


class Sketch(ABC):
    """Mergeable sketch: create / update / merge / serialize / estimate."""

    KIND: int = 0

    def __init__(self, funnel: int = FUNNEL_NONE):
        self.funnel = funnel

    # -- abstract core ------------------------------------------------------
    @abstractmethod
    def _params_tuple(self) -> tuple:
        """Geometry parameters; equality of these gates compatibility."""

    @abstractmethod
    def _params_bytes(self) -> bytes: ...

    @abstractmethod
    def _payload_bytes(self) -> bytes: ...

    @classmethod
    @abstractmethod
    def _from_parts(cls, funnel: int, params: bytes, payload: bytes) -> "Sketch": ...

    @abstractmethod
    def merge(self, other: "Sketch") -> "Sketch":
        """In-place merge (guava-probably ``putAll(ProbabilisticFilter)``).

        Raises IncompatibleSketchError unless ``self.is_compatible(other)``.
        Returns self.
        """

    # -- contract surface ----------------------------------------------------
    def is_compatible(self, other: "Sketch") -> bool:
        """Same kind, same funnel, identical geometry, different instance."""
        return (
            other is not self
            and type(other) is type(self)
            and other.funnel == self.funnel
            and other._params_tuple() == self._params_tuple()
        )

    def _check_compatible(self, other: "Sketch") -> None:
        if not self.is_compatible(other):
            raise IncompatibleSketchError(
                f"cannot merge {type(self).__name__}{self._params_tuple()} "
                f"with {type(other).__name__}{getattr(other, '_params_tuple', lambda: '?')()}"
            )

    # payloads above this size are zlib-compressed (deterministic, so blob
    # byte-equality contracts are unaffected).  Partial sketches at low load
    # are extremely sparse — this is what keeps the tree-merge shuffle KB-
    # sized instead of shipping dense 2+ MB bit arrays per partition.
    _COMPRESS_THRESHOLD = 1 << 16

    def to_bytes(self) -> bytes:
        params = self._params_bytes()
        payload = self._payload_bytes()
        comp = 0
        if len(payload) > self._COMPRESS_THRESHOLD:
            import zlib

            payload = zlib.compress(payload, 1)
            comp = 1
        header = MAGIC + struct.pack("<BBBB", VERSION, self.KIND, self.funnel, comp)
        # no per-blob checksum by design: the grouped packers emit this exact
        # layout fully vectorized (a per-row crc would serialize them), and
        # blobs at rest ride in parquet (page checksums) or behind the
        # checkpoint heal path — structural corruption surfaces as ValueError
        # in from_bytes, which that path catches and rebuilds
        return header + struct.pack("<I", len(params)) + params + payload

    @staticmethod
    def from_bytes(blob: bytes) -> "Sketch":
        if blob[:4] != MAGIC:
            raise ValueError("not a GPSK sketch blob")
        # one uniform failure type for ANY corruption: checkpoint heal and
        # store readers catch ValueError — a leaked struct.error/IndexError
        # from a kind decoder would crash a resume instead of triggering the
        # rebuild path (surfaced by blob fuzzing, 400 mutations × 8 kinds)
        try:
            version, kind, funnel, comp = struct.unpack_from("<BBBB", blob, 4)
            if version != VERSION:
                raise ValueError(f"unsupported sketch version {version}")
            (plen,) = struct.unpack_from("<I", blob, 8)
            params = blob[12 : 12 + plen]
            payload = blob[12 + plen :]
            if comp == 1:
                import zlib

                payload = zlib.decompress(payload)
            cls = _REGISTRY.get(kind)
            if cls is None:
                raise ValueError(f"unknown sketch kind {kind}")
            return cls._from_parts(funnel, params, payload)
        except ValueError:
            raise
        except Exception as e:
            raise ValueError(f"corrupt sketch blob: {type(e).__name__}: {e}") from e

    def copy(self) -> "Sketch":
        return Sketch.from_bytes(self.to_bytes())

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Sketch) and self.to_bytes() == other.to_bytes()

    def __hash__(self) -> int:
        return hash(self.to_bytes())

    def __repr__(self) -> str:
        return f"{type(self).__name__}{self._params_tuple()}"


# ---------------------------------------------------------------------------
# Column ingestion: pyarrow / pandas / python values -> hash inputs
# ---------------------------------------------------------------------------

def _import_pa():
    import pyarrow as pa

    return pa


def column_to_hash_input(values) -> tuple[int, tuple]:
    """Normalize a column batch to (funnel, hash-input).

    Returns (FUNNEL_UTF8, (data_u8, offsets_i64)) for string/binary input or
    (FUNNEL_LONG, u64_values) for integer input.  Nulls are dropped (a null
    element is never inserted / probed true), matching the reference's
    null-hostile API (guava-probably NPEs on null; we skip, documented).
    """
    pa = _import_pa()
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        if isinstance(values, (list, tuple)):
            if values and isinstance(values[0], bytes):
                values = pa.array(values, type=pa.large_binary())
            else:
                values = pa.array(values)
        else:  # pandas Series / numpy array
            values = pa.Array.from_pandas(values)
    values = values.drop_null()

    t = values.type
    # empty python lists / all-null batches arrive as arrow's null type —
    # nothing to hash, and the type carries no funnel information. Return
    # an empty LONG-shaped input; hash_column skips its funnel check for
    # zero-length input so put_all([]) / update([None]) no-op as the
    # null-dropping contract above promises.
    if pa.types.is_null(t):
        return FUNNEL_NONE, np.zeros(0, dtype=np.uint64)
    if pa.types.is_integer(t):
        if pa.types.is_unsigned_integer(t):
            # uint64 >= 2^63 must wrap (the scalar path hashes value mod
            # 2^64); a checked cast would raise ArrowInvalid mid-batch
            v = values.to_numpy(zero_copy_only=False).astype(np.uint64)
            return FUNNEL_LONG, v
        v = values.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return FUNNEL_LONG, v.astype(np.uint64)
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        arr = values.cast(pa.large_binary())
        if arr.offset != 0:  # normalize slices
            arr = pa.concat_arrays([arr])
        bufs = arr.buffers()
        offsets = np.frombuffer(bufs[1], dtype=np.int64)[: len(arr) + 1]
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.zeros(0, np.uint8)
        )
        return FUNNEL_UTF8, (data, offsets)
    raise TypeError(f"unhashable column type for sketch funnel: {t}")


def prehashed_hashes(values) -> np.ndarray:
    """Values for a FUNNEL_PREHASHED sketch ARE the 64-bit hashes (Spark's
    ``xxhash64``, signed int64) — validate integer input and reinterpret as
    uint64. A string/float batch against a prehashed sketch is a pipeline
    bug (raw values were never hashed JVM-side), so it raises rather than
    silently hashing the wrong domain."""
    pa = _import_pa()
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if not pa.types.is_integer(values.type):
            raise IncompatibleSketchError(
                f"prehashed sketch expects int64 hash values, got {values.type}"
            )
        arr = values.drop_null().to_numpy(zero_copy_only=False)
        return arr.astype(np.int64).view(np.uint64)
    arr = np.asarray(values)
    if arr.dtype == object or not np.issubdtype(arr.dtype, np.integer):
        raise IncompatibleSketchError(
            f"prehashed sketch expects int64 hash values, got dtype {arr.dtype}"
        )
    return arr.astype(np.int64).view(np.uint64)


def hash_column(values, expected_funnel: int | None = None):
    """Hash a column batch with murmur3_x64_128 → (funnel, h1, h2)."""
    from .hashing import hash128_bytes, hash128_u64

    funnel, inp = column_to_hash_input(values)
    if funnel == FUNNEL_NONE:
        # all-null / empty-python batch: nothing to hash AND no funnel
        # information, so the mismatch check below must not fire
        f = expected_funnel if expected_funnel is not None else FUNNEL_LONG
        return f, np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint64)
    # a zero-row TYPED batch still carries funnel information: validate it
    # (an empty string column probed against a FUNNEL_LONG sketch is a
    # schema mismatch and must raise before data arrives)
    if expected_funnel is not None and funnel != expected_funnel:
        raise IncompatibleSketchError(
            f"column funnel {funnel} != sketch funnel {expected_funnel}"
        )
    empty = len(inp) == 0 if funnel == FUNNEL_LONG else len(inp[1]) <= 1
    if empty:
        return funnel, np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint64)
    if funnel == FUNNEL_LONG:
        h1, h2 = hash128_u64(inp)
    else:
        data, offsets = inp
        h1, h2 = hash128_bytes(data, offsets)
    return funnel, h1, h2


def element_to_hash(value) -> tuple[int, int, int]:
    """Single-element convenience (guava-style put(e)/mightContain(e))."""
    from .hashing import hash128_scalar

    if isinstance(value, (int, np.integer)):
        h1, h2 = hash128_scalar(int(np.uint64(value % (1 << 64))).to_bytes(8, "little"))
        return FUNNEL_LONG, h1, h2
    if isinstance(value, str):
        value = value.encode("utf-8")
    if isinstance(value, bytes):
        h1, h2 = hash128_scalar(value)
        return FUNNEL_UTF8, h1, h2
    raise TypeError(f"unhashable element: {type(value)}")
