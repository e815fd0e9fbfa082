"""Vectorized murmur3_x64_128 — the single hash pipeline for every sketch.

From-scratch numpy implementation of the public-domain MurmurHash3_x64_128
algorithm (Austin Appleby, smhasher), the same function Guava's
``Hashing.murmur3_128()`` exposes and which guava-probably's
``CuckooStrategies.MURMUR128_BEALDUPRAS_32`` and Guava bloom's
``MURMUR128_MITZ_64`` build on (reference: bdupras/guava-probably
``src/main/java/com/duprasville/guava/probably/CuckooStrategies.java`` —
semantics only; no code consulted, tree empty in sandbox, see SURVEY.md §0).

Two entry points:

- :func:`hash128_bytes` — batch of variable-length byte strings given as a
  flat uint8 buffer + offsets (exactly pyarrow's String/Binary layout, so a
  pyarrow column hashes with zero copies of the payload).
- :func:`hash128_u64` — fast path for fixed 8-byte little-endian elements
  (Guava ``Funnels.longFunnel`` semantics: ``putLong`` is little-endian).

All arithmetic is uint64 with wraparound (numpy semantics), matching the
C/Java algorithm. The scalar reference :func:`hash128_scalar` exists for
cross-checking in tests only.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_M5 = np.uint64(5)
_A1 = np.uint64(0x52DCE729)
_A2 = np.uint64(0x38495AB5)
_SHIFT33 = np.uint64(33)

def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _SHIFT33)
    k = k * _F1
    k = k ^ (k >> _SHIFT33)
    k = k * _F2
    k = k ^ (k >> _SHIFT33)
    return k


def hash128_bytes(
    data: np.ndarray, offsets: np.ndarray, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """murmur3_x64_128 over n variable-length byte strings.

    Parameters
    ----------
    data : flat uint8 buffer holding all strings back to back
    offsets : int64/int32 array of n+1 offsets into ``data`` (arrow layout)
    seed : 32-bit seed (0 = Guava default)

    Returns (h1, h2) uint64 arrays of length n.
    """
    with np.errstate(over="ignore"):
        data = np.ascontiguousarray(data, dtype=np.uint8)
        offsets = np.asarray(offsets, dtype=np.int64)
        n = len(offsets) - 1
        lengths = offsets[1:] - offsets[:-1]
        starts = offsets[:-1]

        h1 = np.full(n, np.uint64(seed), dtype=np.uint64)
        h2 = np.full(n, np.uint64(seed), dtype=np.uint64)

        nblocks = (lengths // 16).astype(np.int64)
        max_blocks = int(nblocks.max()) if n else 0

        # Process strings in descending-block-count order so that at block t
        # the active set is a contiguous prefix (cheap slicing, no masks).
        order = np.argsort(-nblocks, kind="stable")
        s_starts = starts[order]
        s_nblocks = nblocks[order]
        sh1 = h1[order]
        sh2 = h2[order]

        # active prefix length at block t = number of strings with nblocks > t
        # s_nblocks descending -> searchsorted on the negated array
        neg = -s_nblocks
        # persistent (n_active, 16) gather index, advanced in place per block
        # (allocating fresh index matrices per block dominates DRAM traffic)
        if max_blocks > 0:
            m0 = int(np.searchsorted(neg, 0, side="left"))
            idx16 = s_starts[:m0, None] + np.arange(16)
        for t in range(max_blocks):
            m = int(np.searchsorted(neg, -t, side="left"))  # count nblocks > t
            if m == 0:
                break
            blk = data[idx16[:m]].view("<u8")  # (m, 2) zero-copy LE words
            k1 = blk[:, 0].copy()
            k2 = blk[:, 1].copy()
            idx16[:m] += 16

            k1 *= _C1
            k1 = _rotl(k1, 31)
            k1 *= _C2
            sh1[:m] ^= k1
            sh1[:m] = _rotl(sh1[:m], 27)
            sh1[:m] += sh2[:m]
            sh1[:m] = sh1[:m] * _M5 + _A1

            k2 *= _C2
            k2 = _rotl(k2, 33)
            k2 *= _C1
            sh2[:m] ^= k2
            sh2[:m] = _rotl(sh2[:m], 31)
            sh2[:m] += sh1[:m]
            sh2[:m] = sh2[:m] * _M5 + _A2

        # un-permute
        h1[order] = sh1
        h2[order] = sh2

        # --- tail: len % 16 remaining bytes, zero-padded to 16.
        # Zero-padded lanes are identity under the (mul, rotl, mul, xor) mix,
        # so the tail can be applied unconditionally.
        taillen = lengths - nblocks * 16
        tail_start = starts + nblocks * 16
        idx = tail_start[:, None] + np.arange(16)
        valid = np.arange(16) < taillen[:, None]
        safe_idx = np.minimum(idx, max(len(data) - 1, 0))
        if len(data) == 0:
            tb = np.zeros((n, 16), dtype=np.uint8)
        else:
            tb = data[safe_idx] * valid  # bool mask zero-pads, stays uint8
        w = tb.view("<u8")  # (n, 2) little-endian view, zero-copy
        k1 = w[:, 0].copy()
        k2 = w[:, 1].copy()

        k2 *= _C2
        k2 = _rotl(k2, 33)
        k2 *= _C1
        h2 ^= k2

        k1 *= _C1
        k1 = _rotl(k1, 31)
        k1 *= _C2
        h1 ^= k1

        # --- finalization
        ulen = lengths.astype(np.uint64)
        h1 ^= ulen
        h2 ^= ulen
        h1 += h2
        h2 += h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 += h2
        h2 += h1
        return h1, h2


def hash128_u64(values: np.ndarray, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """murmur3_x64_128 of each value's 8-byte little-endian encoding.

    Equivalent to hashing with Guava's ``Funnels.longFunnel()`` (putLong is
    little-endian). Fast path: 8-byte input = zero blocks + 8-byte tail.
    """
    with np.errstate(over="ignore"):
        v = np.asarray(values).astype(np.uint64, copy=False)
        n = len(v)
        h1 = np.full(n, np.uint64(seed), dtype=np.uint64)
        h2 = np.full(n, np.uint64(seed), dtype=np.uint64)

        # tail: k1 = value, k2 = 0 (identity)
        k1 = v * _C1
        k1 = _rotl(k1, 31)
        k1 *= _C2
        h1 = h1 ^ k1

        l8 = np.uint64(8)
        h1 ^= l8
        h2 ^= l8
        h1 += h2
        h2 += h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 += h2
        h2 += h1
        return h1, h2


# ---------------------------------------------------------------------------
# Scalar reference (tests only) — direct transcription of the published spec.
# ---------------------------------------------------------------------------

_MASK = (1 << 64) - 1


def _rotl_s(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix64_s(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def hash128_scalar(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Pure-python murmur3_x64_128 (reference oracle for tests)."""
    length = len(data)
    nblocks = length // 16
    h1 = seed
    h2 = seed
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F

    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")

        k1 = (k1 * c1) & _MASK
        k1 = _rotl_s(k1, 31)
        k1 = (k1 * c2) & _MASK
        h1 ^= k1
        h1 = _rotl_s(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK

        k2 = (k2 * c2) & _MASK
        k2 = _rotl_s(k2, 33)
        k2 = (k2 * c1) & _MASK
        h2 ^= k2
        h2 = _rotl_s(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK

    tail = data[nblocks * 16 :]
    k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
    k2 = int.from_bytes(tail[8:16].ljust(8, b"\0"), "little")

    k2 = (k2 * c2) & _MASK
    k2 = _rotl_s(k2, 33)
    k2 = (k2 * c1) & _MASK
    h2 ^= k2

    k1 = (k1 * c1) & _MASK
    k1 = _rotl_s(k1, 31)
    k1 = (k1 * c2) & _MASK
    h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix64_s(h1)
    h2 = _fmix64_s(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


def bytes_batch_to_buffer(items: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack a python list of byte strings into (flat uint8 buffer, offsets)."""
    offsets = np.zeros(len(items) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in items], out=offsets[1:])
    data = np.frombuffer(b"".join(items), dtype=np.uint8) if items else np.zeros(0, np.uint8)
    return data, offsets
