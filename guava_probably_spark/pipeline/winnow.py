"""Cross-document exact-substring detection via winnowing (Schleimer,
Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — the MOSS algorithm; public knowledge).

Whole-document near-dup (MinHash/SimHash in pipeline/dedup.py) misses a
training-data failure mode: two otherwise-different documents sharing a
long verbatim span (boilerplate, license text, quoted passages). Winnowing
finds those spans with a GUARANTEE: selecting the minimum rolling k-gram
hash in every window of ``w`` consecutive positions fingerprints every
document such that any common substring of length ≥ t = k + w − 1 yields
at least one IDENTICAL selected fingerprint in both documents (the shared
span contains a full window; its minimum hash value is the same in both).
So fingerprint-join candidates have 100% recall at length t, and an exact
t-gram verification removes the (hash-coincidence) false positives —
output semantics are EXACT: pairs of documents sharing a verbatim
substring of length ≥ t.

Scale posture: per document only ~2/(w+1) of positions are selected (the
winnowing density bound), so the fingerprint table is a fraction of the
corpus; the candidate join is the same capped-bucket join the LSH paths
use (``pairs_from_band_rows`` with ``max_bucket`` skew armor — a
boilerplate fingerprint shared by 10^6 docs is dropped with an auditable
count, exactly like a hot LSH bucket); verification touches candidate
pairs only. No per-row Python anywhere: the rolling hash + window minima
are vectorized numpy inside ``mapInArrow``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

_B = np.uint64(0x100000001B3)  # FNV64 prime (odd ⇒ invertible mod 2^64)
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_MAXLEN = 1 << 20  # power tables cover docs up to 1 MiB of UTF-8


def _pow_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    powb = np.empty(n, dtype=np.uint64)
    powi = np.empty(n, dtype=np.uint64)
    powb[0] = powi[0] = 1
    np.multiply.accumulate(np.full(n - 1, _B, dtype=np.uint64), out=powb[1:])
    np.multiply.accumulate(np.full(n - 1, _BINV, dtype=np.uint64), out=powi[1:])
    return powb, powi


_POW_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _pows(n: int) -> tuple[np.ndarray, np.ndarray]:
    size = min(_MAXLEN, max(4096, 1 << (int(n - 1).bit_length())))
    if size not in _POW_CACHE:
        _POW_CACHE.clear()  # keep at most one table resident
        _POW_CACHE[size] = _pow_tables(size)
    return _POW_CACHE[size]


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — breaks the polynomial's algebraic structure
    so window minima behave like minima of uniform values."""
    h = (h + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _doc_fingerprints(b: np.ndarray, k: int, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Winnowed (positions, fingerprints) of one document's byte array.

    Rolling polynomial hash of every k-gram in O(n) via prefix sums in
    uint64 wraparound arithmetic: with T[j] = b[j]·B⁻ʲ and C = cumsum(T),
    H(i) = (C[i+k−1] − C[i−1])·B^{i+k−1} = Σ b[i+j]·B^{k−1−j}. Then the
    minimum (by mixed hash value) of each window of ``window`` consecutive
    k-gram hashes, deduplicated — standard winnowing selection.
    """
    n = len(b)
    if n < k:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    powb, powi = _pows(n)
    t = b.astype(np.uint64) * powi[:n]
    c = np.cumsum(t, dtype=np.uint64)
    nh = n - k + 1
    seg = c[k - 1 :].copy()
    seg[1:] -= c[:nh - 1]
    h = _mix(seg * powb[k - 1 : k - 1 + nh])
    if nh <= window:
        pos = np.array([int(h.argmin())], dtype=np.int64)
        return pos, h[pos]
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    pos = win.argmin(axis=1) + np.arange(nh - window + 1, dtype=np.int64)
    pos = np.unique(pos)
    return pos, h[pos]


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 13, window: int = 8
) -> DataFrame:
    """Winnowed content fingerprints → rows (id, pos, fp).

    ``k`` is the gram length in BYTES of the UTF-8 encoding, ``window``
    the winnowing window; the detection guarantee is for substrings of
    length ≥ k + window − 1 bytes. Vectorized numpy per document inside
    one ``mapInArrow`` pass — text never crosses an exchange.
    """
    if k < 2 or window < 1:
        raise ValueError("need k >= 2 and window >= 1")

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1)
            out_ids, out_pos, out_fp = [], [], []
            for i in range(len(ids)):
                txt = texts[i].as_py()
                if txt is None:
                    continue
                b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
                if len(b) >= _MAXLEN:
                    b = b[: _MAXLEN - 1]
                pos, fp = _doc_fingerprints(b, k, window)
                if len(pos):
                    out_ids.append(np.full(len(pos), ids[i].as_py(), dtype=np.int64))
                    out_pos.append(pos)
                    out_fp.append(fp.view(np.int64))
            if not out_ids:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_ids)),
                    pa.array(np.concatenate(out_pos)),
                    pa.array(np.concatenate(out_fp)),
                ],
                names=["id", "pos", "fp"],
            )

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("t")
    ).mapInArrow(fn, "id long, pos long, fp long")


def repeated_substring_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 20,
    window: int = 8,
    max_bucket: int = 1000,
    observation=None,
) -> DataFrame:
    """EXACT pairs (a, b), a < b, of documents sharing a verbatim substring
    of ≥ ``min_len`` UTF-8 bytes.

    candidates = winnowed-fingerprint bucket join (100% recall at min_len
    by the winnowing guarantee; ``max_bucket`` caps boilerplate
    fingerprints with auditable drops, like the LSH paths) → verify =
    exact min_len-gram set intersection on the candidate pairs only.

    ``min_len`` counts CHARACTERS (matching SQL ``substr`` semantics and
    the DuckDB oracle); winnowing runs over UTF-8 BYTES, which only widens
    recall (a min_len-char common substring spans ≥ min_len bytes, so the
    byte-level guarantee still covers it) — the character-gram verify then
    pins the exact semantics.
    """
    from .dedup import pairs_from_band_rows

    k = min_len - window + 1
    if k < 2:
        raise ValueError("min_len must be >= window + 1")
    fps = winnow_fingerprints(df, id_col, text_col, k=k, window=window)
    cands = pairs_from_band_rows(
        fps.select("id", F.col("fp").alias("bk")), max_bucket, observation
    )
    texts = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("t")
    )
    joined = (
        cands.join(texts.select(F.col("id").alias("a"), F.col("t").alias("ta")), "a")
        .join(texts.select(F.col("id").alias("b"), F.col("t").alias("tb")), "b")
    )

    def verify(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            av = batch.column(0).to_pylist()
            bv = batch.column(1).to_pylist()
            ta = batch.column(2).to_pylist()
            tb = batch.column(3).to_pylist()
            keep_a, keep_b = [], []
            for a, b, x, y in zip(av, bv, ta, tb):
                if len(x) < min_len or len(y) < min_len:
                    continue
                if len(y) < len(x):  # build the gram set on the shorter text
                    x, y = y, x
                grams = {x[i : i + min_len] for i in range(len(x) - min_len + 1)}
                if any(
                    y[i : i + min_len] in grams
                    for i in range(len(y) - min_len + 1)
                ):
                    keep_a.append(a)
                    keep_b.append(b)
            if keep_a:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.asarray(keep_a, dtype=np.int64)),
                        pa.array(np.asarray(keep_b, dtype=np.int64)),
                    ],
                    names=["a", "b"],
                )

    return joined.select("a", "b", "ta", "tb").mapInArrow(verify, "a long, b long")
