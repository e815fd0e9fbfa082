"""Weighted MinHash (ICWS) near-dup over the word-trigram MULTISET.

Plain MinHash (``pipeline/dedup.py``) estimates SET Jaccard — a document
that repeats a trigram 40 times and one that uses it once look identical.
This module estimates **weighted Jaccard** J_w(A,B) = Σ_t min(a_t, b_t) /
Σ_t max(a_t, b_t) over trigram multiplicities, the measure that separates
"same template stamped N times" from "mentions it once" — spam mills,
keyword-stuffed SEO pages and log-dump documents differ from clean text
mostly in WEIGHT, not vocabulary.

Sampler: Improved Consistent Weighted Sampling (Ioffe, ICDM 2010 §4).
Per trigram t and hash index i, three token-seeded variates
(r ~ Gamma(2,1), c ~ Gamma(2,1), β ~ U(0,1)) give

    t_k  = ⌊ln(w_t)/r + β⌋
    ln a = ln c − r·(t_k − β + 1)

and the i-th signature element is the (t, t_k) pair minimizing ``ln a``;
P[element_A == element_B] = J_w exactly (the paper's Theorem 1 — no bias,
unlike earlier CWS variants). Integer weights mean t_k ≥ 0 always.

Scale shape (mirrors the set-MinHash path, the measured-fastest layout):

- **Signatures/band keys** in ONE ``mapInArrow`` pass — tokenize with
  pyarrow C kernels, 64-bit trigram hashes by mixing three consecutive
  token hashes (no trigram strings), per-doc (hash, count) pairs by one
  lexsort, ICWS vectorized over (pair, perm-chunk) blocks. Only ``bands``
  8-byte keys per doc cross the shuffle.
- **Candidates** via the shared ``pairs_from_band_rows`` bucket join
  (skew-capped, drop-audited).
- **Verify** exactly on the candidate-reduced corpus only: trigram COUNTS
  (``trigram_counts_df``) and integer Σmin/Σmax sums — oracle-grade, the
  DuckDB twin recomputes identical BIGINTs (hash-checkable).

Variates are derived from (trigram hash, perm, stream) fmix64 mixes, so
signatures are deterministic under any partitioning/batching — same
corpus → identical candidates → identical verified pairs.

Reference parity: guava-probably has no weighted-similarity surface
(SURVEY.md §2 — filters only); this is north-rule pipeline tier.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window, functions as F

from guava_probably_spark.pipeline import textexpr
from guava_probably_spark.pipeline.dedup import (
    _hash_token_u64,
    _list_array,
    pairs_from_band_rows,
    utf8_buffer,
)
from guava_probably_spark.sketches.hashing import _fmix64, _fmix64_s

DEFAULT_NUM_HASHES = 128
DEFAULT_BANDS = 64  # r = 2: P(miss | J_w=0.5) = (1-0.25)^64 ≈ 1e-8
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_U53 = float(2.0**-53)


def _stream_keys(num_hashes: int, seed: int) -> np.ndarray:
    """(num_hashes, 5) uint64 mix keys — one per (perm, variate-stream)."""
    base = _fmix64_s((seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF)
    idx = np.arange(num_hashes * 5, dtype=np.uint64).reshape(num_hashes, 5)
    with np.errstate(over="ignore"):
        return _fmix64(np.uint64(base) ^ (idx + np.uint64(1)) * _GOLDEN)


def _unit(h: np.ndarray) -> np.ndarray:
    """uint64 → float64 strictly inside (0, 1) (logs never see 0)."""
    return ((h >> np.uint64(11)).astype(np.float64) + 0.5) * _U53


def _doc_trigram_counts(batch: pa.RecordBatch):
    """One (id, text) Arrow batch → per-doc trigram-hash multiset.

    Returns (ids[n_docs], seg_starts[n_docs+1], hh[n_pairs], cnt[n_pairs])
    where hh/cnt are sorted by doc then hash, seg_starts delimits each
    doc's slice, and docs with zero trigrams (< 3 tokens) are dropped.
    Token → trigram hashing is the same rotate-xor-fmix mix the set-MinHash
    kernel uses (dedup._sig_matrix_from_batch), so both paths agree on
    shingle identity up to the same ~n²/2⁶⁴ collision odds.
    """
    import pyarrow.compute as pc

    ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(ids)
    if n_docs == 0:
        return None
    arr = batch.column(1)
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(arr)), r"\s+"
    )
    flat = toks.flatten()
    list_off = np.frombuffer(toks.buffers()[1], dtype=np.int32)[
        toks.offset : toks.offset + n_docs + 1
    ].astype(np.int64)
    buf, starts = utf8_buffer(flat)
    th = _hash_token_u64(buf, starts)
    if len(th) < 3:
        return None
    with np.errstate(over="ignore"):
        sh = _fmix64(
            th[:-2]
            ^ ((th[1:-1] << np.uint64(21)) | (th[1:-1] >> np.uint64(43)))
            ^ ((th[2:] << np.uint64(42)) | (th[2:] >> np.uint64(22)))
        )
    base = list_off - list_off[0]
    pos = np.arange(len(sh), dtype=np.int64)
    doc_of = np.searchsorted(base, pos, side="right") - 1
    # a doc's trigrams live at [base[d], base[d+1]-2): the last two windows
    # straddle the doc boundary
    valid = pos < base[doc_of + 1] - 2
    dd, hh = doc_of[valid], sh[valid]
    if len(dd) == 0:
        return None
    order = np.lexsort((hh, dd))
    dd, hh = dd[order], hh[order]
    change = np.empty(len(dd), dtype=bool)
    change[0] = True
    change[1:] = (dd[1:] != dd[:-1]) | (hh[1:] != hh[:-1])
    first = np.flatnonzero(change)
    cnt = np.diff(np.append(first, len(dd))).astype(np.int64)
    dd_u, hh_u = dd[first], hh[first]
    docs_present, seg_counts = np.unique(dd_u, return_counts=True)
    seg_starts = np.concatenate([[0], np.cumsum(seg_counts)])
    return ids[docs_present], seg_starts, hh_u, cnt


def _fmix64_into(k: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """In-place fmix64 over ``k`` using scratch ``tmp`` (same shape) — no
    fresh allocations; with 32 concurrent workers, freshly-mmapped
    temporaries turn into a kernel page-zeroing storm (see the set-MinHash
    kernel's measured 15 s/task for a 0.5 s compute)."""
    from guava_probably_spark.sketches.hashing import _F1, _F2, _SHIFT33

    np.right_shift(k, _SHIFT33, out=tmp)
    np.bitwise_xor(k, tmp, out=k)
    np.multiply(k, _F1, out=k)
    np.right_shift(k, _SHIFT33, out=tmp)
    np.bitwise_xor(k, tmp, out=k)
    np.multiply(k, _F2, out=k)
    np.right_shift(k, _SHIFT33, out=tmp)
    np.bitwise_xor(k, tmp, out=k)
    return k


def _icws_sig_matrix(
    seg_starts: np.ndarray,
    hh: np.ndarray,
    cnt: np.ndarray,
    num_hashes: int,
    seed: int,
    chunk: int = 8,
    block_pairs: int = 1 << 18,
) -> np.ndarray:
    """(n_docs, num_hashes) int64 ICWS elements, doc segments delimited by
    ``seg_starts`` over (hh, cnt) pairs. Perm dimension is chunked AND the
    pair dimension is processed in doc-aligned blocks of ≤ ``block_pairs``
    with every scratch buffer allocated ONCE and reused — the naive
    (n_pairs × chunk) temporaries are ~1 GB of fresh pages per Arrow batch
    per stream, which this sandbox's page-zeroing pressure turns into the
    dominant cost. Signatures are block-invariant: each doc's segment is
    computed whole, from (trigram hash, perm) mixes only."""
    n_docs = len(seg_starts) - 1
    sig = np.empty((n_docs, num_hashes), dtype=np.int64)
    if n_docs == 0:
        return sig
    keys = _stream_keys(num_hashes, seed)
    lnw_all = np.log(cnt.astype(np.float64))
    # scratch, reused across blocks and perm chunks; one oversized doc
    # segment still gets a whole block to itself
    cap = max(block_pairs, int(np.diff(seg_starts).max()))
    hbuf = np.empty((cap, chunk), dtype=np.uint64)
    tmpu = np.empty((cap, chunk), dtype=np.uint64)
    r = np.empty((cap, chunk), dtype=np.float64)
    lnc = np.empty((cap, chunk), dtype=np.float64)
    beta = np.empty((cap, chunk), dtype=np.float64)
    t_k = np.empty((cap, chunk), dtype=np.float64)
    lna = np.empty((cap, chunk), dtype=np.float64)
    warg = np.empty(cap, dtype=np.int64)

    with np.errstate(over="ignore"):
        d0 = 0
        while d0 < n_docs:
            d1 = d0 + 1
            while (
                d1 < n_docs
                and seg_starts[d1 + 1] - seg_starts[d0] <= block_pairs
            ):
                d1 += 1
            p0, p1 = int(seg_starts[d0]), int(seg_starts[d1])
            n = p1 - p0
            bh = hh[p0:p1]
            lnw = lnw_all[p0:p1]
            bstarts = (seg_starts[d0:d1] - p0).astype(np.int64)
            seg_of = np.repeat(
                np.arange(d1 - d0, dtype=np.int64), np.diff(seg_starts[d0 : d1 + 1])
            )
            pos = np.arange(n, dtype=np.int64)
            for c0 in range(0, num_hashes, chunk):
                c1 = min(c0 + chunk, num_hashes)
                k = c1 - c0

                def gen_unit(dst, j):
                    np.bitwise_xor(
                        bh[:, None], keys[None, c0:c1, j], out=hbuf[:n, :k]
                    )
                    _fmix64_into(hbuf[:n, :k], tmpu[:n, :k])
                    np.right_shift(hbuf[:n, :k], np.uint64(11), out=hbuf[:n, :k])
                    dst[:n, :k] = hbuf[:n, :k]
                    dst[:n, :k] += 0.5
                    dst[:n, :k] *= _U53

                # r = -ln(u0·u1) ~ Gamma(2,1)
                gen_unit(r, 0)
                gen_unit(t_k, 1)  # t_k as scratch for u1
                np.multiply(r[:n, :k], t_k[:n, :k], out=r[:n, :k])
                np.log(r[:n, :k], out=r[:n, :k])
                np.negative(r[:n, :k], out=r[:n, :k])
                # lnc = ln(-ln(u2·u3))
                gen_unit(lnc, 2)
                gen_unit(t_k, 3)
                np.multiply(lnc[:n, :k], t_k[:n, :k], out=lnc[:n, :k])
                np.log(lnc[:n, :k], out=lnc[:n, :k])
                np.negative(lnc[:n, :k], out=lnc[:n, :k])
                np.log(lnc[:n, :k], out=lnc[:n, :k])
                gen_unit(beta, 4)
                # t_k = floor(lnw/r + beta)
                np.divide(lnw[:, None], r[:n, :k], out=t_k[:n, :k])
                np.add(t_k[:n, :k], beta[:n, :k], out=t_k[:n, :k])
                np.floor(t_k[:n, :k], out=t_k[:n, :k])
                # lna = lnc − r·(t_k − beta + 1)
                np.subtract(t_k[:n, :k], beta[:n, :k], out=lna[:n, :k])
                np.add(lna[:n, :k], 1.0, out=lna[:n, :k])
                np.multiply(lna[:n, :k], r[:n, :k], out=lna[:n, :k])
                np.subtract(lnc[:n, :k], lna[:n, :k], out=lna[:n, :k])
                for p in range(k):
                    col = lna[:n, p]
                    mins = np.minimum.reduceat(col, bstarts)
                    warg[:n] = np.where(col == mins[seg_of], pos, n)
                    win = np.minimum.reduceat(warg[:n], bstarts)
                    tk_w = t_k[win, p].astype(np.uint64)
                    elem = _fmix64(bh[win] ^ _fmix64(tk_w + _GOLDEN))
                    sig[d0:d1, c0 + p] = elem.view(np.int64)
            d0 = d1
    return sig


def _pack_band_keys(ids: np.ndarray, u: np.ndarray, bands: int) -> tuple:
    """(out_ids, out_bks) packed LSH band keys from a uint64 signature
    matrix — band_idx in the top byte, 56-bit band hash below (the same
    layout as dedup.minhash_band_keys, so keys from the two families never
    collide into each other only by luck of the low bits)."""
    n, num_hashes = u.shape
    r = num_hashes // bands
    bks = np.empty((bands, n), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(bands):
            acc = np.full(n, np.uint64(j + 1), dtype=np.uint64)
            for c in range(j * r, (j + 1) * r):
                acc = _fmix64(acc ^ u[:, c])
            bks[j] = (np.uint64(j) << np.uint64(56)) | (acc >> np.uint64(8))
    return np.repeat(ids, bands), bks.T.reshape(-1).view(np.int64)


def wmh_signatures_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    seed: int = 0x5EED,
) -> DataFrame:
    """(id, sig: array<long>) ICWS signatures straight from (id, text) —
    zero shuffle, one Arrow pass per partition. Element-match fraction
    between two signatures is an unbiased estimate of weighted trigram
    Jaccard (Ioffe 2010 Thm 1), σ = √(J(1−J)/num_hashes)."""
    out_schema = "id long, sig array<long>"

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            parts = _doc_trigram_counts(batch)
            if parts is None:
                continue
            ids, seg_starts, hh, cnt = parts
            sig = _icws_sig_matrix(seg_starts, hh, cnt, num_hashes, seed)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), _list_array(sig)], names=["id", "sig"]
            )

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col)
    ).mapInArrow(build, out_schema)


def wmh_band_keys(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    seed: int = 0x5EED,
) -> DataFrame:
    """(id, bk) LSH band keys over ICWS signatures, computed entirely
    inside the Arrow pass — only ``bands`` 8-byte keys per doc are
    emitted (the set-MinHash band-key layout and skew story apply)."""
    if bands > 256:
        raise ValueError("bands must be ≤ 256 for the packed key layout")
    out_schema = "id long, bk long"

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            parts = _doc_trigram_counts(batch)
            if parts is None:
                continue
            ids, seg_starts, hh, cnt = parts
            sig = _icws_sig_matrix(seg_starts, hh, cnt, num_hashes, seed)
            out_ids, out_bks = _pack_band_keys(ids, sig.view(np.uint64), bands)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids), pa.array(out_bks)], names=["id", "bk"]
            )

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col)
    ).mapInArrow(build, out_schema)


def trigram_counts_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, shingle, cnt) word-trigram MULTISET — ``dedup.shingle_df``
    without the distinct, counts instead (same posexplode + lead windows;
    the naive transform() form re-runs tokenization per element)."""
    words = F.expr(textexpr.words_expr(text_col, "spark"))
    toks = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(words).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    tri = F.concat_ws(
        " ", F.col("tok"), F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
    )
    return (
        toks.select(
            "id",
            F.lead("tok", 2).over(w).isNotNull().alias("ok"),
            tri.alias("shingle"),
        )
        .filter("ok")
        .groupBy("id", "shingle")
        .agg(F.count("*").alias("cnt"))
    )


def weighted_jaccard_pairs(
    wcounts: DataFrame, pairs: DataFrame, materialize: bool | None = None
) -> DataFrame:
    """Exact (a, b, inter, uni) weighted Jaccard for candidate pairs over an
    (id, shingle, cnt) multiset relation. inter = Σ min(cnt_a, cnt_b) via a
    shuffle join on the shingle key restricted to candidates;
    uni = Σ max = total_a + total_b − inter (min + max = a + b termwise,
    and one-sided shingles contribute wholly to max). Integer outputs only.

    Same pinning shape as ``dedup.exact_jaccard_pairs`` (which see for the
    localCheckpoint speed/lineage trade): the count relation appears on
    four plan branches and ``pairs`` on three; ``materialize`` (default
    ``config.PIN_INTERMEDIATES``) pins each once."""
    from guava_probably_spark.config import pin_default

    materialize = pin_default(materialize)
    if materialize:
        pairs = pairs.localCheckpoint(eager=True)
    ids = (
        pairs.select(F.col("a").alias("id"))
        .union(pairs.select(F.col("b").alias("id")))
        .distinct()
    )
    wc = wcounts.join(ids, "id")
    if materialize:
        wc = wc.localCheckpoint(eager=True)
    totals = wc.groupBy("id").agg(F.sum("cnt").alias("t"))
    wa = wc.select(F.col("id").alias("a"), "shingle", F.col("cnt").alias("ca"))
    wb = wc.select(F.col("id").alias("b"), "shingle", F.col("cnt").alias("cb"))
    inter = (
        pairs.join(wa, "a")
        .join(wb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.sum(F.least("ca", "cb")).alias("inter"))
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .fillna(0, subset=["inter"])
        .join(totals.withColumnRenamed("id", "a").withColumnRenamed("t", "ta"), "a")
        .join(totals.withColumnRenamed("id", "b").withColumnRenamed("t", "tb"), "b")
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            (F.col("ta") + F.col("tb") - F.col("inter"))
            .cast("long")
            .alias("uni"),
        )
    )


def neardup_pairs_wminhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    observation=None,
    materialize: bool | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """End-to-end weighted-MinHash near-dup: ICWS band-key candidates, then
    exact weighted trigram-Jaccard verification at ``threshold``. Returns
    (a, b, inter, uni) with inter = Σ min counts, uni = Σ max counts.

    Same two-phase scale shape as ``dedup.neardup_pairs_minhash`` (which
    see): one banding scan, skew-capped bucket join, corpus ``left_semi``-
    reduced to candidate ids before the trigram explode, pinning per
    ``config.PIN_INTERMEDIATES``. True pairs at J_w ≥ threshold are missed
    with probability ≤ (1 − J_w^r)^bands ≈ 1e-8 at the defaults."""
    from guava_probably_spark.config import pin_default

    materialize = pin_default(materialize)
    bk = wmh_band_keys(df, id_col, text_col, num_hashes, bands)
    cand = pairs_from_band_rows(bk, max_bucket, observation)
    if materialize:
        cand = cand.localCheckpoint(eager=True)
    ids = (
        cand.select(F.col("a").alias("id"))
        .union(cand.select(F.col("b").alias("id")))
        .distinct()
    )
    docs_c = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col)
    ).join(ids, "id", "left_semi")
    wc = trigram_counts_df(docs_c, "id", text_col)
    verified = weighted_jaccard_pairs(wc, cand, materialize=materialize)
    return verified.filter(F.col("inter") * (1.0 / threshold) >= F.col("uni"))
