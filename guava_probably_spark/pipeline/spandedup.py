"""Exact duplicated-substring removal (ExactSubstr dedup).

Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" (arXiv:2107.06499) remove every substring of ≥ 50 tokens that
occurs twice anywhere in the corpus, keeping one occurrence.  Their tool
builds a monolithic suffix array; the Spark-first equivalent is a
window-hash shuffle with the same O(corpus bytes) cost envelope:

1. **window_hashes** — ONE ``mapInArrow`` pass emits every ``min_len``-byte
   window's position and a DUAL 64-bit rolling hash (two independent
   invertible-base polynomials + splitmix finalizers; a cross-pair
   collision needs both 64-bit hashes to collide ⇒ ~2^-128 per pair,
   negligible at any corpus size).  Vectorized prefix-sum Karp–Rabin —
   O(n) per doc, no per-byte Python.
2. **mark non-canonical occurrences** — one wide shuffle on (h1, h2):
   (id, pos) packs into one long ``ip = id·2^20 + pos`` (positions are
   < 2^20 by the 1 MiB doc cap, so the pack preserves (id, pos) order),
   and ``ip != MIN(ip) OVER (PARTITION BY h1, h2)`` marks every
   occurrence but the canonical globally-smallest one.  24 B/row on the
   wire instead of 32, sorted on the hash keys only — no join and no
   second corpus scan.  Keys are hashes, so the shuffle cannot skew; a
   boilerplate window duplicated 10^6 times is one key's min, not a hot
   partition.
3. **gaps-and-islands span merge** — marked windows overlap heavily
   inside a duplicated run (a run of R ≥ L duplicated bytes marks all
   R−L+1 windows); ``lag``/running-sum over (id ORDER BY pos) merges them
   into maximal [start, end) byte spans, all JVM-side.
4. **cut** — join spans back to the (id, text) rows (doc-sized shuffle)
   and rebuild each text minus its spans in one ``mapInArrow`` pass.

Semantics (byte-exact, pinned by tests against a hash-free local
recompute): a window is duplicated iff its BYTE content occurs ≥ 2 times
corpus-wide; every occurrence except the globally smallest (id, pos) is
removed; removal spans are the union of removed windows.  Inside a
self-overlapping repeat (e.g. ``'ab' * 1000``) the kept prefix is the
canonical first window only — the documented degenerate case, same as
the suffix-array tool.  Positions are UTF-8 BYTE offsets; the cut is
exact for any text whose spans fall on character boundaries (always true
for ASCII corpora; multibyte splits are repaired with a lossless
boundary widen — the span only ever removes whole characters).

Scale: the (h1, h2, ip) shuffle is 24 B per corpus byte — the honest
price of EXACT substring dedup (the suffix array is the same order).  At
100 TB run it per shard-group or raise ``min_len``; the winnowing module
(pipeline/winnow.py) is the sampled alternative when approximate
detection is enough.  No reference analogue (guava-probably has no text
operators — SURVEY.md §2.3 maps this tier to the pipeline extensions).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window, functions as F

from .winnow import _MAXLEN, _mix

_B1 = np.uint64(0x100000001B3)  # FNV64 prime
_B2 = np.uint64(0xC6A4A7935BD1E995)  # murmur64 multiplier (odd ⇒ invertible)
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _tables(base: np.uint64, n: int) -> tuple[np.ndarray, np.ndarray]:
    inv = np.uint64(pow(int(base), -1, 1 << 64))
    powb = np.empty(n, dtype=np.uint64)
    powi = np.empty(n, dtype=np.uint64)
    powb[0] = powi[0] = 1
    np.multiply.accumulate(np.full(n - 1, base, dtype=np.uint64), out=powb[1:])
    np.multiply.accumulate(np.full(n - 1, inv, dtype=np.uint64), out=powi[1:])
    return powb, powi


_TBL_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _pows2(base: np.uint64, n: int) -> tuple[np.ndarray, np.ndarray]:
    size = min(_MAXLEN, max(4096, 1 << (int(n - 1).bit_length())))
    key = (int(base), size)
    if key not in _TBL_CACHE:
        if len(_TBL_CACHE) > 4:
            _TBL_CACHE.clear()
        _TBL_CACHE[key] = _tables(base, size)
    return _TBL_CACHE[key]


def _kgram_hashes(b: np.ndarray, k: int, base: np.uint64) -> np.ndarray:
    """Mixed rolling hash of every k-gram (same prefix-sum scheme as
    winnow._doc_fingerprints, parametrized base)."""
    n = len(b)
    powb, powi = _pows2(base, n)
    t = b.astype(np.uint64) * powi[:n]
    c = np.cumsum(t, dtype=np.uint64)
    nh = n - k + 1
    seg = c[k - 1 :].copy()
    seg[1:] -= c[: nh - 1]
    return _mix(seg * powb[k - 1 : k - 1 + nh])


def window_hashes(df: DataFrame, id_col: str, text_col: str, min_len: int) -> DataFrame:
    """(id, pos, h1, h2): dual rolling hash of EVERY min_len-byte window.

    Unlike :func:`winnow.winnow_fingerprints` nothing is sampled — full
    coverage is what makes span removal exact. Null/short texts emit no
    rows. Docs are truncated at 1 MiB like the winnow path.

    Ids must fit ``0 <= id < 2^43`` so (id, pos) packs into one long
    downstream (pos < 2^20 by the doc cap); out-of-range ids raise with
    re-key guidance rather than silently corrupting the canonical order.
    """
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")

    # Output fan-out is ~|text| rows per doc (≈500× the input row count on
    # the bench corpus): one RecordBatch per INPUT batch would be ~130 MB
    # of Arrow buffers, and 32 concurrent tasks blow the JVM's 4 GiB direct
    # -memory pool.  Flush every ~1M rows (~28 MB) instead — batch size is
    # bounded by the CAP, not by the input batch's total fan-out.
    _FLUSH_ROWS = 1 << 20

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        o_id, o_pos, o_h1, o_h2 = [], [], [], []
        pending = 0

        def _flush():
            return pa.RecordBatch.from_arrays(
                [pa.array(np.concatenate(c)) for c in (o_id, o_pos, o_h1, o_h2)],
                names=["id", "pos", "h1", "h2"],
            )

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1)
            for i in range(len(ids)):
                txt = texts[i].as_py()
                if txt is None:
                    continue
                b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
                if len(b) >= _MAXLEN:
                    b = b[: _MAXLEN - 1]
                if len(b) < min_len:
                    continue
                h1 = _kgram_hashes(b, min_len, _B1)
                h2 = _kgram_hashes(b, min_len, _B2)
                doc_id = ids[i].as_py()
                if not 0 <= doc_id < (1 << 43):
                    raise ValueError(
                        f"id {doc_id} outside [0, 2^43): re-key the corpus "
                        "(e.g. dense hash or row_number) before span dedup"
                    )
                o_id.append(np.full(len(h1), doc_id, dtype=np.int64))
                o_pos.append(np.arange(len(h1), dtype=np.int64))
                o_h1.append(h1.view(np.int64))
                o_h2.append(h2.view(np.int64))
                pending += len(h1)
                if pending >= _FLUSH_ROWS:
                    yield _flush()
                    o_id, o_pos, o_h1, o_h2 = [], [], [], []
                    pending = 0
        if o_id:
            yield _flush()

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("t")
    ).mapInArrow(fn, "id long, pos long, h1 long, h2 long")


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, min_len: int = 50
) -> DataFrame:
    """(id, start, end): maximal byte spans of non-canonical duplicated
    windows — exactly what :func:`remove_duplicate_spans` cuts."""
    wh = window_hashes(df, id_col, text_col, min_len)
    # pack (id, pos) into one order-preserving long: the corpus-scale
    # shuffle carries 24 B/row instead of 32 and sorts on (h1, h2) only;
    # min-over-partition marks every non-canonical occurrence without a
    # row_number sort on the payload (same marked set, verified equal)
    packed = wh.select(
        "h1", "h2", (F.col("id") * F.lit(1 << 20) + F.col("pos")).alias("ip")
    )
    wk = Window.partitionBy("h1", "h2")
    marked = (
        packed.withColumn("_m", F.min("ip").over(wk))
        .filter(F.col("ip") != F.col("_m"))
        .select(
            F.shiftright("ip", 20).alias("id"),
            (F.col("ip") % F.lit(1 << 20)).alias("pos"),
        )
    )
    wd = Window.partitionBy("id").orderBy("pos")
    gap = F.when(
        F.col("pos") > F.lag("pos").over(wd) + F.lit(min_len), F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum(gap).over(
        Window.partitionBy("id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        marked.withColumn("_isl", island)
        .groupBy("id", "_isl")
        .agg(
            F.min("pos").alias("start"),
            (F.max("pos") + F.lit(min_len)).alias("end"),
        )
        .select("id", "start", "end")
    )


def _cut_spans(raw: bytes, starts: np.ndarray, ends: np.ndarray) -> bytes:
    """Remove [start, end) byte ranges, widening each cut edge backward /
    forward to the nearest UTF-8 boundary so no character is split."""
    keep = []
    prev = 0
    n = len(raw)

    def _floor_boundary(p: int) -> int:
        while 0 < p < n and (raw[p] & 0xC0) == 0x80:
            p -= 1
        return p

    for s, e in zip(starts, ends):
        s = _floor_boundary(min(int(s), n))
        e = _floor_boundary(min(int(e), n))
        if s > prev:
            keep.append(raw[prev:s])
        prev = max(prev, e)
    if prev < n:
        keep.append(raw[prev:])
    return b"".join(keep)


def spandedup_sql_duck(
    table: str, id_col: str, text_col: str, min_len: int
) -> str:
    """DuckDB oracle for :func:`remove_duplicate_spans` → (id, text).

    Recomputes the semantics on ACTUAL window content (substr — no
    hashing): same canonical rule (row_number over (window content) by
    (id, pos)), same gaps-and-islands merge (new span when
    pos > prev + min_len), same cut.  Character positions equal byte
    positions on ASCII corpora (the testdata), which is where the oracle
    is exact; the Spark side is defined on UTF-8 bytes.
    """
    L = min_len
    return (
        f"WITH d AS (SELECT CAST({id_col} AS BIGINT) AS id, {text_col} AS t "
        f"FROM {table}), "
        f"w AS (SELECT id, t, unnest(generate_series(0, length(t) - {L})) "
        f"AS pos FROM d WHERE length(t) >= {L}), "
        f"m AS (SELECT id, pos, row_number() OVER (PARTITION BY "
        f"substr(t, pos + 1, {L}) ORDER BY id, pos) AS rn FROM w), "
        "mk AS (SELECT id, pos, lag(pos) OVER (PARTITION BY id ORDER BY pos) "
        "AS prev FROM m WHERE rn >= 2), "
        f"isl AS (SELECT id, pos, sum(CASE WHEN prev IS NULL OR "
        f"pos > prev + {L} THEN 1 ELSE 0 END) OVER (PARTITION BY id "
        "ORDER BY pos) AS g FROM mk), "
        f"sp AS (SELECT id, min(pos) AS s, max(pos) + {L} AS e "
        "FROM isl GROUP BY id, g), "
        "seg AS (SELECT id, coalesce(lag(e) OVER (PARTITION BY id "
        "ORDER BY s), 0) AS ps, s FROM sp), "
        "head AS (SELECT seg.id, string_agg(substr(d.t, ps + 1, s - ps), "
        "'' ORDER BY s) AS kept FROM seg JOIN d USING (id) GROUP BY seg.id), "
        "tl AS (SELECT id, max(e) AS me FROM sp GROUP BY id) "
        "SELECT d.id, CASE WHEN tl.id IS NULL THEN d.t "
        "ELSE coalesce(head.kept, '') || substr(d.t, tl.me + 1) END AS text "
        "FROM d LEFT JOIN head ON d.id = head.id "
        "LEFT JOIN tl ON d.id = tl.id"
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, min_len: int = 50
) -> DataFrame:
    """(id, text, removed_bytes): the corpus with every duplicated
    ≥ min_len-byte substring removed except its canonical occurrence.

    Rows without spans pass through untouched (removed_bytes = 0),
    including null texts.  One spans pipeline + one doc-sized join +
    one ``mapInArrow`` rebuild pass.
    """
    spans = (
        duplicate_spans(df, id_col, text_col, min_len)
        .groupBy("id")
        .agg(
            F.sort_array(F.collect_list(F.struct("start", "end"))).alias("_sp")
        )
        .select(
            "id",
            F.expr("transform(_sp, s -> s.start)").alias("_starts"),
            F.expr("transform(_sp, s -> s.end)").alias("_ends"),
        )
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("_t")
    ).join(spans, "id", "left")

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1)
            starts = batch.column(2)
            ends = batch.column(3)
            o_id, o_txt, o_rm = [], [], []
            for i in range(len(ids)):
                txt = texts[i].as_py()
                st = starts[i].as_py()
                o_id.append(ids[i].as_py())
                if txt is None or not st:
                    o_txt.append(txt)
                    o_rm.append(0)
                    continue
                raw = txt.encode("utf-8")
                cut = _cut_spans(
                    raw,
                    np.asarray(st, dtype=np.int64),
                    np.asarray(ends[i].as_py(), dtype=np.int64),
                )
                o_txt.append(cut.decode("utf-8"))
                o_rm.append(len(raw) - len(cut))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, pa.int64()),
                    pa.array(o_txt, pa.string()),
                    pa.array(o_rm, pa.int64()),
                ],
                names=["id", "text", "removed_bytes"],
            )

    return src.mapInArrow(fn, "id long, text string, removed_bytes long")
