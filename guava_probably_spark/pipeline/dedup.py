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


def utf8_buffer(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (uint8 data, int64 offsets) view of an Arrow utf8 array.

    The Arrow string layout IS the (buffer, offsets) shape the murmur3
    kernel wants — going through to_pylist()/encode() costs a Python loop
    per value (measured 10×+ on bulk simhash/minhash)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return data, off.astype(np.int64)

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
    """Distinct (id, shingle) word-trigram pairs.

    posexplode + window-lead rather than the naive
    ``explode(transform(sequence(...), i -> ... element_at(words, i) ...))``:
    Catalyst does NOT common-subexpression the words array into the lambda,
    so the naive form re-runs regex+split once per element — a measured
    ~50× blowup on 54-token docs. Here the tokenization runs once per row,
    then trigram assembly is two ``lead`` windows over the exploded tokens
    (one shuffle on id, which the downstream signature grouping needs
    anyway).
    """
    from pyspark.sql import Window

    words = F.expr(textexpr.words_expr(text_col, "spark"))
    toks = df.select(
        F.col(id_col).cast("long").alias("id"), F.posexplode(words).alias("pos", "tok")
    )
    w = Window.partitionBy("id").orderBy("pos")
    tri = F.concat_ws(
        " ", F.col("tok"), F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
    )
    return (
        toks.select("id", F.lead("tok", 2).over(w).isNotNull().alias("ok"), tri.alias("shingle"))
        .filter("ok")
        .select("id", "shingle")
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
            buf, starts = utf8_buffer(batch.column("shingle"))
            h1, _ = hash128_bytes(buf, starts)
            # hv: (n_shingles, num_hashes) universal hashes, in uint64 mod 2^64
            # then reduced mod Mersenne-61 (well below 2^63 → safe as int64).
            hv = (h1[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE_61)
            order = np.argsort(ids, kind="stable")
            ids_s, hv_s = ids[order], hv[order]
            uniq, group_starts = np.unique(ids_s, return_index=True)
            sigs = np.minimum.reduceat(hv_s, group_starts, axis=0).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq), _list_array(sigs)], names=["id", "sig"]
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


def minhash_signatures_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    seed: int = 0x5EED,
) -> DataFrame:
    """(id, sig) MinHash signatures straight from (id, text) — the bulk path.

    ZERO shuffle and zero string materialization: each document is complete
    within its row, so one ``mapInArrow`` pass per partition tokenizes
    (pyarrow C kernels), hashes tokens (vectorized 8-byte mix), composes
    word-trigram shingle hashes by mixing three consecutive token hashes
    (no trigram strings ever built), and takes the 128 segmented minima.
    The explode → distinct → repartition shingle pipeline costs two wide
    shuffles of ~54× the corpus row count; this path reads the scan and
    emits one signature row per doc. Shingle identity is by 64-bit hash
    (collision odds ~n²/2⁶⁴ — immaterial for near-dup estimation; the
    oracle-exact string path in ``shingle_df`` remains for verification).
    """
    import pyarrow.compute as pc

    from guava_probably_spark.sketches.hashing import _fmix64

    a, b = _perm_params(num_hashes, seed)
    out_schema = "id long, sig array<long>"

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids, sigs = _sig_matrix_from_batch(batch, a, b, num_hashes)
            if ids is None:
                continue
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), _list_array(sigs)], names=["id", "sig"]
            )

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col)
    ).mapInArrow(build, out_schema)


def _sig_matrix_from_batch(
    batch: pa.RecordBatch, a: np.ndarray, b: np.ndarray, num_hashes: int
):
    """(ids int64[n], sigs int64[n, num_hashes]) for one (id, text) batch."""
    import pyarrow.compute as pc

    from guava_probably_spark.sketches.hashing import _fmix64

    ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(ids)
    if n_docs == 0:
        return None, None
    arr = batch.column(1)
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(pc.utf8_lower(arr)), r"\s+")
    flat = toks.flatten()
    list_off = np.frombuffer(toks.buffers()[1], dtype=np.int32)[
        toks.offset : toks.offset + n_docs + 1
    ].astype(np.int64)
    buf, starts = utf8_buffer(flat)
    th = _hash_token_u64(buf, starts)
    sigs = np.full((n_docs, num_hashes), np.iinfo(np.int64).max, dtype=np.int64)
    if len(th) >= 3:
        with np.errstate(over="ignore"):
            sh = _fmix64(
                th[:-2]
                ^ ((th[1:-1] << np.uint64(21)) | (th[1:-1] >> np.uint64(43)))
                ^ ((th[2:] << np.uint64(42)) | (th[2:] >> np.uint64(22)))
            )
        base = list_off - list_off[0]
        # doc d's shingles live at [base[d], base[d+1]-2); docs with <3
        # tokens have none. Mask cross-doc windows by zapping the last two
        # positions of each doc to the identity (max).
        counts = np.diff(base)
        tail = np.concatenate([base[1:] - 2, base[1:] - 1])
        tail = tail[(tail >= 0) & (tail < len(sh))]
        # segment only docs that own at least one flat-array position below
        # len(sh): clamping out-of-range starts instead (the old approach)
        # TRUNCATED the preceding doc's segment when a trailing empty doc's
        # start hit the clamp, so its signature depended on batch layout —
        # nondeterministically missed near-dup pairs. Valid starts are
        # strictly increasing (each valid doc owns >=1 token position), and
        # the zapped tail positions are min-identity so full doc boundaries
        # work as reduceat bounds. Docs with <3 tokens stay at the identity
        # and are masked by `has` below.
        valid = (counts > 0) & (base[:-1] < len(sh))
        starts_v = base[:-1][valid]
        nv = int(valid.sum())
        mins = np.empty((n_docs, num_hashes), dtype=np.int64)
        # chunk the permutation dimension AND reuse one scratch buffer via
        # out= for every chunk: fresh (16, n_sh) temporaries per chunk are
        # freshly-mmapped pages, and with 32 concurrent workers the kernel
        # page-zeroing storm measured 15 s/task for a 0.5 s kernel. One
        # allocation per batch, all chunk math in place.
        hv = np.empty((16, len(sh)), dtype=np.uint64)
        mchunk = np.empty((16, n_docs), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c0 in range(0, num_hashes, 16):
                c1 = min(c0 + 16, num_hashes)
                k = c1 - c0
                # (perm, shingle) C-order so the segmented min runs along
                # contiguous rows (strided-axis reduceat is ~10× slower).
                # No `% Mersenne61`: the uint64 modmul was 8× the multiply
                # cost, and min over the wrap-around multiply-shift family
                # (a·h+b mod 2^64) is an equally valid minhash — only
                # bit-pattern equality of minima matters downstream.
                np.multiply(a[c0:c1, None], sh[None, :], out=hv[:k])
                np.add(hv[:k], b[c0:c1, None], out=hv[:k])
                hv[:k, tail] = np.uint64(0xFFFFFFFFFFFFFFFF)
                np.minimum.reduceat(hv[:k], starts_v, axis=1, out=mchunk[:k, :nv])
                mins[valid, c0:c1] = mchunk[:k, :nv].T.view(np.int64)
        has = counts >= 3
        sigs[has] = mins[has]
    return ids, sigs


def minhash_band_keys(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    seed: int = 0x5EED,
) -> DataFrame:
    """(id, bk) LSH band keys computed entirely inside the Arrow pass.

    The full-signature path ships a 128-long array per doc to the JVM and
    re-hashes slices there; for candidate generation only the ``bands``
    8-byte keys are needed, so this emits them directly — ~2.5× less
    shuffle input and no JVM array/lambda work. Key layout:
    band_idx in the top byte, 56-bit band hash below (needs bands ≤ 256).
    """
    from guava_probably_spark.sketches.hashing import _fmix64

    if bands > 256:
        raise ValueError("bands must be ≤ 256 for the packed key layout")
    a, b = _perm_params(num_hashes, seed)
    r = num_hashes // bands
    out_schema = "id long, bk long"

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids, sigs = _sig_matrix_from_batch(batch, a, b, num_hashes)
            if ids is None:
                continue
            # docs with <3 tokens carry the sentinel signature — all equal,
            # so they would band-collide with each other; they have no
            # shingles, hence no Jaccard, hence no pairs: drop them here
            real = sigs[:, 0] != np.iinfo(np.int64).max
            ids = ids[real]
            u = sigs[real].view(np.uint64)
            n = len(ids)
            if n == 0:
                continue
            bks = np.empty((bands, n), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(bands):
                    acc = np.full(n, np.uint64(j + 1), dtype=np.uint64)
                    for c in range(j * r, (j + 1) * r):
                        acc = _fmix64(acc ^ u[:, c])
                    bks[j] = (np.uint64(j) << np.uint64(56)) | (acc >> np.uint64(8))
            out_ids = np.repeat(ids, bands)
            out_bks = bks.T.reshape(-1).view(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids), pa.array(out_bks)], names=["id", "bk"]
            )

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col)
    ).mapInArrow(build, out_schema)


def _list_array(mat: np.ndarray) -> pa.ListArray:
    """(n, k) int64 matrix → arrow list<int64> without a python list detour."""
    n, k = mat.shape
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * k)
    return pa.ListArray.from_arrays(offsets, pa.array(mat.ravel()))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = DEFAULT_BANDS,
    max_bucket: int = 1000,
    observation=None,
    num_hashes: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a, b), a < b, sharing at least one LSH band.

    Each signature explodes into ``bands`` (band_idx, band_key) rows; a
    shuffle groups bucket members; pairs are emitted within buckets of size
    ≤ max_bucket (larger buckets are skew pathologies — dropped, NOT
    silently: action ``lsh_drop_stats(signatures, bands, max_bucket)`` for
    the dropped bucket/member counts; see ``banding_drop_stats`` for why
    that is a separate cheap pass rather than a same-action Observation).
    """
    exploded = _band_rows(signatures, bands, num_hashes)
    return pairs_from_band_rows(exploded, max_bucket, observation)


def _band_rows(
    signatures: DataFrame, bands: int, num_hashes: int | None = None
) -> DataFrame:
    """(id, bk) band rows for the array-signature path.

    Pass ``num_hashes`` (the signature length — every call site knows it):
    probing it from the data is a full Spark ACTION that evaluates the
    whole uncached shingle+minhash pipeline once just to read an array
    length, doubling the most expensive stage of the job."""
    n = (
        num_hashes
        if num_hashes is not None
        else signatures.select(F.size("sig").alias("s")).first().s
    )
    r = n // bands
    # packed numeric band key (band_idx << 32 | band_hash): a 12.8M-row
    # shuffle of 8-byte longs instead of ~20-byte strings
    band_key = F.expr(
        f"transform(sequence(0, {bands - 1}), j -> "
        f"CAST(j AS BIGINT) * 4294967296 + "
        f"(CAST(hash(slice(sig, j * {r} + 1, {r})) AS BIGINT) & 4294967295))"
    )
    return signatures.select("id", F.explode(band_key).alias("bk"))


def banding_drop_stats(band_rows: DataFrame, max_bucket: int = 1000) -> DataFrame:
    """One-row (dropped_buckets, dropped_members) audit of the skew cap
    over (id, bk) band rows — the count the cap must never lose silently.

    This is a SEPARATE narrow pass on purpose: only (bk, count) longs cross
    the shuffle (no members arrays, no pair blow-up), so it costs a small
    fraction of the pair join it audits. A same-action ``observe`` would be
    free, and ``pairs_from_band_rows`` still attaches one when you pass
    ``observation`` — but Spark's AQE currently drops CollectMetrics rows
    under the generate-then-aggregate shape of the pair plan (empty metrics
    row from ``Observation.get``), so with AQE on this pass is the reliable
    audit.
    """
    sizes = band_rows.groupBy("bk").agg(F.count("*").alias("sz"))
    over = F.col("sz") > max_bucket
    return sizes.agg(
        F.coalesce(F.sum(over.cast("long")), F.lit(0)).alias("dropped_buckets"),
        F.coalesce(F.sum(F.when(over, F.col("sz"))), F.lit(0)).alias(
            "dropped_members"
        ),
    )


def lsh_drop_stats(
    signatures: DataFrame,
    bands: int = DEFAULT_BANDS,
    max_bucket: int = 1000,
    num_hashes: int | None = None,
) -> DataFrame:
    """Skew-cap drop audit for ``lsh_candidate_pairs`` (same banding)."""
    return banding_drop_stats(_band_rows(signatures, bands, num_hashes), max_bucket)


def _observe_bucket_drops(buckets: DataFrame, max_bucket: int, observation):
    """Attach dropped-bucket metrics to the banding action itself.

    ``observation.get`` (after any action on the returned plan) yields
    ``{"dropped_buckets": n, "dropped_members": m}`` — the skew-cap drop
    count the caller must not lose silently. Costs nothing when it works:
    Observe rides the existing pass, no second job. CAVEAT: with AQE on,
    Spark currently loses the CollectMetrics row under this plan's
    generate-then-aggregate shape (``Observation.get`` sees an empty row) —
    ``banding_drop_stats`` is the AQE-proof audit.
    """
    if observation is None:
        return buckets
    over = F.size("members") > max_bucket
    return buckets.observe(
        observation,
        F.coalesce(F.sum(over.cast("long")), F.lit(0)).alias("dropped_buckets"),
        F.coalesce(
            F.sum(F.when(over, F.size("members")).cast("long")), F.lit(0)
        ).alias("dropped_members"),
    )


def pairs_from_band_rows(
    band_rows: DataFrame, max_bucket: int = 1000, observation=None
) -> DataFrame:
    """Distinct (a, b), a < b, from (id, bk) band rows — shared bucket join
    for the array-signature and arrow-native band-key paths. ``observation``
    (a ``pyspark.sql.Observation``) reports skew-cap drops; see
    ``_observe_bucket_drops``."""
    buckets = band_rows.groupBy("bk").agg(F.collect_list("id").alias("members"))
    buckets = _observe_bucket_drops(buckets, max_bucket, observation)
    return (
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


def exact_jaccard_pairs(
    shingles: DataFrame, pairs: DataFrame, materialize: bool | None = None
) -> DataFrame:
    """Exact (a, b, inter, uni) word-trigram Jaccard for candidate pairs.

    inter via a shuffle join on the shingle key restricted to candidates;
    uni = |A| + |B| − inter. Integer outputs only (the oracle contract
    avoids float columns).

    The shingle relation appears on four plan branches (sizes ×2, a-side,
    b-side) and ``pairs`` on three, and Spark does not reuse the exchange
    across them — naively each shingle branch re-derives the CORPUS-scale
    explode and each pairs branch re-runs the whole candidate pipeline
    (minhash signatures + banding). With ``materialize=True`` (default)
    both are pinned once with eager localCheckpoints: the pair table is
    id-pairs only (16 B/row, bounded by the banding skew caps) and the
    shingle set is semi-reduced to the candidate doc ids first
    (|candidate docs| × shingles/doc — the verify stage's own working
    set). One corpus-scale derivation + one candidate derivation instead
    of four + three (measured 33.4 → 20.6 s at 400k docs).

    Trade (and why it is the default): localCheckpoint truncates lineage,
    so losing an executor that holds checkpoint blocks fails the JOB
    instead of recomputing — and construction itself runs the pinning
    jobs eagerly. ``materialize=False`` restores the fully lazy,
    lineage-recoverable plan at the multi-derivation cost — prefer it
    only when executors are preemptible and the candidate pipeline is
    cheap. Default ``None`` resolves to ``config.PIN_INTERMEDIATES``
    (the deploy-time switch; see guava_probably_spark/config.py).
    """
    from guava_probably_spark.config import pin_default

    materialize = pin_default(materialize)
    if materialize:
        pairs = pairs.localCheckpoint(eager=True)
    ids = (
        pairs.select(F.col("a").alias("id"))
        .union(pairs.select(F.col("b").alias("id")))
        .distinct()
    )
    sh_c = shingles.join(ids, "id")
    if materialize:
        sh_c = sh_c.localCheckpoint(eager=True)
    sizes = sh_c.groupBy("id").agg(F.count("*").alias("n_sh"))
    sa = sh_c.select(F.col("id").alias("a"), "shingle")
    sb = sh_c.select(F.col("id").alias("b"), "shingle")
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
    observation=None,
    materialize: bool | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """End-to-end MinHash+LSH near-dup: candidates by banding, then exact
    trigram-Jaccard verification at ``threshold``. Returns (a, b, inter, uni).

    Two-phase shape chosen for corpus scale:

    1. **Candidates** via the Arrow-native band-key path
       (:func:`minhash_band_keys` → :func:`pairs_from_band_rows`): one scan,
       no shingle strings materialized, only ``bands`` 8-byte keys per doc
       cross the shuffle. (Measured 16.7 s vs 36.0 s for the string-shingle
       signature path on the same 400k-doc input.)
    2. **Verify** on the candidate-reduced corpus only: the doc table is
       ``left_semi``-joined down to candidate ids BEFORE the trigram
       explode, so the corpus-scale explode (~54× row blow-up) runs over
       |candidate docs| rows, not |corpus| rows. Verification itself is
       exact oracle-grade string-trigram Jaccard (:func:`shingle_df` +
       :func:`exact_jaccard_pairs`).

    Candidate-set note: the band-key path and ``lsh_candidate_pairs`` are
    both valid (r = num_hashes/bands)-row LSH schemes but NOT identical —
    they use different minhash families (wrap-around multiply-shift over
    hashed shingles vs mod-Mersenne over string shingles) and different
    band-hash widths (56-bit packed vs 32-bit JVM hash, so the signature
    path admits more accidental band collisions → a few extra candidates).
    The exact verify erases false candidates on either path; true pairs at
    ``J ≥ threshold`` are missed with probability ≤ (1−J^r)^bands ≈ 1e-8
    at the defaults — the same guarantee the signature path carries.

    ``observation`` surfaces skew-cap drops (see ``pairs_from_band_rows``);
    ``materialize`` pins the bounded candidate table and forwards to
    :func:`exact_jaccard_pairs` (see its docstring for the localCheckpoint
    speed/lineage trade — with ``False`` the candidate pipeline re-derives
    once per verify branch, lazily and lineage-recoverably; ``None`` takes
    the ``config.PIN_INTERMEDIATES`` deploy-time default)."""
    from guava_probably_spark.config import pin_default

    materialize = pin_default(materialize)
    bk = minhash_band_keys(df, id_col, text_col, num_hashes, bands)
    cand = pairs_from_band_rows(bk, max_bucket, observation)
    if materialize:
        # id-pairs only (16 B/row, bounded by the banding skew cap): pin so
        # the semi-join branch below and exact_jaccard_pairs' three pair
        # branches don't each re-run the scan+banding pipeline.
        cand = cand.localCheckpoint(eager=True)
    ids = (
        cand.select(F.col("a").alias("id"))
        .union(cand.select(F.col("b").alias("id")))
        .distinct()
    )
    docs_c = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col)
    ).join(ids, "id", "left_semi")
    sh = shingle_df(docs_c, "id", text_col)
    verified = exact_jaccard_pairs(sh, cand, materialize=materialize)
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


def fast_simhash(texts) -> np.ndarray:
    """Vectorized murmur3-based 64-bit SimHash (uint64) — the hot-path
    variant for bench/bulk jobs (not oracle-matched; property-tested).

    Fully C-speed: pyarrow regex tokenization (lower → split on \\s+),
    zero-copy utf8 buffer into the murmur3-128 kernel, then 64 segmented
    popcounts (``add.reduceat`` over the contiguous per-doc token runs) —
    no per-token Python and no (n_tokens × 64) materialized matrix.

    Accepts a list[str] or a pyarrow string Array/ChunkedArray.
    """
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        texts, type=pa.string()
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(arr)), r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    list_off = np.frombuffer(toks.buffers()[1], dtype=np.int32)[
        toks.offset : toks.offset + n_docs + 1
    ].astype(np.int64)
    counts = np.diff(list_off)
    if len(flat) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    # (note: arrow dictionary_encode + hashing uniques only was measured —
    # the encode's own hash-table build costs exactly what it saves)
    buf, starts = utf8_buffer(flat)
    h = _hash_token_u64(buf, starts)
    # 64 one-dimensional segmented sums; NOTE np.add.reduceat on a 2-D
    # (n_tokens, 64) bit matrix measured 128 s vs 9 s for this loop — the
    # 2-D reduceat path has terrible locality, don't "optimize" back to it
    # segment sums via cumsum differences, NOT reduceat: clamping a trailing
    # empty doc's out-of-range start (the old workaround for reduceat's
    # index bound) truncated the PRECEDING doc's segment, leaking its last
    # token's bits into the empty doc — the same text then simhashed
    # differently depending on batch co-location. csum[end]-csum[start] is
    # exact for empty segments (0) with no index restrictions.
    starts = list_off[:-1] - list_off[0]
    ends = list_off[1:] - list_off[0]
    pop = np.empty((64, n_docs), dtype=np.uint64)
    one = np.uint64(1)
    bits = np.empty_like(h)
    csum = np.empty(len(h) + 1, dtype=np.uint64)
    csum[0] = 0
    for bit in range(64):
        # stay in uint64 end-to-end (the int64 astype per bit measured 16 s
        # across the loop) and reuse one scratch buffer via out= (fresh
        # temporaries per bit are freshly-mmapped pages — page-zeroing
        # contention across 32 concurrent workers; see _sig_matrix_from_batch)
        np.right_shift(h, np.uint64(bit), out=bits)
        np.bitwise_and(bits, one, out=bits)
        np.cumsum(bits, out=csum[1:])
        np.subtract(csum[ends], csum[starts], out=pop[bit])
    pop_i = pop.astype(np.int64)
    pop_i[:, counts == 0] = 0
    # bit set iff popcount*2 > token_count  (sum of ±1 contributions > 0)
    out_bits = (2 * pop_i > counts[None, :]) & (counts[None, :] > 0)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return (out_bits.astype(np.uint64) * weights[:, None]).sum(axis=0, dtype=np.uint64)


def _hash_token_u64(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hash for short tokens: first-8 + last-8 bytes
    (zero-padded, little-endian) mixed with the length through fmix64.

    murmur3-128 is the contract hash for sketches, but its block loop costs
    ~1.5 µs/token on 5-char tokens (measured 33 s over 21.7M tokens); this
    gather-based mix is ~50× faster with full avalanche via fmix64 — fine
    for simhash, which only needs well-scattered bits, not the Guava vector
    contract.
    """
    from guava_probably_spark.sketches.hashing import _fmix64

    starts = offsets[:-1]
    lens = offsets[1:] - offsets[:-1]
    n = len(starts)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    # two overlapping unaligned 8-byte loads assembled from 8 separate 1-D
    # gathers — 2-D fancy indexing ((n,8) index matrices or strided-view row
    # gathers) measured 17-35 s/21.7M tokens; 1-D gathers are ~1 s
    pad = np.concatenate([data, np.zeros(16, dtype=np.uint8)])
    starts2 = starts + np.maximum(lens - 8, 0)
    w1 = np.zeros(n, dtype=np.uint64)
    w2 = np.zeros(n, dtype=np.uint64)
    idx = np.empty(n, dtype=np.int64)
    gath8 = np.empty(n, dtype=np.uint8)
    gath = np.empty(n, dtype=np.uint64)
    for k in range(8):
        for s, w in ((starts, w1), (starts2, w2)):
            np.add(s, k, out=idx)
            np.take(pad, idx, out=gath8)
            np.copyto(gath, gath8, casting="unsafe")
            np.left_shift(gath, np.uint64(8 * k), out=gath)
            np.bitwise_or(w, gath, out=w)
    nbytes = np.minimum(lens, 8).astype(np.uint64)
    full = nbytes == 8
    # clamp the shift operand to <64 (uint64 << 64 is undefined); the full
    # lanes take the ~0 branch of the where
    shift = np.minimum(nbytes, np.uint64(7)) << np.uint64(3)
    mask = np.where(
        full, np.uint64(0xFFFFFFFFFFFFFFFF), (np.uint64(1) << shift) - np.uint64(1)
    )
    w1 &= mask
    w2 &= mask
    with np.errstate(over="ignore"):
        h = _fmix64(w1 ^ (np.uint64(0x9E3779B97F4A7C15) * lens.astype(np.uint64)))
        h ^= _fmix64(w2 ^ np.uint64(0xC2B2AE3D27D4EB4F))
    return h


_SIMHASH_QUARTERS_SQL = (
    "transform(sequence(0, 3), q -> concat_ws(':', q, substr(simhash, q * 4 + 1, 4)))"
)


def simhash_drop_stats(sim: DataFrame, max_bucket: int = 4096) -> DataFrame:
    """Skew-cap drop audit for ``simhash_near_pairs`` (same quarter banding)."""
    rows = sim.select("id", F.explode(F.expr(_SIMHASH_QUARTERS_SQL)).alias("bk"))
    return banding_drop_stats(rows, max_bucket)


def simhash_near_pairs(
    sim: DataFrame, max_hamming: int = 3, max_bucket: int = 4096, observation=None
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming distance ≤ max_hamming between
    64-bit simhashes, via 4×16-bit band blocking. max_hamming is capped at
    3: the pigeonhole recall-1 argument needs distance < number of bands,
    and accepting a larger value would silently return a SUBSET of the
    requested pairs (a distance-4 pair can differ in all 4 quarters).

    Pigeonhole: distance ≤ 3 ⇒ at least one of the 4 16-bit quarters is
    identical, so banding on quarters has recall 1 — no full cross join.

    Skew guard (same as ``lsh_candidate_pairs``): pairs are emitted only
    within quarter buckets of size ≤ ``max_bucket``. A 16-bit quarter has
    only 2^16 values per band position, so at web scale a hot quarter
    (boilerplate docs, near-constant signatures) otherwise turns the
    bucket join quadratic in one task. The cap WEAKENS the recall-1
    guarantee for pairs whose every identical quarter sits in an
    over-cap bucket — so the drop is never silent: action
    ``simhash_drop_stats(sim, max_bucket)`` for the dropped bucket/member
    counts; a nonzero count means route the storm through exact_dedup
    first (duplicate storms are exactly what over-cap quarter buckets
    are) or raise the cap. (``observation`` attaches a same-action
    Observe as well — see ``banding_drop_stats`` for the AQE caveat.)
    """
    if not (0 <= max_hamming <= 3):
        raise ValueError(
            f"max_hamming={max_hamming} not supported: 4-quarter banding "
            "guarantees recall only for hamming <= 3"
        )
    exploded = sim.select(
        "id", "simhash", F.explode(F.expr(_SIMHASH_QUARTERS_SQL)).alias("qk")
    )
    buckets = exploded.groupBy("qk").agg(
        F.collect_list(F.struct("id", "simhash")).alias("members")
    )
    buckets = _observe_bucket_drops(buckets, max_bucket, observation)
    cand = (
        buckets.filter((F.size("members") > 1) & (F.size("members") <= max_bucket))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(members, x -> "
                    "transform(filter(members, y -> y.id > x.id), y -> "
                    "struct(x.id AS a, x.simhash AS ha, y.id AS b, y.simhash AS hb))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.ha", "p.b", "p.hb")
    )
    # hamming over hex strings: popcount of nibble XOR per position
    nib = "(instr('0123456789abcdef', substr({h}, i, 1)) - 1)"
    ham = F.expr(
        "aggregate(sequence(1, 16), 0, (acc, i) -> acc + "
        f"bit_count({nib.format(h='ha')} ^ {nib.format(h='hb')}))"
    )
    return (
        cand.select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
