"""Text analysis operators: language-ID, quality scoring, token counting,
rolling-hash fingerprinting.

All four are pure Catalyst projections/aggregations built from the
dual-dialect expressions in ``textexpr`` — whole-stage-codegen JVM
execution, no Python in the hot path, column-pruned scans. Each has an
exact DuckDB oracle by construction.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from guava_probably_spark.pipeline import textexpr


def quality_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws_tokens, re_tokens, n_chars_norm, stop_hits, is_quality)."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.expr(textexpr.word_count_expr(text_col, "spark")).cast("long").alias("ws_tokens"),
        F.expr(textexpr.re_token_count_expr(text_col, "spark")).cast("long").alias("re_tokens"),
        F.expr(textexpr.char_count_expr(text_col, "spark")).cast("long").alias("n_chars_norm"),
        F.expr(textexpr.stopword_hits_expr(text_col, "spark")).cast("long").alias("stop_hits"),
        F.expr(textexpr.quality_flag_expr(text_col, "spark")).alias("is_quality"),
    )


def langid_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pred_lang) stopword-density heuristic language ID."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.expr(textexpr.langid_expr(text_col, "spark")).alias("pred_lang"),
    )


def token_counts_df(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-group (group, n_docs, total_ws_tokens, total_re_tokens).

    One hash aggregation with map-side partials; token counting itself is a
    projection, so this is scan-bound at scale.
    """
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.expr(textexpr.word_count_expr(text_col, "spark")).cast("long").alias("w"),
            F.expr(textexpr.re_token_count_expr(text_col, "spark")).cast("long").alias("r"),
        )
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("w").alias("total_ws_tokens"),
            F.sum("r").alias("total_re_tokens"),
        )
    )


def rolling_fingerprint_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, roll_fp) Karp–Rabin polynomial rolling hash of normalized text.

    Order-sensitive content fingerprint (vs the order-free md5 key used by
    ``dedup.exact_dedup``).
    """
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.expr(textexpr.rolling_hash_expr(text_col, "spark")).alias("roll_fp"),
    )


def winnowing_fingerprints(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    min rolling hash per sliding window over k-gram hashes.

    Local/numpy reference implementation used by tests and per-batch UDFs;
    the distributed path fingerprints per Arrow batch.
    """
    t = " ".join(text.lower().split())
    if len(t) < k:
        return []
    grams = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
    if len(grams) < k:
        return []
    base, mod = np.int64(textexpr.ROLL_BASE), np.int64(textexpr.ROLL_MOD)
    n = len(grams) - k + 1
    h = np.zeros(n, dtype=np.int64)
    acc = np.zeros(len(grams) + 1, dtype=np.int64)
    # prefix polynomial hashes with powers, h(i..i+k) derived per position
    powk = np.int64(pow(int(base), k, int(mod)))
    for i, c in enumerate(grams):
        acc[i + 1] = (acc[i] * base + np.int64(c)) % mod
    for i in range(n):
        h[i] = (acc[i + k] - acc[i] * powk) % mod
    if n <= window:
        return [int(h.min())]
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    mins = sw.min(axis=1)
    return sorted(set(int(x) for x in mins))


def word_repetition_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals as exact integer counts per doc:
    (id, n_words, n_distinct_words, top_word_count).

    Filters like "drop docs whose most frequent word exceeds 20% of tokens"
    or "distinct/total ratio below 0.3" are threshold checks on these
    columns (integer cross-multiplication — no float drift vs the oracle).

    Explode + two-level hash aggregation, all JVM: scalar array-lambda
    formulations re-evaluate the split per element (Catalyst does not CSE
    into lambda bodies — measured ~50x on the trigram path), and partial
    aggregation keeps a hot word from concentrating a partition.
    """
    w = F.explode(F.expr(textexpr.words_expr(text_col, "spark"))).alias("word")
    per_word = (
        df.select(F.col(id_col).cast("long").alias("id"), w)
        .groupBy("id", "word")
        .agg(F.count("*").alias("c"))
    )
    return per_word.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct_words"),
        F.max("c").cast("long").alias("top_word_count"),
    )


def gopher_quality_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher quality-rule signals (Rae et al. 2021, appendix A1.1) as
    exact integer counts per doc, plus the composite ``gopher_pass`` gate —
    the standard pre-training corpus filter, complementing
    :func:`word_repetition_df` (word-level repetition) with the line-level
    and symbol rules.

    Columns (all integers; ratios become integer cross-multiplications so
    the oracle hash can never diverge on rounding):
      n_words, word_chars (total normalized word characters — mean word
      length = word_chars/n_words), alpha_words (words containing an
      alphabetic char), n_lines, dup_lines (EXCESS copies: Σ(c−1) over
      repeated line values), bullet_lines, ellipsis_lines, symbol_hits
      ('#' + '...' + '…' occurrences over the raw text).

    gopher_pass = 50 ≤ n_words ≤ 100000 AND mean word length in [3, 10]
    AND symbol/word ≤ 0.1 AND bullet lines < 90% AND ellipsis lines < 30%
    AND alpha words ≥ 80% AND duplicate-line excess ≤ 30%.

    Plan shape: two explode + hash-aggregate branches (words, lines — both
    JVM with map-side partial aggregation, so a hot doc id never
    concentrates a partition's raw rows) and one scalar projection, joined
    on id. At 100 TB this is usually fused with the other per-doc passes;
    each branch shuffles only (id, counters).
    """
    ids = F.col(id_col).cast("long").alias("id")
    w = df.select(
        ids, F.explode(F.expr(textexpr.words_expr(text_col, "spark"))).alias("word")
    )
    words_agg = w.groupBy("id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.length("word")).cast("long").alias("word_chars"),
        F.sum(F.expr(textexpr.alpha_word_flag_expr("word", "spark")))
        .cast("long")
        .alias("alpha_words"),
    )
    ln = df.select(
        ids, F.explode(F.expr(textexpr.lines_expr(text_col, "spark"))).alias("line")
    )
    per_line = ln.groupBy("id", "line").agg(F.count("*").alias("c"))
    lines_agg = per_line.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_lines"),
        F.sum(F.col("c") - 1).cast("long").alias("dup_lines"),
        F.sum(
            F.expr(textexpr.bullet_line_flag_expr("line", "spark")) * F.col("c")
        ).cast("long").alias("bullet_lines"),
        F.sum(
            F.expr(textexpr.ellipsis_line_flag_expr("line", "spark")) * F.col("c")
        ).cast("long").alias("ellipsis_lines"),
    )
    scalars = df.select(
        ids,
        F.expr(textexpr.symbol_hits_expr(text_col, "spark"))
        .cast("long")
        .alias("symbol_hits"),
    )
    joined = words_agg.join(lines_agg, "id").join(scalars, "id")
    gate = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (3 * F.col("n_words") <= F.col("word_chars"))
        & (F.col("word_chars") <= 10 * F.col("n_words"))
        & (10 * F.col("symbol_hits") <= F.col("n_words"))
        & (10 * F.col("bullet_lines") <= 9 * F.col("n_lines"))
        & (10 * F.col("ellipsis_lines") <= 3 * F.col("n_lines"))
        & (10 * F.col("alpha_words") >= 8 * F.col("n_words"))
        & (10 * F.col("dup_lines") <= 3 * F.col("n_lines"))
    )
    return joined.withColumn("gopher_pass", gate)


def gopher_sql_duck(table: str, id_col: str, text_col: str) -> str:
    """DuckDB oracle for :func:`gopher_quality_df` — same column names,
    same integer semantics, built from the same ``textexpr`` dual-dialect
    flag expressions so the two engines cannot drift independently.

    Both engines split '' into [''], so every doc survives the inner
    joins with n_words >= 1 / n_lines >= 1 (parity-tested on empty text).
    """
    words = textexpr.words_expr(text_col, "duck")
    lines = textexpr.lines_expr(text_col, "duck")
    return (
        f"WITH w AS (SELECT CAST({id_col} AS BIGINT) AS id, "
        f"unnest({words}) AS word FROM {table}), "
        "wa AS (SELECT id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(length(word)) AS BIGINT) AS word_chars, "
        f"CAST(sum({textexpr.alpha_word_flag_expr('word', 'duck')}) AS BIGINT) "
        "AS alpha_words FROM w GROUP BY id), "
        f"l AS (SELECT CAST({id_col} AS BIGINT) AS id, "
        f"unnest({lines}) AS line FROM {table}), "
        "pl AS (SELECT id, line, count(*) AS c FROM l GROUP BY id, line), "
        "la AS (SELECT id, CAST(sum(c) AS BIGINT) AS n_lines, "
        "CAST(sum(c - 1) AS BIGINT) AS dup_lines, "
        f"CAST(sum(({textexpr.bullet_line_flag_expr('line', 'duck')}) * c) AS BIGINT) "
        "AS bullet_lines, "
        f"CAST(sum(({textexpr.ellipsis_line_flag_expr('line', 'duck')}) * c) AS BIGINT) "
        "AS ellipsis_lines FROM pl GROUP BY id), "
        f"s AS (SELECT CAST({id_col} AS BIGINT) AS id, "
        f"CAST({textexpr.symbol_hits_expr(text_col, 'duck')} AS BIGINT) "
        f"AS symbol_hits FROM {table}) "
        "SELECT wa.id AS id, n_words, word_chars, alpha_words, n_lines, "
        "dup_lines, bullet_lines, ellipsis_lines, symbol_hits, "
        "(n_words BETWEEN 50 AND 100000 "
        "AND 3 * n_words <= word_chars AND word_chars <= 10 * n_words "
        "AND 10 * symbol_hits <= n_words "
        "AND 10 * bullet_lines <= 9 * n_lines "
        "AND 10 * ellipsis_lines <= 3 * n_lines "
        "AND 10 * alpha_words >= 8 * n_words "
        "AND 10 * dup_lines <= 3 * n_lines) AS gopher_pass "
        "FROM wa JOIN la USING (id) JOIN s USING (id)"
    )


# Gopher A1.1 repetition thresholds (Rae et al. 2021), as integer percents
# of normalized characters: fraction of chars in the most frequent n-gram
# (n=2,3,4) and fraction of chars in duplicated n-grams (n=5..10).
GOPHER_TOP_PCT = {2: 20, 3: 18, 4: 16}
GOPHER_DUP_PCT = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


def ngram_repetition_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
    chunk_words: int | None = None,
) -> DataFrame:
    """Gopher n-gram repetition signals (Rae et al. 2021, A1.1) as exact
    integer character masses per doc, complementing
    :func:`word_repetition_df` (unigram rules) and
    :func:`gopher_quality_df` (line/symbol rules):

      top{n}_chars  (n in top_ns)  — chars in the most frequent word
        n-gram × its count; ties on count broken by the LONGEST gram
        (deterministic, oracle-matched).
      dup{n}_chars  (n in dup_ns)  — Σ count×chars over n-grams occurring
        ≥ 2 times (every occurrence counted; the overlap-counting upper
        bound of Gopher's "chars in duplicated n-grams").
      n_chars — normalized char count (the ratio denominator).
      repetition_pass — AND over the published thresholds
        (top: 20/18/16 %, dup: 15/14/13/12/11/10 %), integer
        cross-multiplied so the gate can never drift on rounding.

    Plan shape (ONE corpus scan, ZERO shuffle): every signal is a
    function of a single document, so no exchange is needed at any scale
    — tokenize JVM-side (codegen ``split``), then one ``mapInArrow``
    kernel does exact per-doc gram counting in vectorized numpy:
    dictionary-encode the batch's words (C-speed), compose n-gram
    identities incrementally as injective integer pairs
    ``gram_{n} = compact(gram_{n-1}) * vocab + next_word_code`` (compacted
    through ``np.unique`` each step, so identity is EXACT — no hash, no
    collisions), then segment reductions per (doc, gram). Gram char
    length is a prefix-sum difference, never a string build. The previous
    exchange plan (NGram arrays → stack → explode → groupBy(id, n, gram))
    shuffled ~Σ_n |grams| ≈ 9×corpus rows and measured 63 s at 400k docs
    / 300M gram windows on local[32]; this kernel is embarrassingly
    parallel — the only cross-boundary traffic is the token lists into
    Arrow. Docs shorter than every n still emit a row (zero-filled).
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    if not all_ns or all_ns[0] < 1:
        raise ValueError("n-gram sizes must be >= 1")
    txt = f"coalesce({text_col}, '')"
    proj = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.expr(textexpr.char_count_expr(txt, "spark")).cast("long").alias("n_chars"),
        F.expr(textexpr.words_expr(txt, "spark")).alias("_toks"),
    )
    counter_cols = [f"top{n}_chars" for n in top_ns] + [
        f"dup{n}_chars" for n in dup_ns
    ]
    schema = "id long, n_chars long, " + ", ".join(f"{c} long" for c in counter_cols)
    top_t, dup_t = tuple(top_ns), tuple(dup_ns)
    cw = int(chunk_words) if chunk_words else _NGRAM_CHUNK_WORDS

    def kernel(batches):
        for batch in batches:
            if batch.num_rows:
                yield _ngram_rep_batch(batch, top_t, dup_t, cw)

    out = proj.mapInArrow(kernel, schema)
    gate = F.lit(True)
    for n in top_ns:
        gate = gate & (
            100 * F.col(f"top{n}_chars") <= GOPHER_TOP_PCT[n] * F.col("n_chars")
        )
    for n in dup_ns:
        gate = gate & (
            100 * F.col(f"dup{n}_chars") <= GOPHER_DUP_PCT[n] * F.col("n_chars")
        )
    return out.withColumn("repetition_pass", gate)


# chunk bound for the in-kernel word stream: keeps the injective product
# gram_code * vocab + word_code far below 2^63 (W ≤ 2^22 ⇒ product ≤ 2^44;
# a single doc larger than the bound is taken whole, so the true limit is
# max(2^22, words-in-largest-doc) — int64-safe up to ~3·10^9-word docs)
# and bounds the kernel's working set independent of Arrow batch size
_NGRAM_CHUNK_WORDS = 4_194_304


def _ngram_rep_batch(batch, top_ns: tuple, dup_ns: tuple, chunk_words: int):
    """Exact per-doc n-gram repetition counters for one Arrow batch.

    Pure numpy segment algebra — see :func:`ngram_repetition_df` for the
    identity-composition argument. Exactness: word codes come from Arrow
    ``dictionary_encode`` (string-exact); each size-n gram id is the pair
    (compacted size-(n-1) id, next word code) encoded injectively in
    int64; per-(doc, gram) counts via ``np.unique`` on the exact keys.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    all_ns = sorted(set(top_ns) | set(dup_ns))
    ndocs = batch.num_rows
    toks = batch.column("_toks")
    counts = pc.list_value_length(toks).fill_null(0).to_numpy(zero_copy_only=False)
    counts = counts.astype(np.int64)
    values = pc.list_flatten(toks)
    if values.null_count:
        values = pc.coalesce(values, "")
    out = {c: np.zeros(ndocs, np.int64) for c in (
        [f"top{n}_chars" for n in top_ns] + [f"dup{n}_chars" for n in dup_ns]
    )}

    # process in word-bounded doc chunks (exactness + memory bound):
    # largest doc prefix with cum[end] - cum[start] <= chunk_words, except
    # a single over-budget doc is taken whole (docs never split)
    cum = np.concatenate(([0], np.cumsum(counts)))
    start_doc = 0
    while start_doc < ndocs:
        end_doc = int(
            np.searchsorted(cum, cum[start_doc] + chunk_words, side="right") - 1
        )
        end_doc = max(start_doc + 1, min(end_doc, ndocs))
        _ngram_rep_chunk(
            values.slice(cum[start_doc], cum[end_doc] - cum[start_doc]),
            counts[start_doc:end_doc],
            start_doc,
            all_ns,
            top_ns,
            dup_ns,
            out,
        )
        start_doc = end_doc

    cols = [batch.column("id"), batch.column("n_chars")] + [
        pa.array(out[c], type=pa.int64())
        for c in [f"top{n}_chars" for n in top_ns] + [f"dup{n}_chars" for n in dup_ns]
    ]
    names = ["id", "n_chars"] + [f"top{n}_chars" for n in top_ns] + [
        f"dup{n}_chars" for n in dup_ns
    ]
    return pa.RecordBatch.from_arrays(cols, names=names)


def _ngram_rep_chunk(values, counts, doc_base, all_ns, top_ns, dup_ns, out):
    import pyarrow.compute as pc

    nd = counts.shape[0]
    denc = pc.dictionary_encode(values)
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_vocab = max(1, len(denc.dictionary))
    wlens = pc.utf8_length(values).to_numpy(zero_copy_only=False).astype(np.int64)
    W = codes.shape[0]
    doc_of = np.repeat(np.arange(nd, dtype=np.int64), counts)
    cs = np.concatenate(([0], np.cumsum(wlens)))

    def stats(n, gcodes, n_ids):
        m = gcodes.shape[0]
        if m == 0:
            return
        valid = doc_of[:m] == doc_of[n - 1 : n - 1 + m]
        d = doc_of[:m][valid]
        if d.shape[0] == 0:
            return
        g = gcodes[valid]
        glen = (cs[n : n + m] - cs[:m] + (n - 1))[valid]
        key = d * n_ids + g
        uk, first, cnt = np.unique(key, return_index=True, return_counts=True)
        ud = uk // n_ids
        ulen = glen[first]
        if n in dup_ns:
            dup = cnt >= 2
            if dup.any():
                # integer masses < 2^53: float64 bincount sums are exact
                mass = np.bincount(
                    ud[dup], weights=(cnt[dup] * ulen[dup]).astype(np.float64),
                    minlength=nd,
                ).astype(np.int64)
                out[f"dup{n}_chars"][doc_base : doc_base + nd] += mass
        if n in top_ns:
            order = np.lexsort((ulen, cnt, ud))
            sd = ud[order]
            last = np.nonzero(np.append(sd[1:] != sd[:-1], True))[0]
            best = order[last]
            out[f"top{n}_chars"][doc_base + sd[last]] = cnt[best] * ulen[best]

    g = codes
    n_ids = n_vocab
    if 1 in all_ns:
        stats(1, g, n_ids)
    for n in range(2, max(all_ns) + 1):
        m = W - n + 1
        if m <= 0:
            break
        raw = g[:m] * n_vocab + codes[n - 1 :]
        uniq, g = np.unique(raw, return_inverse=True)
        n_ids = max(1, uniq.shape[0])
        if n in all_ns:
            stats(n, g, n_ids)


def ngram_repetition_sql_duck(
    table: str,
    id_col: str,
    text_col: str,
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> str:
    """DuckDB oracle for :func:`ngram_repetition_df` — same normalization
    (shared ``textexpr`` builders on ``coalesce(text, '')``), same
    space-joined grams via 1-based inclusive list slices, same tie-break
    (count, then longest gram), same integer-percent gate."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    txt = f"coalesce({text_col}, '')"
    words = textexpr.words_expr(txt, "duck")
    chars = textexpr.char_count_expr(txt, "duck")
    ns_list = ", ".join(str(n) for n in all_ns)
    tops = ", ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN top_chars END), 0) AS top{n}_chars"
        for n in top_ns
    )
    dups = ", ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN dup_chars END), 0) AS dup{n}_chars"
        for n in dup_ns
    )
    # coalesce inline: a bare column name in the gate would resolve to
    # wide's raw (NULL for short docs) column, not the aliased projection
    gate = " AND ".join(
        [
            f"100 * coalesce(top{n}_chars, 0) <= {GOPHER_TOP_PCT[n]} * n_chars"
            for n in top_ns
        ]
        + [
            f"100 * coalesce(dup{n}_chars, 0) <= {GOPHER_DUP_PCT[n]} * n_chars"
            for n in dup_ns
        ]
    )
    return (
        f"WITH w AS (SELECT CAST({id_col} AS BIGINT) AS id, {words} AS words, "
        f"CAST({chars} AS BIGINT) AS n_chars FROM {table}), "
        f"g AS (SELECT id, n, unnest(list_transform("
        f"generate_series(1, len(words) - (n - 1)), "
        f"i -> array_to_string(words[i:i+n-1], ' '))) AS gram "
        f"FROM w, (SELECT unnest([{ns_list}]) AS n) ns), "
        "pg AS (SELECT id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3), "
        "mc AS (SELECT id, n, max(c) AS mc FROM pg GROUP BY 1, 2), "
        "top AS (SELECT pg.id, pg.n, CAST(mc * max(length(gram)) AS BIGINT) "
        "AS top_chars FROM pg JOIN mc USING (id, n) WHERE c = mc "
        "GROUP BY pg.id, pg.n, mc), "
        "dup AS (SELECT id, n, CAST(sum(CASE WHEN c >= 2 THEN c * length(gram) "
        "ELSE 0 END) AS BIGINT) AS dup_chars FROM pg GROUP BY 1, 2), "
        f"wide AS (SELECT id, {tops}, {dups} "
        "FROM top JOIN dup USING (id, n) GROUP BY id) "
        "SELECT w.id AS id, w.n_chars, "
        + ", ".join(
            f"coalesce(top{n}_chars, 0) AS top{n}_chars" for n in top_ns
        )
        + ", "
        + ", ".join(
            f"coalesce(dup{n}_chars, 0) AS dup{n}_chars" for n in dup_ns
        )
        + f", ({gate}) AS repetition_pass "
        "FROM w LEFT JOIN wide USING (id)"
    )


def redact_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) with emails, card-length digit runs and IPv4s masked.

    A chained codegen ``regexp_replace`` projection — patterns restricted
    to the Java-regex ∩ RE2 syntax intersection so the DuckDB oracle
    recomputes the identical output (textexpr.REDACT_PATTERNS is the one
    source of truth).
    """
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.expr(textexpr.redact_expr(text_col, "spark")).alias("text"),
    )


def vocab_topk(df: DataFrame, text_col: str, k: int = 100, mg_k: int = 4096):
    """Corpus top-k vocabulary WITHOUT shuffling the token stream:
    returns ((word, cnt) DataFrame, guaranteed: bool).

    Pass 1: one scan folds per-partition Misra–Gries summaries over the
    exploded words and tree-merges KB-sized blobs — no token ever crosses
    an exchange.  Pass 2: exact counts for the ≤ mg_k retained candidates
    only (broadcast join + hash agg over the filtered stream), ordered by
    (count desc, word).

    ``guaranteed`` certifies containment: MG retains every item with true
    frequency > n/(mg_k+1) ≥ its decrement total, so if the k-th exact
    candidate count exceeds the sketch's error bound, the true top-k is
    provably inside the candidate set (size mg_k to the corpus tail for
    this at 10^11 tokens; any word soup's head satisfies it easily).
    """
    from guava_probably_spark import SketchSpec
    from guava_probably_spark.operators import collect_sketch

    spark = df.sparkSession
    words = df.select(
        F.explode(F.expr(textexpr.words_expr(text_col, "spark"))).alias("word")
    )
    sk, _, _ = collect_sketch(words, "word", SketchSpec("mg", {"k": mg_k}))
    cand = spark.createDataFrame([(w,) for w in sk.counters], "word string")
    exact = (
        words.join(F.broadcast(cand), "word")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(k)
    )
    rows = exact.collect()
    # the certificate is only valid when the candidate set yielded a FULL
    # top-k: with fewer than k candidates the true top-k provably extends
    # past them (len==min(k,len) was vacuously true and over-certified)
    kth = rows[-1].cnt if len(rows) == k else 0
    guaranteed = len(rows) == k and kth > sk.error_bound()
    return spark.createDataFrame(rows, "word string, cnt long"), guaranteed


def lm_quality_score(
    train: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    epsilon: float = 1e-5,
    delta: float = 1e-3,
    hashed: bool = True,
    pre_aggregate: bool = True,
) -> DataFrame:
    """Sketch-LM quality score: rank documents by how typical their word
    ``n``-grams are of a reference corpus — the classic gibberish /
    boilerplate / wrong-domain filter of training-data pipelines, with the
    usual KenLM stand-in replaced by a Count-Min sketch so the "model"
    trains in ONE distributed pass and broadcasts as a few MB.

    - train (``pre_aggregate=True``, default): explode word n-grams
      JVM-side, hash-aggregate ``(gram, count)`` with map-side combine
      (pure codegen — natural-language grams are Zipfian, so partials
      collapse ~200× before the exchange), then feed the weighted pairs
      into ONE CMS blob via the weighted tree-merged partials. Only
      distinct grams cross the JVM→Python boundary; the blob is
      byte-identical to the per-instance build (integer bucket sums are
      order- and batching-independent) and measured 2.5× faster at 80M
      grams / 400k docs. ``pre_aggregate=False`` streams every gram
      instance into the partials (one shuffle fewer — the right shape only
      if the corpus's grams are near-unique, where the combine can't
      shrink anything).
    - score: per doc, mean over its grams of log((ĉ+1)/(N+1)) where ĉ is
      the CMS point estimate — an add-one unigram-over-n-grams language
      model.  The probe is one Arrow-vectorized pass; the per-doc mean is
      a map-side-combined hash aggregation.  No Python touches text — the
      UDF sees only the gram column.

    CMS error is one-sided (ĉ ≤ c + ε·N w.p. 1−δ), so scores are biased
    UP by at most log1p(ε·N/(c+1)) per gram — rare-gram (low) scores are
    the reliable signal, which is the direction the filter uses.

    Returns (id, ngrams, avg_logprob); docs with fewer than n words have
    ngrams=0 and NULL avg_logprob (no evidence either way — decide
    explicitly, don't auto-flag).  Deterministic: same corpus → byte-equal
    CMS → identical scores under any partitioning.
    """
    from guava_probably_spark import SketchSpec
    from guava_probably_spark.functions import cms_freq_udf
    from guava_probably_spark.operators import collect_sketch
    from guava_probably_spark.pipeline.contamination import _ngrams_df

    from guava_probably_spark.sketches.base import FUNNEL_LONG

    spark = df.sparkSession

    # hashed=True (default): grams counted by their JVM xxhash64 — 8 B/gram
    # across Arrow instead of ~100 B strings; a collision merges two grams'
    # counts (≤ |grams|²/2⁶⁵ mass), which only nudges scores UP — the same
    # direction as the CMS's own one-sided error
    def _keyed(ng_df):
        if hashed:
            return ng_df.withColumn(
                "g", F.when(F.col("g").isNull(), None).otherwise(F.xxhash64("g"))
            )
        return ng_df

    extra = {"funnel": FUNNEL_LONG} if hashed else {}
    train_g = _keyed(_ngrams_df(train, text_col, n).withColumnRenamed("ng", "g"))
    spec = SketchSpec("cms", {"epsilon": epsilon, "delta": delta, **extra})
    if pre_aggregate:
        from guava_probably_spark.operators.build import collect_weighted_sketch

        counts = train_g.groupBy("g").agg(F.count("*").alias("w"))
        cms, _, _ = collect_weighted_sketch(counts, "g", "w", spec)
        total = cms.total  # N = sum of weights, not distinct-gram rows
    else:
        cms, total, _ = collect_sketch(train_g, "g", spec)
    freq = cms_freq_udf(spark, cms.to_bytes())
    ev = _keyed(
        _ngrams_df(
            df.select(F.col(id_col).alias("id"), text_col),
            text_col,
            n,
            keep=("id",),
            outer=True,
        ).withColumnRenamed("ng", "g")
    )
    # keep nulls out of the probed batch (pandas would float64 a nullable
    # int64 gram column and corrupt full-range hashes — the UDF raises)
    probe_in = F.coalesce(F.col("g"), F.lit(0)) if hashed else F.col("g")
    lp = F.log((freq(probe_in) + F.lit(1.0)) / F.lit(float(total) + 1.0))
    return (
        ev.withColumn("lp", F.when(F.col("g").isNull(), None).otherwise(lp))
        .groupBy("id")
        .agg(
            F.count("g").alias("ngrams"),
            F.avg("lp").alias("avg_logprob"),
        )
    )


def remove_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 3,
    delim: str = "\n",
    min_chars: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4/RefinedWeb-style corpus-level line dedup: (id, text, n_kept,
    n_dropped) with every line whose normalized form (lower + trim)
    appears in ≥ ``min_docs`` DISTINCT documents removed from all of them
    — navigation chrome, cookie banners, license headers. Substring-
    granularity winnowing (``pipeline/winnow.py``) finds *pairs* sharing a
    span; this op globally REMOVES corpus-frequent lines, the complement a
    curation pipeline wants for boilerplate.

    Exact, whole-stage-codegen throughout; no Python. Plan shape: one
    posexplode'd line table feeds (a) the boilerplate key set — distinct
    (line-hash, doc) pairs, then a count-distinct-docs filter — and (b) a
    left_anti join against those keys (AQE broadcasts the key set when it
    is small; at terabyte key scale it degrades to a shuffle join on the
    8-byte hash, never on line text), then one collect_list + sort_array
    re-assembly per doc (native GetArrayStructFields — no interpreted HOF
    lambda in the hot path). Lines shorter than ``min_chars`` after trim
    are exempt (list bullets and '}' lines are frequent but structural,
    the C4 heuristic); docs whose every line was removed drop entirely.

    ``delim`` is a literal (regex-quoted for the split, verbatim for the
    re-join). Per-line bytes pass through untouched — only membership in
    the output changes, preserving the BASELINE.json:15 byte invariant.
    NULL-text docs pass through unchanged (split(NULL) explodes to zero
    rows, which would silently drop the doc from the groupBy otherwise —
    a *line*-removal op must not delete whole rows it never touched).
    """
    null_docs = df.filter(F.col(text_col).isNull()).select(
        F.col(id_col),
        F.col(text_col),
        F.lit(0).cast("long").alias("n_kept"),
        F.lit(0).cast("long").alias("n_dropped"),
    )
    df = df.filter(F.col(text_col).isNotNull())
    split_expr = F.split(F.col(text_col), "\\Q" + delim + "\\E")
    lines = df.select(
        F.col(id_col).alias("id"),
        F.size(split_expr).cast("long").alias("n_total"),
        F.posexplode(split_expr).alias("pos", "line"),
    )
    norm = F.lower(F.trim(F.col("line")))
    keyed = lines.withColumn(
        "k", F.when(F.length(norm) >= min_chars, F.xxhash64(norm))
    )
    boiler = (
        keyed.filter(F.col("k").isNotNull())
        .select("k", "id")
        .distinct()
        .groupBy("k")
        .agg(F.count("*").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("k")
    )
    kept = keyed.join(boiler, "k", "left_anti")
    pair = F.struct(F.col("pos").alias("o"), F.col("line").alias("t"))
    ordered = F.sort_array(F.collect_list(pair))
    return (
        kept.groupBy("id")
        .agg(
            F.array_join(ordered.getField("t"), delim).alias(text_col),
            F.count("*").cast("long").alias("n_kept"),
            (F.first("n_total") - F.count("*")).cast("long").alias("n_dropped"),
        )
        .withColumnRenamed("id", id_col)
        .unionByName(null_docs)
    )


def c4_quality_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, §2.2) as one zero-shuffle
    projection — the third canonical recipe beside Gopher
    (:func:`gopher_quality_df`) and CCNet (``classifier.ccnet_buckets``):

      n_lines, kept_lines — raw line count and lines surviving the C4
        line filter (ends in a terminal punctuation mark, ≥5 words, no
        'javascript' mention).
      clean_text — the kept lines re-joined with newlines (the paper's
        per-page output; '' when nothing survives).
      n_sentences — terminal-mark count over clean_text (the paper drops
        pages with <3 sentences AFTER line filtering).
      bad_word_hits — normalized tokens in the frozen
        ``textexpr.C4_BAD_WORDS`` placeholder list.
      has_lorem / has_brace — page-level 'lorem ipsum' and '{' flags.
      c4_pass — n_sentences ≥ 3 AND no bad word AND NOT lorem AND NOT
        brace. All counters integers; clean_text is exact, so the whole
        row is oracle-hashable (:func:`c4_sql_duck`).

    Plan shape: pure scalar projection, no exchange at any scale — the
    only HOF iterates LINES (~10/doc), not grams. The paper's remaining
    step (three-sentence-span dedup) is corpus-level, covered by
    ``pipeline/spandedup.py`` / ``remove_boilerplate_lines``.
    """
    txt = f"coalesce({text_col}, '')"
    kept = textexpr.c4_kept_lines_expr(txt, "spark")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.expr(f"size({textexpr.lines_expr(txt, 'spark')})")
        .cast("long")
        .alias("n_lines"),
        F.expr(f"array_join({kept}, '\\n')").alias("clean_text"),
        F.expr(f"size({kept})").cast("long").alias("kept_lines"),
        F.expr(textexpr.c4_badword_hits_expr(txt, "spark"))
        .cast("long")
        .alias("bad_word_hits"),
        F.expr(f"lower({txt}) LIKE '%lorem ipsum%'").alias("has_lorem"),
        F.expr(f"instr({txt}, '{{') > 0").alias("has_brace"),
    ).withColumn(
        "n_sentences",
        F.expr(textexpr.c4_sentence_count_expr("clean_text", "spark")).cast("long"),
    )
    gate = (
        (F.col("n_sentences") >= textexpr.C4_MIN_SENTENCES)
        & (F.col("bad_word_hits") == 0)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
    )
    return base.withColumn("c4_pass", gate).select(
        "id", "n_lines", "kept_lines", "n_sentences", "bad_word_hits",
        "has_lorem", "has_brace", "c4_pass", "clean_text",
    )


def c4_sql_duck(table: str, id_col: str, text_col: str) -> str:
    """DuckDB oracle for :func:`c4_quality_df` — same line filter, same
    sentence proxy over the SAME clean_text, same frozen bad-word list."""
    txt = f"coalesce({text_col}, '')"
    kept = textexpr.c4_kept_lines_expr(txt, "duck")
    lines = textexpr.lines_expr(txt, "duck")
    bad = textexpr.c4_badword_hits_expr(txt, "duck")
    nsent = textexpr.c4_sentence_count_expr("clean_text", "duck")
    return (
        f"WITH base AS (SELECT CAST({id_col} AS BIGINT) AS id, "
        f"CAST(len({lines}) AS BIGINT) AS n_lines, "
        # duckdb array_to_string([]) is NULL where Spark array_join is ''
        f"coalesce(array_to_string({kept}, chr(10)), '') AS clean_text, "
        f"CAST(len({kept}) AS BIGINT) AS kept_lines, "
        f"CAST({bad} AS BIGINT) AS bad_word_hits, "
        f"lower({txt}) LIKE '%lorem ipsum%' AS has_lorem, "
        f"strpos({txt}, '{{') > 0 AS has_brace "
        f"FROM {table}) "
        f"SELECT id, n_lines, kept_lines, CAST({nsent} AS BIGINT) AS n_sentences, "
        "bad_word_hits, has_lorem, has_brace, "
        f"(CAST({nsent} AS BIGINT) >= {textexpr.C4_MIN_SENTENCES} "
        "AND bad_word_hits = 0 AND NOT has_lorem AND NOT has_brace) AS c4_pass, "
        "clean_text FROM base"
    )
