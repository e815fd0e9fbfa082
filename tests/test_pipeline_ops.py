"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — correctness vs brute force and DuckDB-dialect parity."""

import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from guava_probably_spark.pipeline import (
    cosine_neardup_pairs,
    cosine_topk,
    exact_dedup,
    exact_jaccard_pairs,
    extract_binary_features,
    langid_df,
    lsh_candidate_pairs,
    minhash_signatures,
    quality_df,
    rolling_fingerprint_df,
    shingle_df,
    simhash_df,
    simhash_near_pairs,
    textexpr,
    token_counts_df,
    with_payload,
)
from guava_probably_spark.pipeline.dedup import (
    fast_simhash,
    neardup_pairs_minhash,
    simhash_sql_duck,
)
from guava_probably_spark.pipeline.multimodal import decode_image
from guava_probably_spark.pipeline.textops import (
    gopher_quality_df,
    gopher_sql_duck,
    ngram_repetition_df,
    ngram_repetition_sql_duck,
    winnowing_fingerprints,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _docs_duck(sf_dir):
    return f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"


# ---------------------------------------------------------------------------
# dual-dialect parity: the Spark expression and the DuckDB expression must
# produce identical values on the real documents table
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "builder",
    [
        textexpr.norm_expr,
        textexpr.word_count_expr,
        textexpr.re_token_count_expr,
        textexpr.stopword_hits_expr,
        textexpr.md5_fingerprint_expr,
        textexpr.rolling_hash_expr,
        textexpr.langid_expr,
        textexpr.char_count_expr,
        textexpr.quality_flag_expr,
        textexpr.redact_expr,
        textexpr.symbol_hits_expr,
        textexpr.lines_expr,
    ],
    ids=lambda b: b.__name__,
)
def test_dialect_parity(spark, sf_dir, builder):
    sdf = _docs(spark, sf_dir).select(
        "doc_id", F.expr(builder("text", "spark")).alias("v")
    )
    got = {r.doc_id: r.v for r in sdf.collect()}
    duck = duckdb.sql(
        f"SELECT doc_id, {builder('text', 'duck')} AS v FROM {_docs_duck(sf_dir)}"
    ).fetchall()
    want = {d: v for d, v in duck}
    assert got == want


def test_trigrams_parity(spark, sf_dir):
    sdf = _docs(spark, sf_dir).select(
        "doc_id", F.expr(textexpr.trigrams_expr("text", "spark")).alias("v")
    )
    got = {r.doc_id: list(r.v) for r in sdf.collect()}
    duck = duckdb.sql(
        f"SELECT doc_id, {textexpr.trigrams_expr('text', 'duck')} AS v "
        f"FROM {_docs_duck(sf_dir)}"
    ).fetchall()
    want = {d: list(v) for d, v in duck}
    assert got == want


def test_simhash_parity_and_determinism(spark, sf_dir):
    got = {r.id: r.simhash for r in simhash_df(_docs(spark, sf_dir), "doc_id", "text").collect()}
    duck = duckdb.sql(simhash_sql_duck(_docs_duck(sf_dir), "doc_id", "text")).fetchall()
    want = {d: v for d, v in duck}
    assert got == want
    assert all(len(v) == 16 for v in got.values())


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def test_exact_dedup_finds_planted_groups(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.upper(F.col("text")).alias("text"),  # case-mangled: still exact dup
    )
    aug = docs.unionByName(copies)
    groups = {r.keep_id: r.n_copies for r in exact_dedup(aug, "doc_id", "text").collect()}
    planted = [r.doc_id for r in docs.filter(F.col("doc_id") % 10 == 0).collect()]
    texts = {r.doc_id: r.text for r in docs.collect()}
    norm = {}
    for d, t in texts.items():
        norm.setdefault(" ".join(t.lower().split()), []).append(d)
    for d in planted:
        key = min(norm[" ".join(texts[d].lower().split())])
        assert key in groups and groups[key] >= 2


# ---------------------------------------------------------------------------
# minhash + LSH near-dup
# ---------------------------------------------------------------------------

def _augmented_neardup(spark, sf_dir):
    """Docs plus truncated copies of every 5th doc (high trigram Jaccard)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    w = F.split(F.col("text"), " ")
    trunc = F.concat_ws(" ", F.slice(w, 1, F.greatest(F.size(w) - 5, F.lit(1))))
    copies = docs.filter((F.col("doc_id") % 5 == 0) & (F.size(w) >= 40)).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), trunc.alias("text")
    )
    return docs.unionByName(copies)


def _brute_jaccard_pairs(rows, threshold):
    def sh(t):
        w = " ".join(t.lower().split()).split(" ")
        return set(tuple(w[i : i + 3]) for i in range(len(w) - 2))

    S = {d: sh(t) for d, t in rows}
    out = set()
    ids = sorted(S)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            A, B = S[a], S[b]
            if not A or not B:
                continue
            inter = len(A & B)
            uni = len(A | B)
            if inter >= threshold * uni:
                out.add((a, b, inter, uni))
    return out


def test_minhash_lsh_neardup_matches_bruteforce(spark, sf_dir):
    aug = _augmented_neardup(spark, sf_dir)
    got = {
        (r.a, r.b, r.inter, r.uni)
        for r in neardup_pairs_minhash(aug, "doc_id", "text", threshold=0.5).collect()
    }
    rows = [(r.doc_id, r.text) for r in aug.collect()]
    want = _brute_jaccard_pairs(rows, 0.5)
    assert want, "fixture must plant at least one near-dup pair"
    assert got == want


def test_minhash_signature_estimates_jaccard(spark, sf_dir):
    aug = _augmented_neardup(spark, sf_dir)
    sh = shingle_df(aug, "doc_id", "text")
    sigs = {r.id: np.array(r.sig) for r in minhash_signatures(sh, 128).collect()}
    rows = {r.doc_id: r.text for r in aug.collect()}
    planted = [d for d in rows if d >= 1_000_000][:10]
    for c in planted:
        o = c - 1_000_000
        est = float(np.mean(sigs[o] == sigs[c]))
        w = " ".join(rows[o].lower().split()).split(" ")
        wc = " ".join(rows[c].lower().split()).split(" ")
        A = set(tuple(w[i : i + 3]) for i in range(len(w) - 2))
        B = set(tuple(wc[i : i + 3]) for i in range(len(wc) - 2))
        true = len(A & B) / len(A | B)
        # 128 hashes → se = sqrt(J(1-J)/128) ≤ 0.045; allow 4 se
        assert abs(est - true) <= 0.18


def test_lsh_bucket_cap_drops_degenerate_buckets(spark):
    # 50 identical docs → one bucket of 50 → capped at 10 → no pairs emitted
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(50)],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(shingle_df(df, "doc_id", "text"))
    assert lsh_candidate_pairs(sigs, max_bucket=10).count() == 0
    assert lsh_candidate_pairs(sigs, max_bucket=4000).count() == 50 * 49 // 2


def test_lsh_bucket_cap_drop_is_auditable(spark):
    """The skew cap must never drop silently: lsh_drop_stats reports the
    dropped bucket/member counts (a counts-only pass — no members arrays,
    far cheaper than the pair join it audits)."""
    from guava_probably_spark.pipeline.dedup import lsh_drop_stats

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(50)],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(shingle_df(df, "doc_id", "text"))
    assert lsh_candidate_pairs(sigs, max_bucket=10).count() == 0
    # DEFAULT_BANDS bands of 50 identical signatures → one over-cap
    # bucket of 50 per band
    from guava_probably_spark.pipeline.dedup import DEFAULT_BANDS

    r = lsh_drop_stats(sigs, max_bucket=10).first()
    assert r.dropped_buckets == DEFAULT_BANDS
    assert r.dropped_members == DEFAULT_BANDS * 50
    r2 = lsh_drop_stats(sigs, max_bucket=4000).first()
    assert r2.dropped_buckets == 0 and r2.dropped_members == 0


def test_simhash_bucket_cap_drop_is_auditable(spark):
    from guava_probably_spark.pipeline.dedup import (
        simhash_df,
        simhash_drop_stats,
        simhash_near_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame([(i, base) for i in range(20)], ["doc_id", "text"])
    sim = simhash_df(df, "doc_id", "text")
    assert simhash_near_pairs(sim, max_bucket=5).count() == 0
    # identical simhashes → all 4 quarter buckets hold all 20 docs
    r = simhash_drop_stats(sim, max_bucket=5).first()
    assert r.dropped_buckets == 4 and r.dropped_members == 4 * 20


def test_banding_observation_attaches_without_breaking_the_query(spark):
    """The same-action Observe hook stays wired (free when Spark's AQE
    CollectMetrics loss is fixed); today the query must at least run
    unchanged with it attached."""
    from pyspark.sql import Observation

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(10)],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(shingle_df(df, "doc_id", "text"))
    obs = Observation("lsh_drops_smoke")
    assert (
        lsh_candidate_pairs(sigs, max_bucket=4000, observation=obs).count()
        == 10 * 9 // 2
    )


# ---------------------------------------------------------------------------
# simhash near-dup + fast kernel
# ---------------------------------------------------------------------------

def test_simhash_near_pairs_identical_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, "completely different words entirely unrelated content here")],
        ["doc_id", "text"],
    )
    sim = simhash_df(df, "doc_id", "text")
    pairs = {(r.a, r.b): r.hamming for r in simhash_near_pairs(sim, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_fast_simhash_properties():
    base = "one two three four five six seven eight nine ten eleven twelve"
    mutated = base + " thirteen"
    other = "zz yy xx ww vv uu tt ss rr qq pp oo"
    h = fast_simhash([base, base, mutated, other])
    assert h[0] == h[1]
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(h[0], h[2]) <= 12
    assert ham(h[0], h[3]) >= 16


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------

def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_cosine_topk_matches_numpy(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    queries = [(int(ids[i]), list(map(float, m[i]))) for i in range(3)]
    got = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for qid, qvec in queries:
        qn = np.asarray(qvec) / np.linalg.norm(qvec)
        scores = mn @ qn
        order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))
        want = [int(ids[i]) for i in order if ids[i] != qid][:5]
        assert [n for _, n in sorted(by_q[qid])] == want


def test_cosine_neardup_finds_planted_copies(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    aug = emb.unionByName(copies)
    got = {(r.a, r.b) for r in cosine_neardup_pairs(aug, threshold=0.95).collect()}
    want = {
        (int(r.vec_id), int(r.vec_id) + 1_000_000)
        for r in emb.filter(F.col("vec_id") % 10 == 0).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_quality_and_langid_consistency(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    q = {r.id: r for r in quality_df(docs, "doc_id", "text").collect()}
    lang = {r.id: r.pred_lang for r in langid_df(docs, "doc_id", "text").collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    for d, t in texts.items():
        toks = " ".join(t.lower().split()).split(" ")
        assert q[d].ws_tokens == len(toks)
        hits = sum(1 for w in toks if w in textexpr.STOPWORDS)
        assert q[d].stop_hits == hits
        assert lang[d] == ("en" if 10 * hits >= len(toks) else "unk")


_GOPHER_COLS = [
    "n_words", "word_chars", "alpha_words", "n_lines", "dup_lines",
    "bullet_lines", "ellipsis_lines", "symbol_hits", "gopher_pass",
]


def _gopher_rows(df):
    return {r["id"]: tuple(r[c] for c in _GOPHER_COLS) for r in df.collect()}


def _gopher_duck(rel):
    import pandas as pd  # noqa: F401 (duckdb's df registration path)

    rows = duckdb.sql(gopher_sql_duck(rel, "doc_id", "text")).fetchall()
    return {r[0]: tuple(r[1:]) for r in rows}


def test_gopher_quality_matches_duckdb_edge_cases(spark, tmp_path):
    """Spark plan vs the DuckDB oracle on hand-built docs hitting every
    rule: bullets (incl. indentation/unicode glyphs), ASCII + unicode
    ellipses, duplicate lines, symbol runs, empty text, zero-alpha docs."""
    docs = [
        (1, "the quick brown fox jumps over the lazy dog " * 10),
        (2, "- bullet one\n- bullet two\n- bullet three\nplain line"),
        (3, "trailing off...\nand again…\nnormal line\nnormal line"),
        (4, "### markdown ## heading # with … symbols ... and more"),
        (5, ""),
        (6, "1234 5678 9012 3456"),
        (7, "word " * 60),
        (8, "x\ny\nx\ny\nx"),
        (9, "mixed • bullet\n  - indented bullet\n\ttab - not bullet"),
        (10, "…"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = _gopher_rows(gopher_quality_df(sdf, "doc_id", "text"))
    p = str(tmp_path / "gopher_docs.parquet")
    sdf.coalesce(1).write.mode("overwrite").parquet(p)
    want = _gopher_duck(f"read_parquet('{p}/*.parquet')")
    assert got == want
    assert got[1][-1] is True and got[7][-1] is True  # clean docs pass
    # every doc retained, even empty text / single-glyph text
    assert set(got) == {d for d, _ in docs}


def test_gopher_quality_parity_on_corpus(spark, sf_dir):
    got = _gopher_rows(gopher_quality_df(_docs(spark, sf_dir), "doc_id", "text"))
    want = _gopher_duck(_docs_duck(sf_dir))
    assert got == want


def test_gopher_gates_flip_individually(spark):
    """Each Gopher rule independently fails a doc that passes all others."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).strip()
    docs = [
        (0, base),                                        # passes everything
        (1, "too short doc"),                             # word count < 50
        (2, "ab " * 60),                                  # mean word len < 3
        (3, ("verylongwordhere " * 60).strip()
            .replace("verylongwordhere", "extraordinarily")),  # mean len > 10
        (4, base + " " + "#" * 10),                       # symbol ratio > 0.1
        (5, "\n".join(["- " + base] * 10)),               # 100% bullet lines
        (6, "\n".join([base + "..."] * 2 + [base] * 2)),  # 50% ellipsis lines
        (7, ("123 " * 20 + "word " * 41).strip()),        # alpha words < 80%
        (8, "\n".join([base] * 4)),                       # dup-line excess 75%
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = _gopher_rows(gopher_quality_df(sdf, "doc_id", "text"))
    assert got[0][-1] is True
    for d in range(1, 9):
        assert got[d][-1] is False, f"doc {d} should fail its gate"
    # the failing counter is the intended one
    n_words, word_chars, alpha, n_lines, dup, bullets, ellipsis, sym, _ = got[4]
    assert 10 * sym > n_words
    assert 10 * got[5][5] > 9 * got[5][3]       # bullets vs lines
    assert 10 * got[6][6] > 3 * got[6][3]       # ellipsis vs lines
    assert 10 * got[7][2] < 8 * got[7][0]       # alpha vs words
    assert 10 * got[8][4] > 3 * got[8][3]       # dup excess vs lines


_REP_COLS = [
    "n_chars", "top2_chars", "top3_chars", "top4_chars",
    "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars",
    "dup9_chars", "dup10_chars", "repetition_pass",
]


def _rep_rows(df):
    return {r["id"]: tuple(r[c] for c in _REP_COLS) for r in df.collect()}


def _rep_duck(rel):
    rows = duckdb.sql(ngram_repetition_sql_duck(rel, "doc_id", "text")).fetchall()
    return {r[0]: tuple(r[1:]) for r in rows}


def test_ngram_repetition_matches_duckdb_edge_cases(spark, tmp_path):
    """Spark single-scan plan vs the DuckDB list-slice oracle on docs
    hitting each rule: heavy bigram repetition, duplicated long phrases,
    empty/null text, docs shorter than every n, tie-broken top grams."""
    docs = [
        (1, "the cat sat on the mat " * 4),
        (2, "one two three four five six seven eight nine ten"),
        (3, ""),
        (4, "word"),
        (5, "a b " * 30),                     # top2 dominates
        (6, None),
        (7, ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu ") * 3),              # dup 5..10-grams all fire
        (8, "x y x z"),                       # top2 tie 'x y' vs 'y x' vs 'x z'
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = _rep_rows(ngram_repetition_df(sdf, "doc_id", "text"))
    p = str(tmp_path / "rep_docs.parquet")
    sdf.coalesce(1).write.mode("overwrite").parquet(p)
    want = _rep_duck(f"read_parquet('{p}/*.parquet')")
    assert got == want
    assert set(got) == {d for d, _ in docs}
    # rule sanity: doc 5's top-2-gram mass exceeds 20% of chars → fails
    assert got[5][-1] is False
    # doc 2 has no repetition at all → every dup counter 0; the top-2-gram
    # rule still fails (count-1 gram = 'seven eight' is >20% of a 10-word
    # doc's chars — Gopher pairs this gate with the >=50-word length rule)
    assert got[2][4:10] == (0,) * 6
    assert got[2][1] == len("seven eight") and got[2][-1] is False
    # short/empty docs pass (0 <= 0) with zeroed counters
    for d in (3, 4, 6):
        assert got[d][1:10] == (0,) * 9 and got[d][-1] is True


def test_ngram_repetition_parity_on_corpus(spark, sf_dir):
    got = _rep_rows(ngram_repetition_df(_docs(spark, sf_dir), "doc_id", "text"))
    want = _rep_duck(_docs_duck(sf_dir))
    assert got == want


def test_ngram_repetition_local_recompute(spark):
    """Counter semantics pinned against a direct Python recompute (not
    just engine-vs-engine): top = max-count gram's chars x count with
    longest-gram tie-break; dup = sum c*len over grams with c >= 2."""
    from collections import Counter

    text = "to be or not to be that is the question to be or not"
    words = text.split()
    sdf = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = ngram_repetition_df(sdf, "doc_id", "text").collect()[0]
    for n, col in [(2, "top2_chars"), (3, "top3_chars"), (4, "top4_chars")]:
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        mc = max(grams.values())
        top_len = max(len(g) for g, c in grams.items() if c == mc)
        assert row[col] == mc * top_len, (n, dict(grams))
    for n in range(5, 11):
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        dup = sum(c * len(g) for g, c in grams.items() if c >= 2)
        assert row[f"dup{n}_chars"] == dup, n
    assert row["n_chars"] == len(text)


def test_ngram_repetition_chunked_kernel_identical(spark, sf_dir):
    """The kernel splits each Arrow batch into word-bounded doc chunks
    (exact int64 identity composition needs W*vocab < 2^63). Tests never
    reach the 4M-word bound, so force a tiny bound (closure-captured, so
    it reaches the executors) and require the output to be identical to
    the single-chunk run — chunk boundaries must not leak gram identities
    across docs or drop boundary windows."""
    docs = _docs(spark, sf_dir)
    want = _rep_rows(ngram_repetition_df(docs, "doc_id", "text"))
    got = _rep_rows(ngram_repetition_df(docs, "doc_id", "text", chunk_words=37))
    assert got == want


def test_token_counts_by_source(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    got = {r.grp: (r.n_docs, r.total_ws_tokens) for r in token_counts_df(docs, "source", "text").collect()}
    want = {}
    for r in docs.collect():
        n, t = want.get(r.source, (0, 0))
        want[r.source] = (n + 1, t + len(" ".join(r.text.lower().split()).split(" ")))
    assert got == want


def test_rolling_fingerprint_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "Alpha  beta GAMMA")],
        ["doc_id", "text"],
    )
    fp = {r.id: r.roll_fp for r in rolling_fingerprint_df(df, "doc_id", "text").collect()}
    assert fp[0] != fp[1]  # order-sensitive
    assert fp[0] == fp[2]  # case/whitespace-insensitive


def test_winnowing_shared_substring_shares_fingerprints():
    a = "the common shared passage appears verbatim in both documents here"
    fa = set(winnowing_fingerprints("intro words then " + a))
    fb = set(winnowing_fingerprints(a + " with a different tail of words"))
    fc = set(winnowing_fingerprints("totally unrelated text with no overlap at all whatsoever"))
    assert fa & fb
    assert len(fa & fc) <= 1


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_features_roundtrip(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    pay = with_payload(docs, "doc_id", "text")
    feats = {r.id: r for r in extract_binary_features(pay).collect()}
    for r in docs.collect():
        f = feats[r.doc_id]
        assert f.header_ok
        assert f.n_bytes == 4 + len(r.text.encode("utf-8"))
        assert f.first_byte == r.text.encode("utf-8")[0]


def test_decode_image_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"GPMMabc")
    t1 = decode_image(b"GPMMabc", fake=True)
    t2 = decode_image(b"GPMMabc", fake=True)
    assert t1.shape == (8, 8, 3) and t1.dtype == np.uint8
    assert (t1 == t2).all()


# ---------------------------------------------------------------------------
# IVF ANN (scale path)
# ---------------------------------------------------------------------------

def test_ivf_full_probe_matches_bruteforce(spark, sf_dir):
    from guava_probably_spark.pipeline import assign_lists, ivf_topk, train_codebook

    emb = _emb(spark, sf_dir)
    cb = train_codebook(emb, nlist=8, iters=4)
    assigned = assign_lists(emb, cb)
    rows = emb.collect()
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows[:3]]
    # nprobe = nlist → every list scanned → identical to exact brute force
    got = ivf_topk(assigned, cb, queries, k=5, nprobe=8).collect()
    want = cosine_topk(emb, queries, k=5).collect()
    key = lambda rs: sorted((r.query_id, r.rank, r.neighbor_id) for r in rs)
    assert key(got) == key(want)


def test_ivf_pruned_probe_recall(spark, sf_dir):
    from guava_probably_spark.pipeline import assign_lists, ivf_topk, train_codebook

    emb = _emb(spark, sf_dir)
    cb = train_codebook(emb, nlist=8, iters=4)
    assigned = assign_lists(emb, cb)
    rows = emb.collect()
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows[:5]]
    got = ivf_topk(assigned, cb, queries, k=10, nprobe=3)
    exact = cosine_topk(emb, queries, k=10)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(g & e) / len(e)
    # random 128-dim gaussians cluster weakly; 3/8 lists still recovers the
    # self-adjacent structure. Deterministic (fixed seeds) — not flaky.
    assert recall >= 0.35, recall
    # pruning must actually reduce the scanned set
    assert assigned.select("list_id").distinct().count() == 8


def test_minhash_text_fast_path_estimates_jaccard(spark, sf_dir):
    """The no-shuffle hash-composed signature path must estimate the same
    Jaccard as the exact string-shingle path (both are 128-perm MinHash of
    the same trigram set, one by string identity, one by 64-bit hash)."""
    from guava_probably_spark.pipeline.dedup import minhash_signatures_text

    aug = _augmented_neardup(spark, sf_dir)
    fast = {r.id: np.array(r.sig) for r in minhash_signatures_text(aug, "doc_id", "text").collect()}
    rows = {r.doc_id: r.text for r in aug.collect()}
    assert set(fast) == set(rows)
    planted = [d for d in rows if d >= 1_000_000][:10]
    for c in planted:
        o = c - 1_000_000
        est = float(np.mean(fast[o] == fast[c]))
        w = " ".join(rows[o].lower().split()).split(" ")
        wc = " ".join(rows[c].lower().split()).split(" ")
        A = set(tuple(w[i : i + 3]) for i in range(len(w) - 2))
        B = set(tuple(wc[i : i + 3]) for i in range(len(wc) - 2))
        true = len(A & B) / len(A | B)
        assert abs(est - true) <= 0.18, (c, est, true)
    # unrelated docs: near-zero signature agreement
    ids = sorted(d for d in rows if d < 1_000_000)[:20]
    cross = [float(np.mean(fast[a] == fast[b])) for a in ids[:5] for b in ids[10:15]]
    assert max(cross) <= 0.25


def test_minhash_band_keys_find_neardups(spark, sf_dir):
    """Arrow-native band-key path: candidates cover every true near-dup pair
    (same banding math as the signature path, keys packed JVM-free)."""
    from guava_probably_spark.pipeline.dedup import (
        minhash_band_keys,
        pairs_from_band_rows,
    )

    aug = _augmented_neardup(spark, sf_dir)
    cand = {
        (r.a, r.b)
        for r in pairs_from_band_rows(minhash_band_keys(aug, "doc_id", "text")).collect()
    }
    rows = [(r.doc_id, r.text) for r in aug.collect()]
    want = {(a, b) for a, b, _, _ in _brute_jaccard_pairs(rows, 0.5)}
    assert want and want <= cand


# ---------------------------------------------------------------------------
# physical-plan shape: pruning and no needless shuffles
# ---------------------------------------------------------------------------

def test_pipeline_plans_prune_and_avoid_shuffles(spark, sf_dir):
    from guava_probably_spark.pipeline.dedup import minhash_band_keys
    from guava_probably_spark.plans import physical_plan, scan_read_schema

    docs = _docs(spark, sf_dir)
    # quality scoring: projection only — scan must read exactly (doc_id, text)
    q = quality_df(docs, "doc_id", "text")
    rs = scan_read_schema(q)
    assert "text" in rs and "doc_id" in rs
    assert "lang" not in rs and "source" not in rs and "n_chars" not in rs
    # no exchange at all: pure map-side projection
    assert "Exchange" not in physical_plan(q)
    # band-key generation: one Arrow stage straight off the scan, no shuffle
    bk = minhash_band_keys(docs, "doc_id", "text")
    assert "Exchange" not in physical_plan(bk)
    assert "lang" not in scan_read_schema(bk)
    # exact dedup: exactly one exchange (the hash aggregation on fp)
    d = exact_dedup(docs, "doc_id", "text")
    assert physical_plan(d).count("Exchange") == 1


def test_connected_components_planted_clusters(spark):
    """Components over random planted clusters match a union-find reference,
    including a 60-node chain (pointer jumping must contract it)."""
    import numpy as np

    from guava_probably_spark.pipeline.components import (
        connected_components,
        keep_canonical,
    )

    rng = np.random.default_rng(3)
    edges = []
    base = 0
    truth = {}
    for cid in range(12):
        size = int(rng.integers(2, 9))
        nodes = list(range(base, base + size))
        # random spanning tree + a few extras
        for i in range(1, size):
            edges.append((nodes[i], nodes[int(rng.integers(0, i))]))
        for _ in range(2):
            x, y = rng.choice(nodes, 2, replace=False)
            if x != y:
                edges.append((int(x), int(y)))
        for v in nodes:
            truth[v] = nodes[0]
        base += size + int(rng.integers(1, 4))  # gaps → singletons absent
    chain = list(range(10_000, 10_060))
    edges += list(zip(chain[:-1], chain[1:]))
    truth.update({v: chain[0] for v in chain})

    df = spark.createDataFrame(edges, "a long, b long").repartition(7)
    # both execution modes run the same math and must agree with union-find
    for mode in ("driver", "distributed"):
        got = {r.v: r.component for r in connected_components(df, mode=mode).collect()}
        assert got == truth, mode

    ids = spark.createDataFrame([(v,) for v in truth], "doc_id long")
    kept = {r.doc_id for r in keep_canonical(ids, "doc_id", connected_components(df)).collect()}
    assert kept == set(truth.values())


def test_redact_masks_pii_and_preserves_clean_text(spark):
    from guava_probably_spark.pipeline.textops import redact_df

    rows = [
        (1, "write to Bob.Smith+x@Corp.IO today"),
        (2, "server 192.168.1.254 and card 4111111111111111"),
        (3, "clean text with numbers 123 and 1.5 stays"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.text for r in redact_df(df, "doc_id", "text").collect()}
    assert got[1] == "write to <EMAIL> today"
    assert got[2] == "server <IP> and card <CARD>"
    assert got[3] == rows[2][1]  # untouched


def test_word_repetition_matches_pandas(spark):
    import pandas as pd

    from guava_probably_spark.pipeline.textops import word_repetition_df

    rows = [(1, "a a a b c"), (2, "x y"), (3, "Spam  spam SPAM")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.n_words, r.n_distinct_words, r.top_word_count)
        for r in word_repetition_df(df, "doc_id", "text").collect()
    }
    assert got[1] == (5, 3, 3)
    assert got[2] == (2, 2, 1)
    assert got[3] == (3, 1, 3)  # normalization lowercases + collapses ws


def test_flag_contaminated_exact_and_zero_fn(spark, sf_dir):
    """Every planted leak is flagged (zero FN through the bloom), nothing
    clean is flagged after verification, under both verify modes."""
    from guava_probably_spark.pipeline.contamination import flag_contaminated

    train = _docs(spark, sf_dir).select("doc_id", "text")
    # eval: every 4th doc leaked (case-mangled — fingerprint-identical),
    # the rest made novel by a suffix
    ev = train.select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.when(F.col("doc_id") % 4 == 0, F.upper("text")).otherwise(
            F.concat(F.col("text"), F.lit(" zzz novel suffix"))
        ).alias("text"),
    )
    got = {r.id: r.leaked for r in flag_contaminated(train, ev, "doc_id", "text").collect()}
    want = {
        r.doc_id + 500_000: r.doc_id % 4 == 0 for r in train.select("doc_id").collect()
    }
    assert got == want
    # unverified mode: may overflag, never underflags
    loose = {r.id: r.leaked for r in flag_contaminated(train, ev, "doc_id", "text", verify=False).collect()}
    assert all(loose[i] for i, leaked in want.items() if leaked)
    # inverted direction (filter on the eval side, the 10^12-train shape):
    # exact by construction, even with a uselessly-loose fpp
    inv = {
        r.id: r.leaked
        for r in flag_contaminated(
            train, ev, "doc_id", "text", fpp=0.9, direction="eval"
        ).collect()
    }
    assert inv == want


def test_ngram_overlap_contamination(spark):
    """GPT-3-style n-gram decontamination: per-doc overlap fraction equals
    an exact local recompute (zero FN through the bloom; at fpp=1e-6 on a
    tiny corpus no FP fires), full/partial/clean leaks classified right,
    and sub-n-token docs come back (0, 0.0, false)."""
    from guava_probably_spark.pipeline.contamination import ngram_overlap_contamination

    train_rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(30))) for i in range(40)
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    n = 5

    def grams(t):
        toks = t.lower().split()
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    train_grams = {g for _, t in train_rows for g in grams(t)}
    ev_rows = [
        (100, train_rows[3][1].upper()),                     # full leak (case-mangled)
        (101, train_rows[7][1] + " " + " ".join(f"q{j}" for j in range(30))),  # ~half
        (102, " ".join(f"q{j}" for j in range(40))),         # clean
        (103, "too short"),                                  # < n tokens
    ]
    ev = spark.createDataFrame(ev_rows, "doc_id long, text string")
    got = {
        r.id: r
        for r in ngram_overlap_contamination(
            train, ev, "doc_id", "text", n=n, threshold=0.4
        ).collect()
    }
    assert set(got) == {100, 101, 102, 103}
    for eid, text in ev_rows:
        gs = grams(text)
        exact_hits = sum(g in train_grams for g in gs)
        r = got[eid]
        assert r.ngrams == len(gs) and r.hits == exact_hits, eid
        assert abs(r.overlap - (exact_hits / max(len(gs), 1))) < 1e-12
    assert got[100].contaminated and got[100].overlap == 1.0
    assert got[101].contaminated  # 26/56 ≈ 0.46 of its grams leak ≥ 0.4
    assert got[101].overlap == pytest.approx(
        sum(g in train_grams for g in grams(ev_rows[1][1])) / len(grams(ev_rows[1][1]))
    )
    assert not got[102].contaminated and got[102].hits == 0
    assert got[103].ngrams == 0 and not got[103].contaminated
    # the readable string-gram path (hashed=False, the audit mode), a
    # deliberately awful fpp (every train gram survives pruning — the join
    # must still erase all false positives), and the forced-bloom branch
    # (broadcast_grams=0 disables the small-eval broadcast semi-join the
    # default path takes here) agree with the default path
    for kw in ({"hashed": False}, {"fpp": 0.9}, {"broadcast_grams": 0}):
        alt = {
            r.id: r
            for r in ngram_overlap_contamination(
                train, ev, "doc_id", "text", n=n, threshold=0.4, **kw
            ).collect()
        }
        for eid in got:
            assert (alt[eid].ngrams, alt[eid].hits) == (
                got[eid].ngrams,
                got[eid].hits,
            ), kw


def test_vocab_topk_matches_exact_and_certifies(spark, sf_dir):
    """Sketch-pruned top-k vocabulary equals the exact full-shuffle answer
    (same tie-break) and the containment certificate holds."""
    from guava_probably_spark.pipeline.textops import vocab_topk

    docs = _docs(spark, sf_dir).select("text")
    got, guaranteed = vocab_topk(docs, "text", k=25, mg_k=4096)
    want = (
        docs.select(F.explode(F.expr(textexpr.words_expr("text", "spark"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(25)
    )
    assert [(r.word, r.cnt) for r in got.collect()] == [
        (r.word, r.cnt) for r in want.collect()
    ]
    assert guaranteed  # tiny vocab: every word retained exactly


def test_connected_components_regression_stranded_node(spark):
    """The hypothesis-shrunk counterexample that broke the driver kernel's
    edge contraction — pinned against both execution modes."""
    from guava_probably_spark.pipeline.components import connected_components

    df = spark.createDataFrame([(0, 3), (1, 2), (3, 2)], "a long, b long")
    for mode in ("driver", "distributed"):
        got = {r.v: r.component for r in connected_components(df, mode=mode).collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 0}, mode


def test_resize_and_decode_pipeline_plumbing(spark):
    """decode (fake) → nearest-neighbor resize (real numpy) → exact pixel
    stats through the Arrow mapInPandas stage; resize verified directly."""
    import numpy as np

    from guava_probably_spark.pipeline.multimodal import (
        decode_image,
        decode_resize_features,
        resize_image,
        with_payload,
    )

    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    small = resize_image(img, 3, 4)
    assert small.shape == (3, 4)
    assert (small == img[::2][:, ::2]).all()  # exact 2x decimation
    with pytest.raises(ValueError):
        resize_image(np.zeros(5), 2, 2)

    docs = spark.createDataFrame(
        [(i, f"payload text {i}") for i in range(40)], "doc_id long, text string"
    )
    payloads = with_payload(docs, "doc_id", "text")
    got = {
        r.id: (r.height, r.width, r.px_sum, r.px_sq_sum)
        for r in decode_resize_features(payloads, 8, 8, fake=True).collect()
    }
    raw = {r.id: bytes(r.payload) for r in payloads.collect()}
    for i, payload in raw.items():
        px = resize_image(decode_image(payload, fake=True), 8, 8).astype(np.int64)
        assert got[i] == (8, 8, int(px.sum()), int((px * px).sum()))


def test_multimodal_mixed_payload_schema_and_feature_stages(spark):
    """with_multimodal_payload: typed per-modality metadata (audio
    sample_rate / video n_frames, null elsewhere); audio fake-PCM and
    video frame-sample stages match a local recompute exactly."""
    import numpy as np

    from guava_probably_spark.pipeline.multimodal import (
        _MAGIC,
        audio_features,
        frame_sample,
        resize_image,
        video_frame_features,
        with_multimodal_payload,
    )

    docs = spark.createDataFrame(
        [(i, f"clip {i} " + "x" * (i % 11)) for i in range(30)],
        "doc_id long, text string",
    )
    pl = with_multimodal_payload(docs, "doc_id", "text")
    metas = {r.id: r.meta for r in pl.collect()}
    raw = {r.id: bytes(r.payload) for r in pl.collect()}
    for i, m in metas.items():
        mod = ("image", "audio", "video")[i % 3]
        assert m.modality == mod
        assert m.n_bytes == len(raw[i])
        assert m.sample_rate == (16000 if mod == "audio" else None)
        assert m.n_frames == (4 if mod == "video" else None)

    aud = {r.id: (r.n_samples, r.amp_sum)
           for r in audio_features(pl.filter("meta.modality = 'audio'")).collect()}
    for i, (ns, amp) in aud.items():
        body = raw[i][len(_MAGIC):]
        pcm = np.frombuffer(body[: len(body) // 2 * 2], dtype="<i2")
        assert ns == len(pcm)
        assert amp == int(np.abs(pcm.astype(np.int64)).sum())

    vid = {r.id: (r.n_frames, r.px_sum)
           for r in video_frame_features(pl.filter("meta.modality = 'video'"), fake=True).collect()}
    for i, (nf, px) in vid.items():
        frames = frame_sample(raw[i], 4, fake=True)
        assert nf == 4
        assert px == sum(int(resize_image(f, 8, 8).astype(np.int64).sum()) for f in frames)
    assert set(aud) and set(vid)


def test_fast_simhash_batch_layout_invariant():
    """A doc's simhash must not depend on its neighbors: the old reduceat
    clamp leaked the last token's bits into a trailing empty doc's segment,
    so the SAME text fingerprinted differently across batch layouts."""
    from guava_probably_spark.pipeline.dedup import fast_simhash

    text = "alpha beta gamma delta epsilon"
    alone = fast_simhash([text])[0]
    with_trailing_empty = fast_simhash([text, ""])[0]
    with_trailing_none = fast_simhash([text, None])[0]
    sandwiched = fast_simhash(["", text, ""])[1]
    assert alone == with_trailing_empty == with_trailing_none == sandwiched
    # a null doc has zero tokens → zero set bits (an empty STRING tokenizes
    # to one empty token, so it gets that token's fixed, deterministic hash)
    assert fast_simhash([text, None])[1] == 0


def test_minhash_signature_batch_layout_invariant():
    """Same for MinHash: a trailing zero-token doc used to truncate the
    preceding doc's segmented min (its last trigram's hash was excluded),
    producing layout-dependent signatures and missed candidate pairs."""
    import pyarrow as pa

    from guava_probably_spark.pipeline.dedup import (
        _perm_params,
        _sig_matrix_from_batch,
    )

    a, b = _perm_params(16)
    text = "one two three four five"

    def sig(texts, ids):
        batch = pa.RecordBatch.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(texts, pa.string())],
            names=["id", "text"],
        )
        out_ids, sigs = _sig_matrix_from_batch(batch, a, b, 16)
        return dict(zip(out_ids.tolist(), [tuple(r) for r in sigs.tolist()]))

    alone = sig([text], [1])[1]
    assert sig([text, None], [1, 2])[1] == alone
    assert sig([text, ""], [1, 2])[1] == alone
    assert sig(["", text, "x y"], [0, 1, 2])[1] == alone
    # a doc with <3 tokens has no trigrams: identity signature
    assert all(v == 2**63 - 1 for v in sig([text, "x y"], [1, 2])[2])


def test_lm_quality_score_matches_local_recompute(spark):
    """Sketch-LM scores from the distributed pipeline equal a local numpy
    recompute through the SAME deterministic CMS blob (1e-9), gibberish
    ranks below in-domain text, and sub-n-word docs come back NULL."""
    from guava_probably_spark.pipeline.contamination import _ngram_col
    from guava_probably_spark.pipeline.textops import lm_quality_score
    from guava_probably_spark.sketches import SketchSpec

    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(50)]
    train_rows = [
        (i, " ".join(rng.choice(vocab[:20], size=40)))  # head-heavy domain
        for i in range(200)
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev_rows = [
        (0, " ".join(rng.choice(vocab[:20], size=30))),   # in-domain
        (1, " ".join(rng.choice(vocab[30:], size=30))),   # out-of-domain
        (2, "zzz"),                                        # < n words → NULL
    ]
    ev = spark.createDataFrame(ev_rows, "doc_id long, text string")
    n = 2
    got = {
        r.id: r
        for r in lm_quality_score(
            train, ev, "doc_id", "text", n=n, hashed=False
        ).collect()
    }

    # local recompute through the same deterministic blob
    def grams(t):
        toks = t.lower().split()
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    cms = SketchSpec("cms", {"epsilon": 1e-5, "delta": 1e-3}).create()
    all_grams = [g for _, t in train_rows for g in grams(t)]
    cms.update(all_grams)
    total = len(all_grams)
    for eid, text in ev_rows:
        gs = grams(text)
        r = got[eid]
        assert r.ngrams == len(gs)
        if not gs:
            assert r.avg_logprob is None
            continue
        want = float(np.mean(np.log((cms.estimate(gs) + 1.0) / (total + 1.0))))
        assert abs(r.avg_logprob - want) < 1e-9, eid
    assert got[0].avg_logprob > got[1].avg_logprob  # in-domain scores higher
    # spark-side ngram expression agrees with the python reference
    sdf = ev.select(F.size(_ngram_col("text", n)).alias("c")).collect()
    assert [r.c for r in sdf] == [len(grams(t)) for _, t in ev_rows]
    # the hashed scale path (grams as xxhash64 ints) gives the same scores
    # on this corpus (CMS exact at this epsilon; no 64-bit collisions)
    hashed = {
        r.id: r for r in lm_quality_score(train, ev, "doc_id", "text", n=n).collect()
    }
    for eid, _ in ev_rows:
        assert hashed[eid].ngrams == got[eid].ngrams
        if got[eid].avg_logprob is None:
            assert hashed[eid].avg_logprob is None
        else:
            assert hashed[eid].avg_logprob == pytest.approx(
                got[eid].avg_logprob, abs=1e-12
            )


def test_lm_quality_pre_aggregate_paths_identical(spark):
    """The weighted pre-aggregated train pass (groupBy gram → weighted CMS
    build, the scale default) yields scores identical to the per-instance
    stream, and the underlying CMS blob is byte-identical — integer bucket
    sums are order- and batching-independent, so (gram, count) pairs and
    count repeated instances land the same counts array and the same N."""
    from guava_probably_spark.operators import collect_sketch
    from guava_probably_spark.operators.build import collect_weighted_sketch
    from guava_probably_spark.pipeline.contamination import _ngrams_df
    from guava_probably_spark.pipeline.textops import lm_quality_score
    from guava_probably_spark.sketches import SketchSpec
    from guava_probably_spark.sketches.base import FUNNEL_LONG

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab, size=25))) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    a = {
        r.id: r
        for r in lm_quality_score(
            df, df, "doc_id", "text", n=2, pre_aggregate=True
        ).collect()
    }
    b = {
        r.id: r
        for r in lm_quality_score(
            df, df, "doc_id", "text", n=2, pre_aggregate=False
        ).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k].ngrams == b[k].ngrams
        assert a[k].avg_logprob == pytest.approx(b[k].avg_logprob, abs=0)

    # blob byte-identity between the two build shapes
    spec = SketchSpec("cms", {"epsilon": 1e-4, "delta": 1e-2, "funnel": FUNNEL_LONG})
    g = (
        _ngrams_df(df, "text", 2)
        .withColumnRenamed("ng", "g")
        .withColumn("g", F.xxhash64("g"))
    )
    inst, total_inst, _ = collect_sketch(g, "g", spec)
    wtd, _, _ = collect_weighted_sketch(
        g.groupBy("g").agg(F.count("*").alias("w")), "g", "w", spec
    )
    assert wtd.total == total_inst
    assert wtd.to_bytes() == inst.to_bytes()


def test_ngrams_df_matches_expression_form(spark):
    """The NGram-based scale path emits EXACTLY the gram lists of the
    pure-expression `_ngram_col` — unicode punctuation, whitespace runs,
    short docs, empty and NULL text."""
    from guava_probably_spark.pipeline.contamination import _ngram_col, _ngrams_df

    rows = [
        (0, "The quick  brown FOX, jumps over; the lazy dog's tail today"),
        (1, "  múltiple   spaces\tand\nnewlines  plus unicode: naïve café ok"),
        (2, "one two three"),          # exactly n tokens at n=3
        (3, "too short"),              # < n
        (4, ""),                       # empty
        (5, None),                     # null text
        (6, "a b c d e f g h i j k l m n o p"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    for n in (2, 3, 13):
        expr = {
            r.id: r.g
            for r in df.select("id", _ngram_col("text", n).alias("g"))
            .collect()
        }
        ml = {}
        for r in _ngrams_df(df, "text", n, keep=("id",), outer=True).collect():
            ml.setdefault(r.id, [])
            if r.ng is not None:
                ml[r.id].append(r.ng)
        for rid, _ in rows:
            want = expr.get(rid) or []
            assert ml[rid] == list(want), (n, rid, want, ml[rid])


# ---------------------------------------------------------------------------
# config.PIN_INTERMEDIATES (deploy-time materialize default)
# ---------------------------------------------------------------------------

def test_pin_intermediates_default_resolution(monkeypatch):
    from guava_probably_spark import config

    assert config.pin_default(None) == config.PIN_INTERMEDIATES
    assert config.pin_default(True) is True
    assert config.pin_default(False) is False
    monkeypatch.setattr(config, "PIN_INTERMEDIATES", False)
    assert config.pin_default(None) is False
    assert config.pin_default(True) is True  # per-call still wins


def test_minhash_neardup_lazy_path_same_pairs(spark, sf_dir, monkeypatch):
    """PIN_INTERMEDIATES=False (spot-executor posture) must change only the
    plan shape (no eager localCheckpoints), never the verified pairs."""
    from guava_probably_spark import config

    aug = _augmented_neardup(spark, sf_dir)
    pinned = {
        (r.a, r.b, r.inter, r.uni)
        for r in neardup_pairs_minhash(aug, "doc_id", "text", threshold=0.5).collect()
    }
    monkeypatch.setattr(config, "PIN_INTERMEDIATES", False)
    lazy = {
        (r.a, r.b, r.inter, r.uni)
        for r in neardup_pairs_minhash(aug, "doc_id", "text", threshold=0.5).collect()
    }
    assert pinned == lazy and pinned


def _c4_rows(df):
    cols = ["n_lines", "kept_lines", "n_sentences", "bad_word_hits",
            "has_lorem", "has_brace", "c4_pass", "clean_text"]
    return {r["id"]: tuple(r[c] for c in cols) for r in df.collect()}


def test_c4_quality_matches_duckdb_edge_cases(spark, tmp_path):
    from guava_probably_spark.pipeline.textops import c4_quality_df, c4_sql_duck

    docs = [
        (1, "Good first sentence here today.\nshort line.\n"
            "Another full sentence with enough words!\n"
            "And a third proper sentence right here?"),
        (2, "No terminal punctuation on this line\nor on this one either"),
        (3, "This page uses javascript for everything else here.\n"
            "A perfectly fine sentence stands alone here."),
        (4, "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
            "One more good sentence with many words here.\n"
            "And another one to clear the bar today."),
        (5, "function f() { return 1; } is code-like content here.\n"
            "Second sentence with plenty of words present.\n"
            "Third sentence with plenty of words present too."),
        (6, ""),
        (7, None),
        (8, "The casino page sells viagra to everyone constantly.\n"
            "Second proper sentence with lots of words here.\n"
            "Third proper sentence with lots of words here too."),
        (9, 'He said "stop right there before the gate."\n'
            'A quoted ending counts as terminal punctuation "\n'
            "Third sentence here has plenty of words overall."),
        # CRLF endings: Java-regex '$' matches before the trailing \r while
        # RE2 '$' does not — the last-char test must keep both engines
        # identical AND keep the lines (the \r is line-ending residue)
        (10, "Windows line one has enough words here.\r\n"
             "Windows line two has enough words too!\r\n"
             "Windows line three has enough words also?\r"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = _c4_rows(c4_quality_df(sdf, "doc_id", "text"))
    p = str(tmp_path / "c4_docs.parquet")
    sdf.coalesce(1).write.mode("overwrite").parquet(p)
    want = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(
            c4_sql_duck(f"read_parquet('{p}/*.parquet')", "doc_id", "text")
        ).fetchall()
    }
    # want tuples rely on c4_sql_duck's SELECT order matching _c4_rows'
    # column list (positional compare, both fixed in this file)
    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])
    # rule-level spot checks
    by = {r["id"]: r for r in c4_quality_df(sdf, "doc_id", "text").collect()}
    assert by[1].kept_lines == 3 and by[1].c4_pass  # 'short line.' dropped (<5 words)
    assert by[2].kept_lines == 0 and not by[2].c4_pass
    assert by[3].kept_lines == 1  # javascript line dropped
    assert by[4].has_lorem and not by[4].c4_pass
    assert by[5].has_brace and not by[5].c4_pass
    assert by[6].clean_text == "" and not by[6].c4_pass
    assert by[7].clean_text == "" and not by[7].c4_pass
    assert by[8].bad_word_hits == 2 and not by[8].c4_pass
    # quote-terminated line is KEPT by the line filter but adds no [.!?]
    # sentence mark, so the <3-sentences gate still rejects the page
    assert by[9].kept_lines == 3 and by[9].n_sentences == 2 and not by[9].c4_pass
    assert by[10].kept_lines == 3 and by[10].c4_pass  # CRLF lines kept


def test_c4_quality_parity_on_corpus(spark, sf_dir, tmp_path):
    from guava_probably_spark.pipeline.textops import c4_quality_df, c4_sql_duck

    # fixture text has no newlines: inject line breaks every 8 words so the
    # line filter has real work (same trick as the boilerplate bench row)
    docs = _docs(spark, sf_dir).withColumn(
        "text", F.regexp_replace("text", r"((?:\S+ ){7}\S+) ", "$1\n")
    )
    got = _c4_rows(c4_quality_df(docs, "doc_id", "text"))
    p = str(tmp_path / "c4_corpus.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(p)
    want = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(
            c4_sql_duck(f"read_parquet('{p}/*.parquet')", "doc_id", "text")
        ).fetchall()
    }
    assert got == want


def test_c4_clean_text_local_recompute(spark):
    from guava_probably_spark.pipeline import textexpr
    from guava_probably_spark.pipeline.textops import c4_quality_df

    text = ("Alpha beta gamma delta epsilon zeta.\n"
            "tiny.\n"
            "Uses javascript under the hood every day.\n"
            "Final sentence with a full stop and words.")
    sdf = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = c4_quality_df(sdf, "doc_id", "text").collect()[0]

    def keep(line):
        t = line.strip()
        wc = len(" ".join(line.split()).strip().split(" "))
        return (bool(t) and t[-1] in '.!?"' and wc >= textexpr.C4_MIN_LINE_WORDS
                and "javascript" not in line.lower())

    kept = [l for l in text.split("\n") if keep(l)]
    assert row.clean_text == "\n".join(kept)
    assert row.kept_lines == len(kept) == 2
    assert row.n_sentences == sum(c in ".!?" for c in row.clean_text)


def test_c4_plan_has_no_exchange(spark, sf_dir):
    """The C4 pass is per-doc: the physical plan must contain NO Exchange
    at any scale (the 100-TB claim is structural, not a tuning outcome)."""
    from guava_probably_spark.pipeline.textops import c4_quality_df
    from guava_probably_spark.plans import physical_plan

    plan = physical_plan(c4_quality_df(_docs(spark, sf_dir), "doc_id", "text"))
    assert "Exchange" not in plan, plan


def test_ngram_repetition_plan_has_no_exchange(spark, sf_dir):
    """Per-doc gram stats via the Arrow kernel: zero shuffle by design."""
    from guava_probably_spark.plans import physical_plan

    plan = physical_plan(
        ngram_repetition_df(_docs(spark, sf_dir), "doc_id", "text")
    )
    assert "Exchange" not in plan, plan


def test_dsir_score_plan_broadcasts_lambda(spark, sf_dir):
    """The DSIR scored pass must broadcast the buckets-row lambda table
    (never sort-merge 10k rows against the gram stream) and shuffle only
    the per-doc aggregation."""
    from guava_probably_spark.pipeline.dsir import dsir_logweights
    from guava_probably_spark.plans import physical_plan

    docs = _docs(spark, sf_dir)
    tgt = docs.filter(F.col("doc_id") % 10 == 0)
    plan = physical_plan(dsir_logweights(docs, tgt, "doc_id", "text", 257))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan
