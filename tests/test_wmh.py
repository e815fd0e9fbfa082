"""Weighted MinHash (ICWS) — estimator soundness, kernel consistency, and
the end-to-end Spark near-dup pipeline against brute-force weighted Jaccard.

Contract (Ioffe ICDM 2010 Thm 1): P[sig_A[i] == sig_B[i]] = J_w(A, B)
exactly, so the match fraction over k hashes is unbiased with
σ = √(J(1−J)/k). Tests assert a 5σ band at k = 1024 (deterministic
variates — the 'random' draws are fmix64 mixes of the trigram hash, so a
pass is a pass forever).
"""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from guava_probably_spark.pipeline.wmh import (
    _doc_trigram_counts,
    _icws_sig_matrix,
    neardup_pairs_wminhash,
    trigram_counts_df,
    weighted_jaccard_pairs,
    wmh_band_keys,
    wmh_signatures_text,
)


def _exact_jw(wa: dict, wb: dict) -> float:
    keys = set(wa) | set(wb)
    inter = sum(min(wa.get(k, 0), wb.get(k, 0)) for k in keys)
    uni = sum(max(wa.get(k, 0), wb.get(k, 0)) for k in keys)
    return inter / uni


def _seg_input(multisets):
    """[(hash->weight)] → (seg_starts, hh, cnt) in _icws_sig_matrix shape."""
    hh, cnt, starts = [], [], [0]
    for m in multisets:
        for h, w in m.items():
            hh.append(h)
            cnt.append(w)
        starts.append(len(hh))
    return (
        np.array(starts, dtype=np.int64),
        np.array(hh, dtype=np.uint64),
        np.array(cnt, dtype=np.int64),
    )


def _rand_multiset(rng, n, wmax=6):
    toks = rng.integers(1, 2**63, size=n).astype(np.uint64)
    w = rng.integers(1, wmax, size=n)
    return dict(zip(toks.tolist(), w.tolist()))


K = 1024


@pytest.mark.parametrize("overlap", [0.2, 0.5, 0.9])
def test_icws_estimator_within_bound(overlap):
    rng = np.random.default_rng(int(overlap * 100))
    a = _rand_multiset(rng, 300)
    keep = rng.random(300) < overlap
    items = list(a.items())
    b = {h: w for (h, w), k in zip(items, keep) if k}
    b.update(_rand_multiset(rng, 80))
    j = _exact_jw(a, b)
    seg, hh, cnt = _seg_input([a, b])
    sig = _icws_sig_matrix(seg, hh, cnt, K, seed=0x5EED)
    est = float((sig[0] == sig[1]).mean())
    sigma = (j * (1 - j) / K) ** 0.5
    assert abs(est - j) < 5 * sigma


def test_icws_weight_only_difference_detected():
    # identical support, tripled weights: set Jaccard = 1, weighted = 1/3
    rng = np.random.default_rng(3)
    a = _rand_multiset(rng, 200)
    b = {h: 3 * w for h, w in a.items()}
    j = _exact_jw(a, b)
    assert abs(j - 1 / 3) < 1e-9
    seg, hh, cnt = _seg_input([a, b])
    sig = _icws_sig_matrix(seg, hh, cnt, K, seed=0x5EED)
    est = float((sig[0] == sig[1]).mean())
    assert abs(est - j) < 5 * (j * (1 - j) / K) ** 0.5


def test_icws_identical_multisets_match_everywhere():
    rng = np.random.default_rng(11)
    a = _rand_multiset(rng, 150)
    seg, hh, cnt = _seg_input([a, a])
    sig = _icws_sig_matrix(seg, hh, cnt, 256, seed=0x5EED)
    assert (sig[0] == sig[1]).all()


def test_icws_batch_invariance():
    # a doc's signature must not depend on which other docs share the batch
    rng = np.random.default_rng(5)
    docs = [_rand_multiset(rng, 50 + 10 * i) for i in range(4)]
    seg, hh, cnt = _seg_input(docs)
    together = _icws_sig_matrix(seg, hh, cnt, 64, seed=0x5EED)
    for i, d in enumerate(docs):
        s1, h1, c1 = _seg_input([d])
        alone = _icws_sig_matrix(s1, h1, c1, 64, seed=0x5EED)
        assert (alone[0] == together[i]).all()


def test_doc_trigram_counts_shape():
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2, 3, 4], type=pa.int64()),
            pa.array(
                [
                    "a b c a b c a b c",  # trigrams with multiplicity
                    "x y",  # <3 tokens: dropped
                    "p q r s",
                    None,  # null text: dropped
                ]
            ),
        ],
        names=["id", "text"],
    )
    ids, seg, hh, cnt = _doc_trigram_counts(batch)
    assert ids.tolist() == [1, 3]
    # doc 1: windows abc abc abc + bca bca + cab cab → uniques {abc:3, bca:2, cab:2}
    d1 = cnt[seg[0] : seg[1]]
    assert sorted(d1.tolist()) == [2, 2, 3]
    # doc 3: p q r s → pqr, qrs (each once)
    d3 = cnt[seg[1] : seg[2]]
    assert d3.tolist() == [1, 1]


def test_wmh_signatures_estimate_weighted_jaccard(spark):
    base = "the cat sat on the mat " * 8  # repeated trigrams → weights > 1
    variant = "the cat sat on the mat " * 4 + "a dog ran in the park " * 4
    df = spark.createDataFrame(
        [(1, base), (2, variant)], ["doc_id", "text"]
    )
    sig = {
        r.id: r.sig
        for r in wmh_signatures_text(df, "doc_id", "text", num_hashes=512).collect()
    }
    est = float(np.mean(np.array(sig[1]) == np.array(sig[2])))
    wc = {
        (r.id, r.shingle): r.cnt
        for r in trigram_counts_df(df, "doc_id", "text").collect()
    }
    wa = {s: c for (i, s), c in wc.items() if i == 1}
    wb = {s: c for (i, s), c in wc.items() if i == 2}
    j = _exact_jw(wa, wb)
    assert abs(est - j) < 5 * (j * (1 - j) / 512) ** 0.5


def test_trigram_counts_multiset(spark):
    df = spark.createDataFrame([(1, "a b c a b c a b c")], ["doc_id", "text"])
    rows = {r.shingle: r.cnt for r in trigram_counts_df(df, "doc_id", "text").collect()}
    assert rows == {"a b c": 3, "b c a": 2, "c a b": 2}


def test_weighted_jaccard_pairs_exact(spark):
    docs = [
        (1, "a b c a b c a b c"),
        (2, "a b c a b c x y z"),
        (3, "p q r s t u"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    wc = trigram_counts_df(df, "doc_id", "text")
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["a", "b"])
    got = {(r.a, r.b): (r.inter, r.uni) for r in weighted_jaccard_pairs(wc, pairs).collect()}
    # doc1 = {abc:3, bca:2, cab:2} (t=7); doc2 = {abc:2, bca:1, cab:1, cxy:1, xyz:1} (t=6)
    # wait: doc2 trigrams: abc, bca, cab, bcx? recompute in python
    def tri(t):
        w = t.split()
        out = {}
        for i in range(len(w) - 2):
            k = " ".join(w[i : i + 3])
            out[k] = out.get(k, 0) + 1
        return out

    for a, b in [(1, 2), (1, 3)]:
        ta, tb = tri(docs[a - 1][1]), tri(docs[b - 1][1])
        inter = sum(min(ta.get(k, 0), tb.get(k, 0)) for k in set(ta) | set(tb))
        uni = sum(max(ta.get(k, 0), tb.get(k, 0)) for k in set(ta) | set(tb))
        assert got[(a, b)] == (inter, uni)


def test_neardup_pairs_wminhash_end_to_end(spark):
    # 30 base docs + truncated copies (high J_w) + weight-inflated copies
    rng = np.random.default_rng(42)
    vocab = [f"tok{i}" for i in range(400)]
    rows = []
    for d in range(30):
        words = [vocab[rng.integers(0, 400)] for _ in range(60)]
        rows.append((d, " ".join(words)))
        if d % 3 == 0:  # truncated copy: drop last 6 words → J_w ≈ 0.9
            rows.append((d + 1000, " ".join(words[:-6])))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.a, r.b)
        for r in neardup_pairs_wminhash(df, "doc_id", "text", threshold=0.5).collect()
    }
    # brute force: every (base, copy) pair must be found
    wc = trigram_counts_df(df, "doc_id", "text")
    ids = [r[0] for r in rows]
    import itertools

    all_pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(sorted(ids), 2)], ["a", "b"]
    )
    exact = {
        (r.a, r.b)
        for r in weighted_jaccard_pairs(wc, all_pairs).collect()
        if r.inter * 2 >= r.uni
    }
    assert exact, "fixture must plant at least one true pair"
    assert got == exact


def test_wmh_band_keys_schema_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t")],
        ["doc_id", "text"],
    )
    bk = wmh_band_keys(df, "doc_id", "text", num_hashes=32, bands=16)
    rows = bk.collect()
    assert bk.columns == ["id", "bk"]
    assert len(rows) == 3 * 16
    # identical docs → identical band keys; run twice → identical output
    k1 = sorted((r.id, r.bk) for r in rows)
    k2 = sorted((r.id, r.bk) for r in bk.collect())
    assert k1 == k2
    d1 = sorted(r.bk for r in rows if r.id == 1)
    d2 = sorted(r.bk for r in rows if r.id == 2)
    assert d1 == d2
