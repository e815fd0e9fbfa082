"""Exact duplicated-span removal (pipeline/spandedup.py) vs a hash-free
local recompute of the same semantics (actual byte-content window counts —
catches both hash defects and span-merge logic defects)."""

import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from guava_probably_spark.pipeline.spandedup import (
    duplicate_spans,
    remove_duplicate_spans,
    window_hashes,
)


def _local_remove(texts: dict, L: int) -> dict:
    """Reference implementation on real byte content (no hashing)."""
    occ = defaultdict(list)
    for i in sorted(k for k in texts if texts[k] is not None):
        b = texts[i].encode("utf-8")
        for p in range(len(b) - L + 1):
            occ[b[p : p + L]].append((i, p))
    marked = defaultdict(list)
    for lst in occ.values():
        for i, p in lst[1:]:  # every occurrence except the smallest (id, pos)
            marked[i].append(p)
    out = {}
    for i, t in texts.items():
        if t is None:
            out[i] = (None, 0)
            continue
        b = t.encode("utf-8")
        # islands: new span when p > last_marked_pos + L
        spans = []
        last = None
        for p in sorted(marked.get(i, ())):
            if last is not None and p <= last + L:
                spans[-1][1] = p + L
            else:
                spans.append([p, p + L])
            last = p
        keep, prev = [], 0
        for s, e in spans:
            keep.append(b[prev:s])
            prev = e
        keep.append(b[prev:])
        cut = b"".join(keep)
        out[i] = (cut.decode("utf-8"), len(b) - len(cut))
    return out


def _run(spark, texts: dict, L: int):
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    got = {
        r.id: (r.text, r.removed_bytes)
        for r in remove_duplicate_spans(df, "doc_id", "text", L).collect()
    }
    return got


def _rand_corpus(n=30, seed=3):
    rng = random.Random(seed)
    words = [f"w{j}" for j in range(400)]
    return {
        i: " ".join(rng.choice(words) for _ in range(80)) for i in range(n)
    }


def test_planted_passage_removed_except_canonical(spark):
    passage = "the exact same sixty byte passage planted verbatim here!!!"
    assert len(passage) >= 50
    texts = _rand_corpus()
    for i in (3, 7, 12):
        texts[i] = texts[i][:100] + passage + texts[i][100:]
    got = _run(spark, texts, 50)
    want = _local_remove(texts, 50)
    assert got == want
    # canonical doc keeps the passage, later docs lose it
    assert passage in got[3][0]
    assert passage not in got[7][0] and passage not in got[12][0]
    assert got[7][1] > 0 and got[12][1] > 0
    # untouched docs pass through byte-identical
    for i in set(texts) - {3, 7, 12}:
        if got[i][1] == 0:
            assert got[i][0] == texts[i]


def test_whole_doc_duplicate_and_self_repeat(spark):
    unique = " ".join(f"tok{j}" for j in range(40))  # no internal repeats
    texts = {
        1: "x " * 200,   # self-overlapping repeat
        2: unique,
        3: unique,       # whole-doc dup of 2
        4: None,
        5: "short",
    }
    got = _run(spark, texts, 50)
    want = _local_remove(texts, 50)
    assert got == want
    assert got[2] == (unique, 0)              # canonical copy untouched
    assert got[3][1] > 0                      # duplicate copy gutted
    assert got[1][1] > 0                      # self-repeat collapses
    assert got[4] == (None, 0) and got[5] == ("short", 0)


def test_random_corpus_parity_and_no_dup_passthrough(spark):
    texts = _rand_corpus(n=25, seed=11)
    got = _run(spark, texts, 50)
    want = _local_remove(texts, 50)
    assert got == want


def test_parity_on_sf_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = {
        r.id: (r.text, r.removed_bytes)
        for r in remove_duplicate_spans(docs, "doc_id", "text", 40).collect()
    }
    want = _local_remove(texts, 40)
    assert got == want
    assert sum(rm for _, rm in got.values()) > 0  # token-soup corpus has dups


def test_spans_and_hashes_shapes(spark):
    # non-repetitive 30-byte shared prefix (every internal 20-gram unique)
    prefix = "qwertyuiopasdfghjklzxcvbnm0123"
    texts = {1: prefix + "Xunique ending one!", 2: prefix + "Yother tail here!!!"}
    df = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")
    wh = window_hashes(df, "doc_id", "text", 20)
    # doc of length 49 has 30 windows of 20 bytes
    assert {r["count"] for r in wh.groupBy("id").count().collect()} == {30}
    spans = {
        (r.id, r.start, r.end) for r in duplicate_spans(df, "doc_id", "text", 20).collect()
    }
    # doc 2's prefix windows [0..10] are non-canonical (doc 1 owns them),
    # merging to exactly one span [0, 30); doc 1 keeps everything
    assert spans == {(2, 0, 30)}


def test_repartition_invariant_and_guard(spark):
    texts = _rand_corpus(n=15, seed=5)
    texts[1] = texts[2]  # one planted whole-doc dup
    df = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")
    a = {
        r.id: (r.text, r.removed_bytes)
        for r in remove_duplicate_spans(df, "doc_id", "text", 50).collect()
    }
    b = {
        r.id: (r.text, r.removed_bytes)
        for r in remove_duplicate_spans(df.repartition(7), "doc_id", "text", 50).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        window_hashes(df, "doc_id", "text", 1)


def test_multibyte_boundary_widen(spark):
    # duplicated span ending mid-character: the cut must never split UTF-8
    base = "é" * 40  # 2-byte chars: 80 bytes
    texts = {1: base + " unique tail one", 2: base + " unique tail two"}
    got = _run(spark, texts, 50)
    for i in (1, 2):
        assert got[i][0] is not None  # decodable ⇒ no split chars
    assert got[2][1] > 0 and got[1][1] >= 0


def test_id_out_of_packing_range_raises(spark):
    # (id, pos) packs into one long downstream; ids >= 2^43 (or < 0) would
    # silently corrupt the canonical order, so the scan raises instead
    df = spark.createDataFrame(
        [(1 << 43, "x" * 80), (-1, "y" * 80)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="re-key"):
        window_hashes(df, "doc_id", "text", 50).collect()
