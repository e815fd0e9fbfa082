"""DSIR importance resampling (Xie et al. 2023): exact bucket counts vs
the DuckDB oracle, fixed-point weight parity vs a local recompute,
partition-invariant integer sums, deterministic Gumbel top-k."""

import hashlib
import math
from collections import Counter

import duckdb
import numpy as np
import pytest

from guava_probably_spark.pipeline.dsir import (
    _LAM_SCALE,
    dsir_bucket_counts,
    dsir_counts_sql_duck,
    dsir_lambda,
    dsir_logweights,
    dsir_select,
)

B = 257  # prime, small enough that every test bucket sees traffic


def _norm_words(text):
    return " ".join((text or "").lower().split()).split(" ")


def _grams(text):
    w = _norm_words(text)
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _bucket(gram, salt="dsir", buckets=B):
    # mirrors textexpr.sample_rank_expr: md5(concat_ws(SAMPLE_SEP, key, salt))
    key = f"{gram}\x01{salt}" if salt else gram
    h = hashlib.md5(key.encode()).hexdigest()
    return int(h[:15], 16) % buckets


_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "quantum flux capacitor resonance cascade"),
    (3, "the dog sat on the log by the fire"),
    (4, "flux cascade quantum resonance capacitor flux"),
    (5, ""),
    (6, None),
    (7, "the the the the the"),
    (8, "one two three four five six seven"),
]
_TARGET = [
    (101, "the cat sat by the fire"),
    (102, "the dog and the cat sat on the mat"),
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(_DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame(_TARGET, "doc_id long, text string")
    return raw, tgt


def test_bucket_counts_match_duckdb_and_local(frames, tmp_path):
    raw, _ = frames
    got = {
        r.bucket: r.c
        for r in dsir_bucket_counts(raw, "text", B, hash="md5").collect()
    }
    p = str(tmp_path / "dsir_docs.parquet")
    raw.coalesce(1).write.mode("overwrite").parquet(p)
    want = dict(
        duckdb.sql(
            dsir_counts_sql_duck(f"read_parquet('{p}/*.parquet')", "text", B)
        ).fetchall()
    )
    assert got == want
    local = Counter()
    for _, text in _DOCS:
        for g in _grams(text):
            local[_bucket(g)] += 1
    assert got == dict(local)


def test_logweights_match_local_recompute_exactly(frames):
    raw, tgt = frames
    tc = np.zeros(B, np.int64)
    rc = np.zeros(B, np.int64)
    for _, text in _TARGET:
        for g in _grams(text):
            tc[_bucket(g)] += 1
    for _, text in _DOCS:
        for g in _grams(text):
            rc[_bucket(g)] += 1
    lam_scaled = np.rint(dsir_lambda(tc, rc) * _LAM_SCALE).astype(np.int64)
    rows = {
        r.id: r
        for r in dsir_logweights(
            raw, tgt, "doc_id", "text", B, hash="md5"
        ).collect()
    }
    assert set(rows) == {d for d, _ in _DOCS}
    for doc_id, text in _DOCS:
        grams = _grams(text)
        want = int(sum(int(lam_scaled[_bucket(g)]) for g in grams))
        assert rows[doc_id].lw_scaled == want, doc_id
        assert rows[doc_id].n_grams == len(grams)
        assert rows[doc_id].logweight == pytest.approx(want / _LAM_SCALE)


def test_lw_scaled_partition_invariant(frames):
    raw, tgt = frames
    a = {
        r.id: r.lw_scaled
        for r in dsir_logweights(
            raw.repartition(1), tgt, "doc_id", "text", B
        ).collect()
    }
    b = {
        r.id: r.lw_scaled
        for r in dsir_logweights(
            raw.repartition(7, "text"), tgt, "doc_id", "text", B
        ).collect()
    }
    assert a == b


def test_select_deterministic_and_weight_monotone(frames):
    raw, tgt = frames
    s1 = [r.id for r in dsir_select(raw, tgt, "doc_id", "text", 3, B, seed=7).collect()]
    s2 = [r.id for r in dsir_select(raw, tgt, "doc_id", "text", 3, B, seed=7).collect()]
    assert s1 == s2 and len(s1) == 3
    # a different seed is allowed to (and here does not have to) differ,
    # but must still be deterministic
    s3 = [r.id for r in dsir_select(raw, tgt, "doc_id", "text", 3, B, seed=8).collect()]
    assert len(s3) == 3
    # temperature -> 0 degenerates to exact top-k by logweight: the noise
    # term is O(1) while logweight/T explodes
    w = {r.id: r.lw_scaled for r in dsir_logweights(raw, tgt, "doc_id", "text", B).collect()}
    top = sorted(w, key=lambda i: (-w[i], i))[:3]
    sel = [
        r.id
        for r in dsir_select(
            raw, tgt, "doc_id", "text", 3, B, temperature=1e-9
        ).collect()
    ]
    assert sorted(sel) == sorted(top)
    # weight ordering between equal-length docs tracks target overlap:
    # docs 1 and 4 both emit 11 grams; doc 1 shares the target's
    # vocabulary ("the cat sat ... the mat"), doc 4 is disjoint jargon.
    # (Across different lengths the raw bag sum is length-biased — mostly
    # negative lambdas make short docs outrank long ones — which is why
    # the op exposes n_grams for callers who length-normalize.)
    assert w[1] > w[4]


def test_gumbel_sampling_tracks_weights_statistically(frames):
    """Over many seeds, P(select) must increase with weight: the highest-
    weight doc is selected at least as often as the lowest-weight one."""
    raw, tgt = frames
    w = {r.id: r.lw_scaled for r in dsir_logweights(raw, tgt, "doc_id", "text", B).collect()}
    hi = max(w, key=lambda i: w[i])
    lo = min(w, key=lambda i: w[i])
    hi_n = lo_n = 0
    for seed in range(10):
        sel = {
            r.id
            for r in dsir_select(raw, tgt, "doc_id", "text", 3, B, seed=seed).collect()
        }
        hi_n += hi in sel
        lo_n += lo in sel
    assert hi_n > lo_n


def test_lambda_shape_guard():
    with pytest.raises(ValueError):
        dsir_lambda(np.zeros(4), np.zeros(5))


def test_select_arg_guards(frames):
    raw, tgt = frames
    with pytest.raises(ValueError):
        dsir_select(raw, tgt, "doc_id", "text", 0, B)
    with pytest.raises(ValueError):
        dsir_select(raw, tgt, "doc_id", "text", 1, B, temperature=0.0)
