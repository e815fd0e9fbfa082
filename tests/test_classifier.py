"""Distributed hashed-feature logistic regression (pipeline/classifier.py)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from guava_probably_spark.pipeline.classifier import (
    _pack_partial,
    _unpack_partial,
    featurize,
    logreg_fit,
    logreg_score,
    quality_classifier_scores,
)

DIM = 1 << 12

GOOD = ["science", "method", "result", "analysis", "theory", "data", "model", "study"]
BAD = ["buy", "cheap", "click", "winner", "free", "pills", "casino", "offer"]


def _corpus(spark, n=1_200, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = i % 2
        vocab = GOOD if y else BAD
        mix = [rng.choice(vocab) for _ in range(30)] + [
            rng.choice(GOOD + BAD) for _ in range(10)
        ]
        rows.append((i, " ".join(mix), float(y)))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_classifier_separates_planted_quality(spark):
    df = _corpus(spark)
    feats = featurize(df, "doc_id", "text", DIM, label_col="label").localCheckpoint()
    w, info = logreg_fit(feats, DIM, iters=30, lr=2.0)
    # convex full-batch GD: loss strictly decreases, accuracy reaches 1
    losses = [h["loss"] for h in info["history"]]
    assert all(b < a for a, b in zip(losses, losses[1:]))
    assert info["history"][-1]["accuracy"] == 1.0
    joined = logreg_score(feats, w).join(
        df.select(F.col("doc_id").alias("id"), "label"), "id"
    )
    acc = joined.select(
        F.avg(((F.col("score") > 0.5).cast("double") == F.col("label")).cast("double"))
    ).collect()[0][0]
    assert acc == 1.0


def test_logreg_matches_local_numpy_recompute(spark):
    """The distributed GD equals the same algorithm run single-process on
    the collected feature table — partial-sum order only moves float64
    ulps, so weights agree to ~1e-10 relative."""
    df = _corpus(spark, n=400)
    feats = featurize(df, "doc_id", "text", DIM, label_col="label").localCheckpoint()
    iters, lr, l2 = 12, 2.0, 1e-4
    w, _ = logreg_fit(feats, DIM, iters=iters, lr=lr, l2=l2)

    pdf = feats.orderBy("id").toPandas()
    y = pdf["label"].to_numpy()
    wl = np.zeros(DIM + 1)
    for _ in range(iters):
        grad = np.zeros(DIM + 1)
        for yi, bks, cts in zip(y, pdf["buckets"], pdf["counts"]):
            bks = np.asarray(bks, dtype=np.int64)
            cts = np.asarray(cts, dtype=np.float64)
            x = cts / cts.sum() if len(cts) else cts
            m = float(x @ wl[bks] + wl[-1]) if len(bks) else float(wl[-1])
            r = 1.0 / (1.0 + np.exp(-m)) - yi
            np.add.at(grad, bks, r * x)
            grad[-1] += r
        reg = l2 * wl
        reg[-1] = 0.0
        wl = wl - lr * (grad / len(y) + reg)
    np.testing.assert_allclose(w, wl, rtol=1e-9, atol=1e-12)


def test_scores_partition_invariant(spark):
    df = _corpus(spark, n=400)
    feats = featurize(df, "doc_id", "text", DIM, label_col="label").localCheckpoint()
    w, _ = logreg_fit(feats, DIM, iters=5)
    a = {r.id: r.score for r in logreg_score(feats, w).collect()}
    b = {r.id: r.score for r in logreg_score(feats.repartition(13), w).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_featurize_edge_rows_and_score_bias(spark):
    df = spark.createDataFrame(
        [(1, None, 1.0), (2, "", 0.0), (3, "   ", 1.0), (4, "science data", 1.0)],
        "doc_id long, text string, label double",
    )
    feats = featurize(df, "doc_id", "text", DIM, label_col="label")
    rows = {r.id: (list(r.buckets), list(r.counts)) for r in feats.collect()}
    assert set(rows) == {1, 2, 3, 4}
    for i in (1, 2, 3):
        assert rows[i] == ([], [])
    assert len(rows[4][0]) == 2 and rows[4][1] == [1, 1]
    w = np.zeros(DIM + 1)
    w[-1] = 1.25  # bias only: tokenless docs must score sigmoid(bias)
    got = {r.id: r.score for r in logreg_score(feats, w).collect()}
    expected = 1.0 / (1.0 + np.exp(-1.25))
    for i in (1, 2, 3):
        assert abs(got[i] - expected) < 1e-12


def test_partial_label_training_scores_everything(spark):
    df = _corpus(spark, n=300).withColumn(
        "label", F.when(F.col("doc_id") % 3 == 0, F.col("label"))
    )
    scores, w, info = quality_classifier_scores(
        df, "doc_id", "text", "label", dim=DIM, iters=15
    )
    assert scores.count() == 300
    assert info["n"] == 100  # only labeled rows trained
    assert info["history"][-1]["accuracy"] == 1.0


def test_classifier_guards():
    with pytest.raises(ValueError):
        _unpack_partial(b"junkjunkjunkjunkjunk")
    blob = _pack_partial(np.zeros(5), 0.0, 0.0, 1)
    g, l, c, n = _unpack_partial(blob)
    assert len(g) == 5 and n == 1
    with pytest.raises(ValueError):
        _unpack_partial(blob[:-1])


def test_classifier_dim_and_empty_guards(spark):
    df = spark.createDataFrame([(1, "x", 1.0)], "doc_id long, text string, label double")
    with pytest.raises(ValueError):
        featurize(df, "doc_id", "text", 1, label_col="label")
    feats = featurize(df.filter("doc_id < 0"), "doc_id", "text", DIM, label_col="label")
    with pytest.raises(ValueError):
        logreg_fit(feats, DIM, iters=1)
