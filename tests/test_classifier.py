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


def _local_buckets(rows, cuts, labels):
    """Reference: exact nearest-rank thresholds + first-cut-<= labeling."""
    import collections
    import math

    by_key = collections.defaultdict(list)
    for k, v in rows:
        if v is not None:
            by_key[k].append(float(v))
    th = {}
    for k, vs in by_key.items():
        vs.sort()
        n = len(vs)
        th[k] = [vs[min(max(math.ceil(c * n) - 1, 0), n - 1)] for c in cuts]
    out = {}
    for i, (k, v) in enumerate(rows):
        if v is None:
            out[i] = None
            continue
        lab = labels[-1]
        for c, candidate in zip(th[k], labels[:-1]):
            if float(v) <= c:
                lab = candidate
                break
        out[i] = lab
    return out


def test_ccnet_buckets_matches_local_recompute(spark):
    from guava_probably_spark.pipeline.classifier import ccnet_buckets

    rng = random.Random(11)
    # heavy ties (integer lengths) + a null + tiny group + singleton group
    rows = [(f"lang{i % 3}", rng.randint(10, 60)) for i in range(400)]
    rows += [("lang0", None), ("tiny", 5), ("tiny", 7), ("solo", 42)]
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "rid long, lang string, x long"
    )
    cuts = (1.0 / 3.0, 2.0 / 3.0)
    labels = ("head", "middle", "tail")
    got = {
        r.rid: r.bucket
        for r in ccnet_buckets(df, "lang", "x", cuts, labels).collect()
    }
    want = _local_buckets(rows, cuts, labels)
    assert got == want
    # every prefix bucket is ~a third of its group (ties distort, never cross)
    sizes = {}
    for i, (k, v) in enumerate(rows):
        if v is None or k != "lang0":
            continue
        sizes[got[i]] = sizes.get(got[i], 0) + 1
    n0 = sum(sizes.values())
    assert sizes["head"] >= n0 // 3  # <= ties push the boundary outward only


def test_ccnet_buckets_kll_and_higher_is_better(spark):
    from guava_probably_spark.pipeline.classifier import ccnet_buckets

    # widely separated values: the KLL edge error cannot cross clusters, so
    # the sketch path must agree exactly with the exact path
    rows = [(i, "en", float(v)) for i, v in enumerate([1] * 30 + [100] * 30 + [10000] * 30)]
    df = spark.createDataFrame(rows, "rid long, lang string, score double")
    labels = ("tail", "middle", "head")  # higher-is-better ordering
    exact = {
        r.rid: r.bucket for r in ccnet_buckets(df, "lang", "score", labels=labels).collect()
    }
    kll = {
        r.rid: r.bucket
        for r in ccnet_buckets(df, "lang", "score", labels=labels, method="kll").collect()
    }
    assert exact == kll
    assert exact[0] == "tail" and exact[89] == "head"


def test_ccnet_buckets_guards(spark):
    from guava_probably_spark.pipeline.classifier import ccnet_buckets

    df = spark.createDataFrame([(1, "en", 1.0)], "rid long, lang string, x double")
    with pytest.raises(ValueError, match="labels"):
        ccnet_buckets(df, "lang", "x", cuts=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="ascending"):
        ccnet_buckets(df, "lang", "x", cuts=(0.9, 0.1), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="collide"):
        ccnet_buckets(df, "lang", "x", cuts=(0.501, 0.502), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="method"):
        ccnet_buckets(df, "lang", "x", method="nope")
