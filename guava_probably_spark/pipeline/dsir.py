"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed n-gram features, Spark-first.

Selects raw-corpus documents whose hashed bag-of-ngrams distribution
looks like a (small) target corpus: fit two bag-of-buckets models,
weight every raw doc by the log-likelihood ratio, then draw k docs
without replacement via Gumbel top-k.

Plan shape (scales to an unbounded corpus — bounded state throughout):

1. **fit** — one scan per corpus: explode word unigrams+bigrams
   (``pyspark.ml.feature.NGram``, compiled Scala — HOF-lambda gram
   assembly is interpreted per element and measured 18x slower), bucket
   each gram (``hash="xxh64"`` default: whole-stage-codegen
   ``xxhash64``, ~4x faster end-to-end; ``hash="md5"``: the
   dual-dialect :func:`textexpr.hash_u60_expr`, bit-identical in
   DuckDB, so the count model is EXACTLY oracle-checkable), then
   ``groupBy(bucket)``: map-side combine caps the shuffle at
   ``buckets`` rows per partition and the driver collect at
   ``buckets`` rows total (80 KB at the paper's 10k buckets) — never
   corpus-sized state. The raw gram frame is pinned once
   (``localCheckpoint``) and reused by the scored pass.
2. **weight** — the per-bucket log-ratio vector is quantized to Q.32
   fixed point and shipped as a broadcast ``(bucket, lam)`` dim table;
   one more raw scan explodes grams, broadcast-joins the 10k-row table
   (no shuffle of gram rows) and sums per doc with map-side combine
   (shuffle ~= one row per doc). Integer sums make ``lw_scaled``
   **byte-identical under any partitioning** — the HLL/CMS determinism
   class — where a float sum would drift in the last ulp with the
   add order.
3. **select** — per-doc Gumbel noise derived from the same md5 hash of
   (id, seed): ``u = (h + 0.5) / 2^60``, ``g = -ln(-ln u)``; rank on
   ``logweight/temperature + g`` (ties broken by id) and take k via
   ``TakeOrderedAndProject`` (per-partition heaps, no global sort).

Smoothing is add-one over buckets: ``p_b = (c_b + 1) / (N + B)`` —
every quantity integer until the final log, so the fitted model is
reproducible from the oracle-checked counts alone.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from guava_probably_spark.pipeline import textexpr

# Q.32 fixed point for the per-bucket log-ratio. Overflow headroom:
# |lambda| <= 2*log(N+B) < 2*log(2^63) < 88 < 2^7, so |lam_scaled| < 2^39;
# a doc holds < 2^23 grams, so the per-doc int64 sum stays below
# 2^(39+23) = 2^62 < 2^63 — no wrap even in the worst case. (A 2^40 scale
# would put the same worst case at 2^70 and overflow the ANSI-mode sum.)
# Precision 2^-32 ~ 2.3e-10 per gram is far below any meaningful weight
# difference.
_LAM_SCALE = 1 << 32


def _gram_df(df: DataFrame, id_col: str | None, text_col: str) -> DataFrame:
    """(id?, gram) — word unigrams + space-joined bigrams, one per row."""
    from pyspark.ml.feature import NGram

    txt = f"coalesce({text_col}, '')"
    cols = [F.expr(textexpr.words_expr(txt, "spark")).alias("_w")]
    if id_col is not None:
        cols.insert(0, F.col(id_col).cast("long").alias("id"))
    base = NGram(n=2, inputCol="_w", outputCol="_b").transform(df.select(*cols))
    out = base.select(
        *(["id"] if id_col is not None else []),
        F.explode(F.concat(F.col("_w"), F.col("_b"))).alias("gram"),
    )
    return out


def _bucket_col(buckets: int, salt: str, hash: str) -> F.Column:
    """Gram → bucket. ``xxh64`` (default) stays in whole-stage codegen —
    measured ~4x the md5 path end-to-end at 400k docs; ``md5`` is the
    dual-dialect :func:`textexpr.hash_u60_expr` so counts are exactly
    DuckDB-checkable. Both are deterministic; every downstream guarantee
    (byte-identical ``lw_scaled``, seeded selection) holds for either."""
    if hash == "xxh64":
        return F.pmod(F.xxhash64(F.lit(salt), "gram"), F.lit(buckets))
    if hash == "md5":
        return F.expr(textexpr.hash_u60_expr(["gram"], "spark", salt)) % F.lit(buckets)
    raise ValueError(f"unknown hash {hash!r} (want 'xxh64' or 'md5')")


def dsir_bucket_counts(
    df: DataFrame,
    text_col: str,
    buckets: int = 10_000,
    salt: str = "dsir",
    hash: str = "xxh64",
) -> DataFrame:
    """(bucket, c) hashed-ngram counts. At most ``buckets`` output rows.
    With ``hash="md5"`` the counts are exactly DuckDB-checkable
    (:func:`dsir_counts_sql_duck`)."""
    return (
        _gram_df(df, None, text_col)
        .select(_bucket_col(buckets, salt, hash).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_counts_sql_duck(
    table: str, text_col: str, buckets: int = 10_000, salt: str = "dsir"
) -> str:
    """DuckDB oracle for :func:`dsir_bucket_counts` — same normalization,
    same unigram+bigram set, same md5 bucket hash."""
    txt = f"coalesce({text_col}, '')"
    words = textexpr.words_expr(txt, "duck")
    h = textexpr.hash_u60_expr(["gram"], "duck", salt)
    return (
        f"WITH w AS (SELECT {words} AS words FROM {table}), "
        "g AS (SELECT unnest(words) AS gram FROM w "
        "UNION ALL "
        "SELECT unnest(list_transform(generate_series(1, len(words) - 1), "
        "i -> words[i] || ' ' || words[i+1])) AS gram FROM w) "
        f"SELECT {h} % {buckets} AS bucket, count(*) AS c "
        "FROM g GROUP BY 1"
    )


def dsir_lambda(
    target_counts: np.ndarray, raw_counts: np.ndarray
) -> np.ndarray:
    """Per-bucket log-likelihood ratio under add-one smoothing (float64).

    lambda_b = log((ct_b+1)/(Nt+B)) - log((cr_b+1)/(Nr+B)).
    """
    t = np.asarray(target_counts, dtype=np.float64)
    r = np.asarray(raw_counts, dtype=np.float64)
    if t.shape != r.shape:
        raise ValueError(f"bucket count shapes differ: {t.shape} vs {r.shape}")
    b = t.shape[0]
    return (np.log(t + 1.0) - math.log(t.sum() + b)) - (
        np.log(r + 1.0) - math.log(r.sum() + b)
    )


def _vec_from_counts(rows, buckets: int) -> np.ndarray:
    vec = np.zeros(buckets, dtype=np.int64)
    for row in rows:
        vec[int(row["bucket"])] = int(row["c"])
    return vec


def dsir_logweights(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 10_000,
    salt: str = "dsir",
    hash: str = "xxh64",
    materialize: bool | None = None,
) -> DataFrame:
    """(id, n_grams, lw_scaled, logweight) importance weights per raw doc.

    ``lw_scaled`` (Q.32 int64) is byte-identical under any partitioning
    or AQE plan; ``logweight = lw_scaled / 2^32`` is the float view.
    Driver state: two ``buckets``-sized count vectors + the lambda table.
    Every doc emits a row (``split`` yields at least one token).

    The raw (id, bucket) gram frame feeds BOTH the count fit and the
    scored pass; Spark does not reuse exchanges across those subtrees, so
    by default it is pinned once with ``localCheckpoint`` (16 B/gram —
    bounded; ``materialize`` follows :mod:`guava_probably_spark.config`
    semantics for preemptible-executor deployments).
    """
    from guava_probably_spark.config import pin_default

    spark: SparkSession = raw_df.sparkSession
    grams = _gram_df(raw_df, id_col, text_col).select(
        "id", _bucket_col(buckets, salt, hash).alias("bucket")
    )
    if pin_default(materialize):
        grams = grams.localCheckpoint()
    raw_counts = _vec_from_counts(
        grams.groupBy("bucket").agg(F.count("*").alias("c")).collect(), buckets
    )
    target_counts = _vec_from_counts(
        dsir_bucket_counts(target_df, text_col, buckets, salt, hash).collect(),
        buckets,
    )
    lam_scaled = np.rint(
        dsir_lambda(target_counts, raw_counts) * _LAM_SCALE
    ).astype(np.int64)
    lam_df = spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(lam_scaled)],
        "bucket long, lam long",
    )
    return (
        grams.join(F.broadcast(lam_df), "bucket")
        .groupBy("id")
        .agg(F.count("*").alias("n_grams"), F.sum("lam").alias("lw_scaled"))
        .withColumn("logweight", F.col("lw_scaled") / F.lit(float(_LAM_SCALE)))
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    buckets: int = 10_000,
    temperature: float = 1.0,
    seed: int = 42,
    salt: str = "dsir",
    hash: str = "xxh64",
    materialize: bool | None = None,
) -> DataFrame:
    """Gumbel top-k importance resampling: k raw docs, sampled without
    replacement with probability proportional to ``w^(1/temperature)``.

    Deterministic for a fixed seed: the Gumbel noise is a pure function
    of (id, seed) via the same dual-dialect md5 hash, and the integer
    ``lw_scaled`` sum is partition-invariant, so the selected SET is
    reproducible run to run. Returns (id, n_grams, lw_scaled, logweight,
    score), score-descending — ``lw_scaled`` is kept because it is the
    determinism-bearing exact value.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    w = dsir_logweights(
        raw_df, target_df, id_col, text_col, buckets, salt, hash, materialize
    )
    u60 = F.expr(
        textexpr.hash_u60_expr(["id"], "spark", salt=f"gumbel{seed}")
    ).cast("double")
    u = (u60 + F.lit(0.5)) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    return (
        w.withColumn("score", F.col("logweight") / F.lit(float(temperature)) + gumbel)
        .orderBy(F.desc("score"), "id")
        .limit(k)
    )
