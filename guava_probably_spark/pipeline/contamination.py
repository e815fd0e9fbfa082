"""Eval-set decontamination: find benchmark rows leaked into training data.

The scale shape: the training corpus is huge (10^9-10^12 rows), the eval
set tiny (10^3-10^6).  A naive fingerprint join shuffles the training side;
here the training side is reduced to ONE Bloom filter blob (library
dogfood — the reference contract's `mightContain` in its natural pipeline
role, reference BloomFilter.java semantics):

  1. one scan of train → normalization fingerprints → `collect_sketch`
     Bloom (tree-merged partials, KB-MB blob, no raw-row shuffle);
  2. broadcast probe of eval: **zero false negatives** (the filter
     contract) means no leaked row can escape;
  3. exact verification of the flagged candidates only — a join whose left
     side is FP-rate·|eval| rows, so the output is EXACT (the sketch only
     prunes, it never decides).

The verification join still reads train once more; at fpp=1e-6 and a
10^6-row eval, expected false candidates ≈ 1 — alternatively skip
verification and accept fpp-rate overflagging (conservative direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from guava_probably_spark import SketchSpec
from guava_probably_spark.pipeline import textexpr


def _train_filter(train_keys: DataFrame, col: str, fpp: float, capacity: int | None):
    """ONE filter blob over the training-side key column.

    With a known ``capacity``: a plain Bloom sized to it.  With
    ``capacity=None``: a one-pass Scalable Bloom build (Almeida et al.
    2007, ``sketches/sbf.py``) — no separate ``count()`` job over the
    training corpus, which at 10^9+ rows is a whole extra scan.  The SBF
    fold over P partial builders weakens the compound bound to ≤ P × the
    per-partial design, so each partial is designed at ``fpp / P``; the
    post-fold :meth:`compact` collapses under-filled stages to keep the
    probe-side stage count down.  Zero false negatives either way.
    """
    from guava_probably_spark.operators import collect_sketch

    if capacity is not None:
        spec = SketchSpec("bloom", {"capacity": max(capacity, 1024), "fpp": fpp})
        sk, _, _ = collect_sketch(train_keys, col, spec)
        return sk
    parts = max(train_keys.rdd.getNumPartitions(), 1)
    spec = SketchSpec(
        "sbf",
        {
            "initial_capacity": 1 << 16,
            "fpp": max(fpp / parts, 1e-12),
            "growth": 8,
        },
    )
    sk, _, _ = collect_sketch(train_keys, col, spec)
    return sk.compact()


def flag_contaminated(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    fpp: float = 1e-6,
    capacity: int | None = None,
    verify: bool = True,
) -> DataFrame:
    """(id, leaked) for every eval row: leaked ⇔ its normalization
    fingerprint (case/whitespace/punctuation-insensitive) appears in train.

    Exact when ``verify=True`` (default); with ``verify=False`` the result
    may overflag at rate ≤ fpp but never underflags.

    ``capacity=None`` (default) builds the filter in ONE pass with a
    Scalable Bloom (no ``count()`` pre-scan of train — see
    :func:`_train_filter`); pass a capacity to get a classic fixed-size
    Bloom blob instead.
    """
    from guava_probably_spark.functions import might_contain_udf
    from guava_probably_spark.operators import collect_sketch

    spark = train.sparkSession
    fp_expr = textexpr.md5_fingerprint_expr(text_col, "spark")
    train_fp = train.select(F.expr(fp_expr).alias("fp"))
    sk = _train_filter(train_fp, "fp", fpp, capacity)
    probe = might_contain_udf(spark, sk.to_bytes())
    ev = eval_df.select(F.col(id_col).alias("id"), F.expr(fp_expr).alias("fp"))
    flagged = ev.withColumn("hit", probe(F.col("fp")))
    if not verify:
        return flagged.select("id", F.col("hit").alias("leaked"))
    candidates = flagged.filter(F.col("hit")).select("id", "fp")
    confirmed = candidates.join(train_fp.distinct(), "fp", "left_semi").select(
        "id", F.lit(True).alias("leaked")
    )
    return (
        flagged.select("id")
        .join(confirmed, "id", "left")
        .select("id", F.coalesce(F.col("leaked"), F.lit(False)).alias("leaked"))
    )


def _ngram_col(text_col: str, n: int):
    """Word n-grams of the normalized text as an array<string> column —
    lowercase, punctuation stripped, whitespace-split, n-token windows
    joined by single spaces. Pure JVM (lower/regexp/split/transform/slice):
    no Python touches the corpus."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]+", " ")
    toks = F.split(F.trim(F.regexp_replace(norm, r"\s+", " ")), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    # sequence(1, stop) DESCENDS when stop < 1, so gate on size >= n
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def ngram_overlap_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    threshold: float = 0.5,
    fpp: float = 1e-6,
    capacity: int | None = None,
) -> DataFrame:
    """N-gram-level decontamination (the GPT-3-appendix recipe): an eval doc
    is contaminated when ≥ ``threshold`` of its word ``n``-grams appear
    anywhere in the training corpus — catching partial leaks (a benchmark
    question embedded in a larger page) that whole-document fingerprints
    miss.

    Scale shape mirrors ``flag_contaminated``: the training side collapses
    to ONE filter blob over its exploded n-grams (tree-merged partials, no
    raw-row shuffle — explode is a projection; one-pass Scalable Bloom when
    ``capacity=None``, classic Bloom when given), then a broadcast probe of
    the eval n-grams and a per-doc aggregation. Zero false negatives by the
    filter contract, so no leaked n-gram escapes; false positives inflate
    ``overlap`` by ≤ fpp in expectation (conservative direction).

    Returns (id, ngrams, hits, overlap, contaminated); docs with fewer than
    n tokens have ngrams=0, overlap=0.0, contaminated=false.
    """
    from guava_probably_spark.functions import might_contain_udf

    spark = train.sparkSession
    train_ng = train.select(F.explode(_ngram_col(text_col, n)).alias("ng"))
    sk = _train_filter(train_ng, "ng", fpp, capacity)
    probe = might_contain_udf(spark, sk.to_bytes())
    ev = eval_df.select(
        F.col(id_col).alias("id"), F.explode_outer(_ngram_col(text_col, n)).alias("ng")
    )
    per_doc = (
        ev.withColumn("hit", F.when(F.col("ng").isNull(), None).otherwise(probe("ng")))
        .groupBy("id")
        .agg(
            F.count("ng").alias("ngrams"),
            F.coalesce(F.sum(F.col("hit").cast("long")), F.lit(0)).alias("hits"),
        )
        .select(
            "id",
            "ngrams",
            "hits",
            (F.col("hits") / F.greatest(F.col("ngrams"), F.lit(1))).alias("overlap"),
        )
    )
    return per_doc.withColumn(
        "contaminated",
        (F.col("ngrams") > 0) & (F.col("overlap") >= F.lit(float(threshold))),
    )
