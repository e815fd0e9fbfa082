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


def _train_filter(
    train_keys: DataFrame,
    col: str,
    fpp: float,
    capacity: int | None,
    funnel: int | None = None,
):
    """ONE filter blob over the training-side key column.

    With a known ``capacity``: a plain Bloom sized to it — ONE bit array,
    ONE probe per element, the cheapest shape.  Both decontamination
    operators obtain that capacity essentially for free (a parquet
    ``count(*)`` is row-group metadata; the n-gram count is one codegen
    arithmetic aggregate over token counts), so this is the default.

    With ``capacity=None``: a one-pass Scalable Bloom build (Almeida et
    al. 2007, ``sketches/sbf.py``) for inputs whose cardinality genuinely
    cannot be pre-computed (an accumulating stream, a source behind an
    expensive transform).  The SBF fold over P partial builders weakens
    the compound bound to ≤ P × the per-partial design, so each partial is
    designed at ``fpp / P``; the post-fold :meth:`compact` collapses
    under-filled stages.  The price is a multi-stage filter: ~1.5× the
    bits and a probe that touches every stage on a miss — measured ~3× the
    single-bloom build+probe cost at 38M keys.  Zero FN either way.
    """
    from guava_probably_spark.operators import collect_sketch

    extra = {} if funnel is None else {"funnel": funnel}
    if capacity is not None:
        spec = SketchSpec(
            "bloom", {"capacity": max(capacity, 1024), "fpp": fpp, **extra}
        )
        sk, _, _ = collect_sketch(train_keys, col, spec)
        return sk
    parts = max(train_keys.rdd.getNumPartitions(), 1)
    spec = SketchSpec(
        "sbf",
        {
            "initial_capacity": 1 << 16,
            "fpp": max(fpp / parts, 1e-12),
            "growth": 8,
            **extra,
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
    scalable: bool = False,
    direction: str = "train",
) -> DataFrame:
    """(id, leaked) for every eval row: leaked ⇔ its normalization
    fingerprint (case/whitespace/punctuation-insensitive) appears in train.

    Exact when ``verify=True`` (default); with ``verify=False`` the result
    may overflag at rate ≤ fpp but never underflags.

    ``capacity=None`` (default) sizes the Bloom from ``train.count()`` —
    a parquet row-group-metadata operation, not a data scan.  Pass
    ``scalable=True`` for sources where even the row count is expensive
    (an accumulating stream): a one-pass Scalable Bloom build instead
    (see :func:`_train_filter` for the trade).

    ``direction`` picks which side carries the filter:

    - ``"train"`` (default): the filter summarizes TRAIN — right when the
      train blob fits a broadcast (≤ ~10^9 docs) and especially when it is
      REUSED across many eval sets or micro-batches (build once, probe
      forever; the streaming dedup state works the same way).
    - ``"eval"``: the filter summarizes the EVAL fingerprints (tiny by
      contract), train is scanned ONCE with in-scan probe pruning, and the
      surviving fingerprint set joins back — EXACT regardless of
      ``verify``, with no train-sized state anywhere.  The only shape that
      works at 10^12 train docs, where a train-side bloom is terabytes.
    """
    from guava_probably_spark.functions import might_contain_udf
    from guava_probably_spark.operators import collect_sketch

    spark = train.sparkSession
    fp_expr = textexpr.md5_fingerprint_expr(text_col, "spark")
    train_fp = train.select(F.expr(fp_expr).alias("fp"))
    if direction == "eval":
        ev = eval_df.select(F.col(id_col).alias("id"), F.expr(fp_expr).alias("fp"))
        ev_keys = ev.select("fp").distinct()
        sk = _train_filter(ev_keys, "fp", fpp, max(ev_keys.count(), 1))
        probe = might_contain_udf(spark, sk.to_bytes())
        leaked = (
            train_fp.filter(probe(F.col("fp")))
            .select(F.col("fp").alias("_leaked_fp"))
            .distinct()
        )
        return (
            ev.join(F.broadcast(leaked), ev["fp"] == F.col("_leaked_fp"), "left")
            .select("id", F.col("_leaked_fp").isNotNull().alias("leaked"))
        )
    if direction != "train":
        raise ValueError(f"direction must be 'train' or 'eval', got {direction!r}")
    if capacity is None and not scalable:
        capacity = train.count()  # metadata-only for columnar sources
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


def _ngrams_df(df: DataFrame, text_col: str, n: int, keep: tuple = (), outer: bool = False):
    """One row per word n-gram: (keep..., ng string) — the SCALE path.

    Same normalization and the same space-joined gram strings as
    :func:`_ngram_col`, but gram assembly runs in ``pyspark.ml.feature.
    NGram`` (compiled Scala over the token array) instead of a
    ``transform``/``slice``/``array_join`` higher-order expression —
    Catalyst interprets HOF lambdas per element, and at 38M 13-grams the
    interpreted path measured 143 s where NGram + explode measures ~8 s
    warm.  ``_ngram_col`` stays as the pure-expression form (small inputs,
    oracle parity); a test pins the two to identical gram lists.
    """
    from pyspark.ml.feature import NGram

    norm = F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[^\p{L}\p{N}\s]+", " "
    )
    toks = F.split(F.trim(F.regexp_replace(norm, r"\s+", " ")), " ")
    tok_df = df.select(*[F.col(c) for c in keep], toks.alias("_toks"))
    grams = NGram(n=n, inputCol="_toks", outputCol="_grams").transform(tok_df)
    ex = F.explode_outer if outer else F.explode
    return grams.select(*[F.col(c) for c in keep], ex("_grams").alias("ng"))


def _gram_count(df: DataFrame, text_col: str, n: int) -> int:
    """EXACT total word-n-gram count as ONE codegen arithmetic aggregate —
    sum(max(|tokens| − (n−1), 0)) — no gram construction, no explode.
    This is why the sized-Bloom path is effectively one-pass: the
    'count pre-scan' costs a tokenizer projection (~2 s at 400k docs where
    the gram pipeline itself measures ~60 s)."""
    norm = F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[^\p{L}\p{N}\s]+", " "
    )
    toks = F.split(F.trim(F.regexp_replace(norm, r"\s+", " ")), " ")
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    row = df.select(F.sum(cnt).alias("c")).collect()[0]
    return int(row.c or 0)


def ngram_overlap_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    threshold: float = 0.5,
    fpp: float = 1e-6,
    hashed: bool = True,
    broadcast_grams: int | None = None,
) -> DataFrame:
    """N-gram-level decontamination (the GPT-3-appendix recipe): an eval doc
    is contaminated when ≥ ``threshold`` of its word ``n``-grams appear
    anywhere in the training corpus — catching partial leaks (a benchmark
    question embedded in a larger page) that whole-document fingerprints
    miss.  The result is EXACT (modulo 64-bit gram-hash collisions when
    ``hashed=True``; ``hashed=False`` is string-exact).

    The filter is ALWAYS built on the gram-smaller side.  A big-side gram
    filter is the wrong shape at scale — 10^12 grams is a terabytes-sized
    bloom that nothing can broadcast (and 38M grams already measured a
    91 MB blob / 52 s build).  Both usages stay cheap:

    - flag a small eval set against a huge train corpus (train big):
      when the eval gram set fits a broadcast (≤ ``broadcast_grams``,
      default 2M hashed / 500k string grams), the train scan LEFT-SEMI
      broadcast-joins the distinct eval grams directly — the membership
      test stays entirely in whole-stage codegen, no sketch and no
      Python worker in the corpus scan (measured ~25% faster than the
      bloom probe at 38M train grams, identical output); past the
      threshold, eval grams → tiny Bloom → train scanned ONCE, grams
      probed in-scan (a 10^8-gram benchmark suite is a sub-GB bloom but
      a multi-GB broadcast hash table), the surviving gram set
      (≈ matches + fpp·|train|) broadcast-joins back to the eval grams;
    - clean a huge corpus against a small benchmark (eval big, i.e.
      ``eval_df`` IS the corpus and ``train`` is the benchmark): the
      benchmark's distinct gram set broadcasts directly, so the corpus
      pays ONE gram pass straight into the broadcast join — no filter
      stage at all (the join IS the exact membership test; a bloom would
      only add a second corpus-gram pass to prune a join that doesn't
      need pruning).

    The direction is picked automatically from exact gram counts, each ONE
    codegen arithmetic aggregate (``_gram_count`` — token-count math, not
    a gram pass).  Either way the final join against the small side's
    actual gram set decides membership exactly: per-doc hits are exact,
    the sketch (eval-small direction) only PRUNES, and ``fpp`` only tunes
    that pruning.  Zero FN (a leaked gram always probes true and always
    joins back).

    Returns (id, ngrams, hits, overlap, contaminated); docs with fewer than
    n tokens have ngrams=0, overlap=0.0, contaminated=false.
    """
    from guava_probably_spark.functions import might_contain_udf
    from guava_probably_spark.sketches.base import FUNNEL_LONG

    spark = train.sparkSession
    # hashed=True (default, the scale path): grams travel as xxhash64 of
    # the gram string (computed JVM-side, so Arrow ships 8 B/gram instead
    # of ~100 B and Python hashes fixed-width ints). A collision can only
    # count a non-leaked gram as leaked (≤ |grams|²/2⁶⁵ — conservative);
    # hashed=False keeps readable string grams (audits of WHAT leaked).
    def _keyed(ng_df):
        if hashed:
            return ng_df.withColumn(
                "ng", F.when(F.col("ng").isNull(), None).otherwise(F.xxhash64("ng"))
            )
        return ng_df

    ev = _keyed(
        _ngrams_df(
            eval_df.select(F.col(id_col).alias("id"), text_col),
            text_col,
            n,
            keep=("id",),
            outer=True,
        )
    )
    train_ng = _keyed(_ngrams_df(train, text_col, n))
    funnel = FUNNEL_LONG if hashed else None
    ev_grams = _gram_count(eval_df, text_col, n)
    train_grams = _gram_count(train, text_col, n)
    if broadcast_grams is None:
        broadcast_grams = 2_000_000 if hashed else 500_000
    if ev_grams <= train_grams:
        ev_keys = ev.filter(F.col("ng").isNotNull()).select("ng").distinct()
        if ev_grams <= broadcast_grams:
            # eval gram set broadcastable: the train scan semi-joins it
            # directly — exact membership in pure codegen, no filter stage
            # (ev_grams counts instances ≥ distinct, so the gate is
            # conservative)
            leaked = (
                train_ng.join(F.broadcast(ev_keys), "ng", "left_semi")
                .select(F.col("ng").alias("_leaked_ng"))
                .distinct()
            )
        else:
            # filter on the eval side, prune the train scan
            sk = _train_filter(ev_keys, "ng", fpp, max(ev_grams, 1), funnel=funnel)
            probe = might_contain_udf(spark, sk.to_bytes())
            leaked = (
                train_ng.filter(probe(F.col("ng")))  # no nulls: plain explode
                .select(F.col("ng").alias("_leaked_ng"))
                .distinct()
            )
    else:
        # train is the gram-smaller side (the benchmark in corpus-cleaning
        # usage): its distinct gram set broadcasts directly, so the corpus
        # pays ONE gram pass straight into the broadcast join — a filter
        # stage would only add a second corpus-gram pass for pruning the
        # join never needed (the join IS the exact membership test)
        leaked = train_ng.select(F.col("ng").alias("_leaked_ng")).distinct()
    joined = ev.join(
        F.broadcast(leaked), ev["ng"] == F.col("_leaked_ng"), "left"
    )
    per_doc = (
        joined.groupBy("id")
        .agg(
            F.count("ng").alias("ngrams"),
            F.count("_leaked_ng").alias("hits"),
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
