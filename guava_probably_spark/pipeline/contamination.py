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
    """
    from guava_probably_spark.functions import might_contain_udf
    from guava_probably_spark.operators import collect_sketch

    spark = train.sparkSession
    fp_expr = textexpr.md5_fingerprint_expr(text_col, "spark")
    train_fp = train.select(F.expr(fp_expr).alias("fp"))
    cap = capacity or train_fp.count()
    sk, _, _ = collect_sketch(
        train_fp, "fp", SketchSpec("bloom", {"capacity": max(cap, 1024), "fpp": fpp})
    )
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
