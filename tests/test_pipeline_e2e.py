"""End-to-end curation pipeline: the composed flow a user actually runs —
dedup → benchmark decontamination → LM quality filter → split → pack —
with planted duplicates and planted eval leaks, checking the invariants
that matter across STAGE BOUNDARIES (each stage's internals are covered by
its own operator tests):

- surviving corpus has no two docs with the same normalization fingerprint;
- no surviving doc contains any benchmark 13-gram (decontamination caught
  the planted partial leak, not just the verbatim copy);
- quality filter drops exactly the docs below the score cutoff, nothing else;
- split fractions hold and every surviving doc lands in exactly one split;
- packing respects the token budget and loses no doc;
- per-doc text BYTES are untouched end-to-end (curation filters rows,
  never rewrites them — the BASELINE.json per-row invariant).
"""

import os

import pytest
from pyspark.sql import functions as F

from guava_probably_spark.pipeline.contamination import ngram_overlap_contamination
from guava_probably_spark.pipeline.dedup import exact_dedup
from guava_probably_spark.pipeline.packing import pack_sequences
from guava_probably_spark.pipeline.sampling import hash_split
from guava_probably_spark.pipeline.textops import lm_quality_score


def test_full_curation_pipeline(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    n0 = docs.count()
    texts = {r.doc_id: r.text for r in docs.collect()}

    # plant: exact dups (case-mangled) of every 10th doc, and a "benchmark"
    # eval set whose questions are embedded VERBATIM inside two train docs
    # (partial leaks — the case whole-doc fingerprints miss)
    bench_rows = [
        (900_000, " ".join(f"benchq{i}" for i in range(20))),
        (900_001, " ".join(f"benchr{i}" for i in range(20))),
        (900_002, " ".join(f"clean{i}" for i in range(20))),  # not leaked
    ]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    leak0 = texts[0] + " " + bench_rows[0][1]
    leak1 = bench_rows[1][1] + " " + texts[4]
    extra = spark.createDataFrame(
        [(800_000, leak0), (800_001, leak1)], "doc_id long, text string"
    )
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), F.upper("text").alias("text")
    )
    corpus = docs.unionByName(dups).unionByName(extra)

    # stage 1: exact dedup — keep the smallest id per fingerprint group
    from guava_probably_spark.pipeline import textexpr

    fp = F.expr(textexpr.md5_fingerprint_expr("text", "spark")).alias("fp")
    groups = exact_dedup(corpus, "doc_id", "text")
    losers = (
        corpus.select(fp, "doc_id")
        .join(groups.select("fp", "keep_id"), "fp")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    stage1 = corpus.join(losers, "doc_id", "left_anti")
    # every fingerprint now appears exactly once
    fp_dups = (
        stage1.select(fp).groupBy("fp").count().filter(F.col("count") > 1).count()
    )
    assert fp_dups == 0
    assert stage1.count() == n0 + 2  # dups gone, the two leak docs remain

    # stage 2: n-gram decontamination — clean the CORPUS against the small
    # benchmark (train=bench is the gram-smaller side: the op picks the
    # train-side filter direction automatically)
    flags = ngram_overlap_contamination(
        bench, stage1, "doc_id", "text", n=13, threshold=0.01
    )
    dirty = flags.filter(F.col("contaminated")).select(F.col("id").alias("doc_id"))
    assert {r.doc_id for r in dirty.collect()} == {800_000, 800_001}
    stage2 = stage1.join(dirty, "doc_id", "left_anti")

    # stage 3: LM quality filter — drop the bottom decile by self-typicality
    scores = lm_quality_score(stage2, stage2, "doc_id", "text", n=2).withColumnRenamed(
        "id", "doc_id"
    )
    cutoff = scores.filter(F.col("avg_logprob").isNotNull()).approxQuantile(
        "avg_logprob", [0.1], 0.0
    )[0]
    keep = scores.filter(
        F.col("avg_logprob").isNull() | (F.col("avg_logprob") >= cutoff)
    ).select("doc_id")
    stage3 = stage2.join(keep, "doc_id", "left_semi")
    n3 = stage3.count()
    dropped = stage2.count() - n3
    assert 0 < dropped <= int(0.11 * stage2.count()) + 1

    # stage 4: deterministic split — disjoint, exhaustive, fractions hold
    split = hash_split(stage3, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.c for r in split.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == n3
    assert counts["train"] == pytest.approx(0.8 * n3, rel=0.15)

    # stage 5: pack the train split — budget respected, nothing lost
    train = split.filter(F.col("split") == "train").withColumn(
        "tok", F.length("text")
    )
    budget = 8192
    packed = pack_sequences(train, ["doc_id"], "tok", budget=budget)
    assert packed.count() == counts["train"]
    # bin = exclusive-prefix-tokens div budget: a bin's LAST doc may spill
    # past the boundary (streamed packing never splits a doc), so the
    # invariant is sum-minus-last < budget for every bin, and bins cover
    # a contiguous, gap-free range
    from pyspark.sql import Window

    w = Window.partitionBy("bin").orderBy(F.desc("doc_id"))
    per_bin = (
        packed.withColumn("rn", F.row_number().over(w))
        .groupBy("bin")
        .agg(
            F.sum("tok").alias("t"),
            F.max(F.when(F.col("rn") == 1, F.col("tok"))).alias("last_tok"),
        )
    )
    assert per_bin.filter(F.col("t") - F.col("last_tok") >= budget).count() == 0
    bins = sorted(r.bin for r in per_bin.select("bin").collect())
    assert bins == list(range(len(bins)))

    # end-to-end byte invariant: every surviving doc's text is bit-identical
    # to what entered the pipeline
    final = {r.doc_id: r.text for r in packed.select("doc_id", "text").collect()}
    entered = {r.doc_id: r.text for r in corpus.collect()}
    for did, t in final.items():
        assert t == entered[did]
