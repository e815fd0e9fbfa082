#!/usr/bin/env python
"""Cluster curation job — spark-submit entry point for the pipeline tier.

    spark-submit --py-files sketchlib.zip jobs/curate_job.py \
        --op dedup --input /data/docs --id doc_id --text text \
        --output /out/clean
    --op sample    --k 100000 | --fraction 0.01 | --stratify source \
                   | --weight n_chars
    --op split     --fractions train=0.8,val=0.1,test=0.1
    --op pack      --tokens n_chars --budget 8192 [--order doc_id]
    --op redact
    --op decontaminate --train /data/train (flags rows of --input;
                   --direction eval for the no-train-sized-state shape)
    --op ngram-decontaminate --train /data/train [--n 13 --threshold 0.5]
                   (GPT-3-style partial-leak detection, exact)
    --op quality   [--train /data/reference --n 2] (CMS n-gram LM score)
    --op histogram [--tokens n_chars --bins 20 --stratify source]
                   (equi-depth profile; --stratify → per-key from
                   grouped-KLL blobs with an explicit error column.
                   SCHEMA CHANGE in r3: the stratify key column keeps
                   the INPUT type — it was stringified before; cast
                   downstream readers that assumed string keys)
    --op boilerplate [--min-docs 3] (drop lines appearing in >= min-docs
                   distinct docs — C4-style corpus-frequent line removal)
    --op overlap   --stratify source [--sketch-k 4096] (all-pairs
                   source-overlap matrix from per-key theta blobs)
    --op freeze    [--shards 64] (distinct --id keys -> sharded static
                   XOR filters, the serving-side membership compaction)
    --op dsir      --train /data/target --k 100000 [--temperature 1.0
                   --seed 42] (DSIR importance resampling: keep the k
                   input docs whose hashed-ngram distribution looks like
                   the --train target corpus; adds a logweight column)
    --op c4        (C4 cleaning, Raffel et al. 2020: line filter +
                   page gates; keeps passing pages with the filtered
                   clean text in the text column)

Each op reads parquet (sandbox) or Iceberg (--format iceberg), writes
parquet, and emits one JSON status line.  Ops compose by chaining runs
over intermediate directories — the deployment-shaped version of the
library calls (see guava_probably_spark/pipeline/).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo, "guava_probably_spark")):
    sys.path.insert(0, _repo)


def _read(spark, args, path):
    if args.format == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True,
                    choices=["dedup", "sample", "split", "pack", "redact",
                             "decontaminate", "ngram-decontaminate", "quality",
                             "histogram", "boilerplate", "overlap", "dsir",
                             "c4", "profile", "freeze"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--id", default="doc_id")
    ap.add_argument("--text", default="text")
    ap.add_argument("--output", required=True)
    # sample
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--fraction", type=float, default=None)
    ap.add_argument("--stratify", default=None)
    ap.add_argument("--weight", default=None)
    ap.add_argument("--estimate", action="store_true",
                    help="with --weight/--k: priority sampling (DLT 2007) — "
                         "adds est_weight, the per-row unbiased subset-sum "
                         "estimator, instead of plain ES selection")
    ap.add_argument("--salt", default="")
    # split
    ap.add_argument("--fractions", default="train=0.9,val=0.05,test=0.05")
    # pack
    ap.add_argument("--tokens", default=None)
    ap.add_argument("--budget", type=int, default=8192)
    ap.add_argument("--order", default=None)
    # dedup
    ap.add_argument("--max-hamming", type=int, default=3)
    # decontaminate / ngram-decontaminate / quality
    ap.add_argument("--train", default=None)
    ap.add_argument("--direction", default="train", choices=["train", "eval"])
    ap.add_argument("--n", type=int, default=None)  # 13 for ngram-decontaminate, 2 for quality
    ap.add_argument("--threshold", type=float, default=0.5)
    # histogram
    ap.add_argument("--bins", type=int, default=20)
    ap.add_argument("--shards", type=int, default=64,
                    help="freeze op: shard count for the sharded XOR build")
    # boilerplate
    ap.add_argument("--min-docs", type=int, default=3)
    # overlap
    ap.add_argument("--sketch-k", type=int, default=4096)
    # dsir
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName(f"gps-curate-{args.op}").getOrCreate()
    t0 = time.monotonic()
    df = _read(spark, args, args.input)
    status: dict = {"op": args.op, "input_rows": df.count()}

    if args.op == "dedup":
        from guava_probably_spark.pipeline.components import (
            connected_components,
            keep_canonical,
        )
        from guava_probably_spark.pipeline.dedup import simhash_df, simhash_near_pairs

        sim = simhash_df(df, args.id, args.text)
        pairs = simhash_near_pairs(sim, max_hamming=args.max_hamming)
        comps = connected_components(pairs, "a", "b")
        out = keep_canonical(df, args.id, comps)
    elif args.op == "sample":
        from guava_probably_spark.pipeline.sampling import (
            hash_sample,
            hash_threshold_sample,
            priority_sample,
            stratified_sample,
            weighted_sample,
        )

        if args.weight is not None and args.k is not None:
            sampler = priority_sample if args.estimate else weighted_sample
            out = sampler(df, [args.id], args.weight, args.k, salt=args.salt)
        elif args.stratify is not None and args.k is not None:
            out = stratified_sample(df, args.stratify, [args.id], args.k, salt=args.salt)
        elif args.k is not None:
            out = hash_sample(df, [args.id], args.k, salt=args.salt)
        elif args.fraction is not None:
            out = hash_threshold_sample(df, [args.id], args.fraction, salt=args.salt)
        else:
            raise SystemExit("sample requires --k or --fraction")
    elif args.op == "split":
        from guava_probably_spark.pipeline.sampling import hash_split

        fr = {}
        for part in args.fractions.split(","):
            name, v = part.split("=", 1)
            fr[name] = float(v)
        out = hash_split(df, [args.id], fr, salt=args.salt)
    elif args.op == "pack":
        from guava_probably_spark.pipeline.packing import pack_sequences

        token_col = args.tokens or "__tok"
        if args.tokens is None:
            df = df.withColumn("__tok", F.length(args.text))
        order = [args.order] if args.order else [args.id]
        out = pack_sequences(df, order, token_col, budget=args.budget)
        if args.tokens is None:
            out = out.drop("__tok")
    elif args.op == "redact":
        from guava_probably_spark.pipeline.textops import redact_df

        red = redact_df(df, args.id, args.text).withColumnRenamed("id", args.id)
        out = df.drop(args.text).join(red, args.id)
    elif args.op == "decontaminate":
        if not args.train:
            raise SystemExit("decontaminate requires --train")
        from guava_probably_spark.pipeline.contamination import flag_contaminated

        train = _read(spark, args, args.train)
        flags = flag_contaminated(
            train, df, args.id, args.text, direction=args.direction
        ).withColumnRenamed("id", args.id)
        out = df.join(flags, args.id)
        status["leaked_rows"] = out.filter(F.col("leaked")).count()
    elif args.op == "ngram-decontaminate":
        if not args.train:
            raise SystemExit("ngram-decontaminate requires --train")
        from guava_probably_spark.pipeline.contamination import (
            ngram_overlap_contamination,
        )

        train = _read(spark, args, args.train)
        flags = ngram_overlap_contamination(
            train, df, args.id, args.text, n=args.n or 13, threshold=args.threshold
        ).withColumnRenamed("id", args.id)
        out = df.join(flags, args.id)
        status["contaminated_rows"] = out.filter(F.col("contaminated")).count()
    elif args.op == "quality":
        from guava_probably_spark.pipeline.textops import lm_quality_score

        # --train: reference corpus for the n-gram LM (defaults to scoring
        # the input against itself — in-corpus typicality)
        train = _read(spark, args, args.train) if args.train else df
        scores = lm_quality_score(
            train, df, args.id, args.text, n=args.n or 2
        ).withColumnRenamed("id", args.id)
        out = df.join(scores, args.id)
    elif args.op == "boilerplate":
        from guava_probably_spark.pipeline.textops import remove_boilerplate_lines

        out = remove_boilerplate_lines(
            df, min_docs=args.min_docs, id_col=args.id, text_col=args.text
        )
    elif args.op == "overlap":
        from guava_probably_spark.operators import source_overlap_matrix

        if not args.stratify:
            raise SystemExit("--op overlap requires --stratify <key column>")
        out = source_overlap_matrix(df, args.stratify, args.text, k=args.sketch_k)
    elif args.op == "dsir":
        from guava_probably_spark.pipeline.dsir import dsir_select

        if not args.train or not args.k:
            raise SystemExit("--op dsir requires --train <target corpus> and --k")
        tgt = _read(spark, args, args.train)
        sel = dsir_select(
            df, tgt, args.id, args.text, k=args.k,
            temperature=args.temperature, seed=args.seed,
        )
        out = df.join(
            sel.select(F.col("id").alias(args.id), "logweight"), args.id
        )
    elif args.op == "profile":
        from guava_probably_spark.operators import profile_summary

        # one-scan per-column profile; --stratify narrows to a column list
        # (comma-separated), default = every profilable column
        cols = args.stratify.split(",") if args.stratify else None
        out = profile_summary(df, columns=cols)
    elif args.op == "freeze":
        from guava_probably_spark.operators import freeze_filter

        # serving-side compaction: distinct --id keys -> sharded static
        # XOR filters (operators/freeze.py)
        out = freeze_filter(df, args.id, fbits=8, shards=args.shards)
    elif args.op == "c4":
        from guava_probably_spark.pipeline.textops import c4_quality_df

        sig = c4_quality_df(df, args.id, args.text)
        kept = sig.filter("c4_pass").select(
            F.col("id").alias(args.id), F.col("clean_text").alias(args.text)
        )
        out = df.drop(args.text).join(kept, args.id)
    else:  # histogram
        from guava_probably_spark.operators.histogram import (
            histogram_equidepth,
            histogram_equidepth_grouped,
        )

        token_col = args.tokens or "__len"
        if args.tokens is None:
            df = df.withColumn("__len", F.length(args.text).cast("double"))
        if args.stratify:
            # per-source profiles straight from grouped-KLL blobs
            out = histogram_equidepth_grouped(
                df, args.stratify, token_col, bins=args.bins
            )
        else:
            out = histogram_equidepth(df, token_col, bins=args.bins)

    out.write.mode("overwrite").parquet(args.output)
    status["output_rows"] = spark.read.parquet(args.output).count()
    status["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(status))
    spark.stop()


if __name__ == "__main__":
    main()
