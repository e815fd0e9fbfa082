"""Blob-only drift reports between grouped sketch tables
(operators/drift.py)."""

import pytest
from pyspark.sql import functions as F

from guava_probably_spark.operators import (
    build_grouped,
    ks_drift_report,
    share_drift_report,
)
from guava_probably_spark.operators.grouped_kll import grouped_kll
from guava_probably_spark.sketches import SketchSpec


def _snapshot(spark, n, shift_src, shift):
    """(src, v) with src 's0'..'s3'; shift one source's distribution."""
    df = spark.range(n).select(
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("src"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    return df.withColumn(
        "v",
        F.when(F.col("src") == shift_src, F.col("v") + F.lit(float(shift))).otherwise(
            F.col("v")
        ),
    )


def test_ks_drift_report_flags_only_the_shifted_source(spark):
    # grouped_kll emits (key, sketch, n)
    a = grouped_kll(_snapshot(spark, 40000, "s2", 0.0), "src", "v", k=200)
    b = grouped_kll(_snapshot(spark, 40000, "s2", 500.0), "src", "v", k=200)
    rep = {r.key: r for r in ks_drift_report(a, b, "key").collect()}
    assert set(rep) == {"s0", "s1", "s2", "s3"}
    assert all(r.in_a and r.in_b for r in rep.values())
    # s2 shifted by half the range -> KS ~ 0.5; the rest identical data
    assert rep["s2"].ks == pytest.approx(0.5, abs=0.05)
    for s in ("s0", "s1", "s3"):
        assert rep[s].ks <= 0.02  # same rows -> same blobs -> ~0

    # one-sided key: NULL ks, membership flags say which side
    extra = grouped_kll(
        spark.createDataFrame([("s9", 1.0)], "src string, v double"), "src", "v"
    )
    rep2 = {r.key: r for r in ks_drift_report(a, b.unionByName(extra), "key").collect()}
    assert rep2["s9"].ks is None and not rep2["s9"].in_a and rep2["s9"].in_b


def test_share_drift_report_certifies_planted_categorical_shift(spark):
    # items per source; snapshot b moves 20% of sA's mass from t0 to t1
    # while sB keeps the a-distribution.  MG k=64 > 3 items -> exact
    # brackets (e = 0), so lo == hi == the true share delta.
    def snap(shifted):
        t0_cut_a = F.lit(3)
        t0_cut = (
            F.when(F.col("src") == "sA", F.lit(1 if shifted else 3)).otherwise(t0_cut_a)
        )
        return spark.range(30000).select(
            F.when(F.col("id") % 2 == 0, "sA").otherwise("sB").alias("src"),
            (F.col("id") % 10).alias("slot"),
        ).select(
            "src",
            F.when(F.col("slot") < t0_cut, "t0")
            .when(F.col("slot") < 5, "t1")
            .otherwise("t2")
            .alias("item"),
        )

    spec = SketchSpec("mg", {"k": 64})
    a = build_grouped(snap(False), "src", "item", spec)
    b = build_grouped(snap(True), "src", "item", spec)
    rep = share_drift_report(a, b, "src", "sketch")
    rows = {(r.src, r.item): r for r in rep.collect()}
    # sA: t0 share 0.3 -> 0.1 and t1 share 0.2 -> 0.4 (delta 0.2 certified
    # exactly); sB rows: zero drift certified (lo == hi == 0)
    assert rows[("sA", "t0")].lo == pytest.approx(0.2, abs=1e-9)
    assert rows[("sA", "t0")].hi == pytest.approx(0.2, abs=1e-9)
    assert rows[("sA", "t1")].lo == pytest.approx(0.2, abs=1e-9)
    for item in ("t0", "t1", "t2"):
        assert rows[("sB", item)].lo == 0.0 and rows[("sB", item)].hi == 0.0
    # min_hi filter drops the certified-stable rows
    kept = share_drift_report(a, b, "src", "sketch", min_hi=0.05).collect()
    assert {(r.src, r.item) for r in kept} == {("sA", "t0"), ("sA", "t1")}
