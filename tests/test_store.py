"""Bucketed sketch store (operators/store.py): co-located merge of two
grouped sketch tables — correctness (merged estimates equal a direct build
over the union) and plan shape (zero Exchange in the merge-join)."""

import os

import pytest

from pyspark.sql import functions as F

from guava_probably_spark.functions import hll_cardinality
from guava_probably_spark.operators import (
    build_grouped,
    merge_sketch_tables,
    write_bucketed_sketches,
)
from guava_probably_spark.sketches import SketchSpec

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    halves = [
        events.filter(F.pmod(F.col("event_id"), F.lit(2)) == i) for i in range(2)
    ]
    spec = SketchSpec("hll", {"p": 12})
    for i, h in enumerate(halves):
        g = build_grouped(h, "event_type", "user_id", spec, salt=2)
        write_bucketed_sketches(g, f"sketch_half_{i}", "event_type", buckets=4)
    yield events, spec
    for i in range(2):
        spark.sql(f"DROP TABLE IF EXISTS sketch_half_{i}")


def test_bucketed_merge_matches_direct_build(spark, bucketed_tables):
    events, spec = bucketed_tables
    merged = merge_sketch_tables(spark, "sketch_half_0", "sketch_half_1", "event_type")
    est = {
        r.event_type: r.est
        for r in merged.select(
            "event_type", hll_cardinality()("sketch").alias("est")
        ).collect()
    }
    direct = {
        r.event_type: r.est
        for r in build_grouped(events, "event_type", "user_id", spec, salt=2)
        .select("event_type", hll_cardinality()("sketch").alias("est"))
        .collect()
    }
    assert est == direct  # register-max merge is exact vs one-shot build
    n_by_key = {
        r.event_type: r.n for r in merged.select("event_type", "n").collect()
    }
    exact_n = {
        r.event_type: r.c
        for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    assert n_by_key == exact_n


def test_bucketed_merge_plan_has_no_exchange(spark, bucketed_tables):
    merged = merge_sketch_tables(spark, "sketch_half_0", "sketch_half_1", "event_type")
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucketing paid the shuffle at write time
