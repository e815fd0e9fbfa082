"""XOR filter (sketches/xorf.py, Graf & Lemire 2020) and the sharded
freeze operator (operators/freeze.py)."""

import numpy as np
import pytest

from guava_probably_spark.sketches import Sketch, XorFilter
from guava_probably_spark.sketches.base import FUNNEL_LONG, FUNNEL_PREHASHED


def _hashes(n=20000, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)


def test_zero_false_negatives_and_exact_fpp():
    keys = _hashes()
    f = XorFilter.build_from_hashes(keys, fbits=8)
    assert f.contains_hashes(keys, keys).all()
    non = _hashes(40000, seed=6)
    fp = f.contains_hashes(non, non).mean()
    sigma = (2**-8 * (1 - 2**-8) / 40000) ** 0.5
    assert fp <= 2**-8 + 4 * sigma
    assert f.expected_fpp() == 2**-8
    assert 9.0 < f.bits_per_key() < 10.5  # ~1.23 * 8


def test_fbits_grid_fpp_scales():
    keys = _hashes(5000)
    non = _hashes(200000, seed=9)
    for fbits in (8, 16):
        f = XorFilter.build_from_hashes(keys, fbits=fbits)
        assert f.contains_hashes(keys, keys).all()
        fp = f.contains_hashes(non, non).mean()
        assert fp <= 2.0**-fbits * 3 + 1e-4


def test_build_deterministic_and_dedup():
    keys = _hashes(8000)
    f1 = XorFilter.build_from_hashes(keys, fbits=8)
    shuffled = keys.copy()
    np.random.default_rng(0).shuffle(shuffled)
    f2 = XorFilter.build_from_hashes(np.concatenate([shuffled, keys[:100]]), fbits=8)
    assert f1.to_bytes() == f2.to_bytes()  # order + duplicates irrelevant
    assert f1.n == len(np.unique(keys))


def test_roundtrip_and_corruption():
    f = XorFilter.build_from_hashes(_hashes(3000), fbits=16)
    blob = f.to_bytes()
    f2 = Sketch.from_bytes(blob)
    assert isinstance(f2, XorFilter) and f2.to_bytes() == blob
    with pytest.raises(ValueError):
        Sketch.from_bytes(blob[: len(blob) // 2])


def test_static_contract_raises():
    f = XorFilter.build_from_hashes(_hashes(100))
    with pytest.raises(NotImplementedError):
        f.update([1, 2, 3])
    with pytest.raises(NotImplementedError):
        f.merge(XorFilter.build_from_hashes(_hashes(100, seed=8)))


def test_empty_build():
    f = XorFilter.build_from_hashes(np.zeros(0, dtype=np.uint64))
    assert f.is_empty()
    assert not f.contains_hashes(_hashes(10), _hashes(10)).any()
    blob = f.to_bytes()
    assert Sketch.from_bytes(blob).to_bytes() == blob


def test_scalar_and_funnel_surface():
    f = XorFilter.build_from_hashes(_hashes(1000), fbits=8, funnel=FUNNEL_LONG)
    # scalar probes go through element_to_hash → murmur h1 domain; the
    # build above used raw hashes, so just assert the call path works
    assert isinstance(f.might_contain(42), bool)


def test_freeze_filter_sharded(spark):
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import (
        freeze_filter,
        frozen_probe_udf,
        frozen_semijoin,
    )

    shards = 16
    df = spark.range(0, 30000).select(
        (F.col("id") * 2654435761 % 1000003).alias("k")
    )
    frozen = freeze_filter(df, "k", fbits=8, shards=shards)
    rows = frozen.collect()
    assert 1 <= len(rows) <= shards
    assert sum(r.n for r in rows) == df.select("k").distinct().count()

    probe = frozen_probe_udf(spark, frozen, shards)
    # zero false negatives over every member
    misses = df.filter(~probe(F.xxhash64(F.col("k")))).count()
    assert misses == 0
    # FP rate on guaranteed non-members within the 2^-8 bound
    non = spark.range(2_000_000, 2_040_000).withColumnRenamed("id", "k")
    fp = non.filter(probe(F.xxhash64(F.col("k")))).count() / 40000
    sigma = (2**-8 * (1 - 2**-8) / 40000) ** 0.5
    assert fp <= 2**-8 + 4 * sigma

    pruned = frozen_semijoin(spark, df, "k", frozen, shards)
    assert pruned.count() == df.count()  # members all survive


def test_freeze_deterministic_across_partitionings(spark):
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import freeze_filter

    df = spark.range(0, 20000).select((F.col("id") % 7919).alias("k"))
    a = {r.shard: bytes(r.sketch) for r in freeze_filter(df, "k", shards=8).collect()}
    b = {
        r.shard: bytes(r.sketch)
        for r in freeze_filter(df.repartition(13), "k", shards=8).collect()
    }
    assert a == b


def test_frozen_null_keys_probe_false(spark):
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import freeze_filter, frozen_probe_udf

    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("k")
    )
    frozen = freeze_filter(df, "k", shards=4)
    probe = frozen_probe_udf(spark, frozen, 4)
    n_null_hits = df.filter(F.col("k").isNull() & probe(F.xxhash64(F.col("k")))).count()
    assert n_null_hits == 0
    n_miss = df.filter(F.col("k").isNotNull() & ~probe(F.xxhash64(F.col("k")))).count()
    assert n_miss == 0


# ---------------------------------------------------------------- XOR map

def test_xormap_exact_lookup_and_stranger_rate():
    from guava_probably_spark.sketches import XorStaticMap

    h = np.unique(_hashes(30000, seed=2))
    v = (h % 200).astype(np.int64) % 256
    m = XorStaticMap.build_from_hashes(h, v, fbits=8, vbits=8)
    found, vals = m.lookup_hashes(h)
    assert found.all() and (vals == v).all()  # members exact, zero FN
    strangers = _hashes(50000, seed=3)
    f2, _ = m.lookup_hashes(strangers)
    sigma = (2**-8 * (1 - 2**-8) / 50000) ** 0.5
    assert f2.mean() <= 2**-8 + 4 * sigma
    assert 18 < m.bits_per_key() < 21  # ~1.23 * 16


def test_xormap_duplicate_conflict_raises_and_agreeing_dedups():
    from guava_probably_spark.sketches import XorStaticMap

    h = np.array([5, 5, 9], dtype=np.uint64)
    with pytest.raises(ValueError):
        XorStaticMap.build_from_hashes(h, np.array([1, 2, 3]))
    m = XorStaticMap.build_from_hashes(h, np.array([1, 1, 3]))
    assert m.n == 2
    found, vals = m.lookup_hashes(np.array([5, 9], dtype=np.uint64))
    assert found.all() and vals.tolist() == [1, 3]


def test_xormap_roundtrip_corruption_and_static_contract():
    from guava_probably_spark.sketches import XorStaticMap

    h = np.unique(_hashes(5000))
    m = XorStaticMap.build_from_hashes(h, (h % 31).astype(np.int64), vbits=5)
    blob = m.to_bytes()
    m2 = Sketch.from_bytes(blob)
    assert m2.to_bytes() == blob
    found, vals = m2.lookup_hashes(h)
    assert found.all() and (vals == (h % 31).astype(np.int64)).all()
    with pytest.raises(ValueError):
        Sketch.from_bytes(blob[: len(blob) - 7])
    with pytest.raises(NotImplementedError):
        m.update([1])
    with pytest.raises(NotImplementedError):
        m.merge(m2)
    with pytest.raises(ValueError):  # value overflow for vbits
        XorStaticMap.build_from_hashes(h[:10], np.full(10, 99), vbits=5)


def test_freeze_map_replaces_broadcast_join(spark):
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import freeze_map, frozen_lookup_udf

    shards = 8
    dim = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("label")
    )
    frozen = freeze_map(dim, "k", "label", vbits=7, shards=shards)
    lookup = frozen_lookup_udf(spark, frozen, shards)
    fact = spark.range(0, 20000).select(F.col("id").alias("k"))
    got = fact.select("k", lookup(F.xxhash64(F.col("k"))).alias("label"))
    # every frozen key resolves to its exact label (== the join answer)
    mism = got.filter(F.col("label") != F.col("k") % 97).count()
    nulls = got.filter(F.col("label").isNull()).count()
    assert mism == 0 and nulls == 0
    # strangers resolve NULL except the 2^-8 fingerprint tail
    far = spark.range(10_000_000, 10_040_000).select(F.col("id").alias("k"))
    hits = far.select(lookup(F.xxhash64(F.col("k"))).alias("l")).filter(
        F.col("l").isNotNull()
    ).count()
    sigma = (2**-8 * (1 - 2**-8) / 40000) ** 0.5
    assert hits / 40000 <= 2**-8 + 4 * sigma


def test_freeze_map_deterministic_and_conflict_raises(spark):
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import freeze_map

    dim = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    a = {r.shard: bytes(r.sketch) for r in freeze_map(dim, "k", "v", shards=4).collect()}
    b = {
        r.shard: bytes(r.sketch)
        for r in freeze_map(dim.repartition(7), "k", "v", shards=4).collect()
    }
    assert a == b
    conflicted = dim.union(
        spark.range(0, 10).select(F.col("id").alias("k"), F.lit(12).alias("v"))
    )
    import py4j

    with pytest.raises(Exception):
        freeze_map(conflicted, "k", "v", shards=4).collect()


def test_frozen_join_path_matches_broadcast_and_skips_driver_blobs(spark):
    """The shard-join probe (serving path for blob tables beyond broadcast)
    returns exactly the broadcast-UDF answer, and its plan carries the
    probe as a JOIN against the blob table — no driver collect of blobs."""
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import (
        freeze_filter,
        freeze_map,
        frozen_lookup_join,
        frozen_lookup_udf,
        frozen_probe_udf,
        frozen_semijoin,
    )

    shards = 8
    dim = spark.range(0, 20000).select((F.col("id") * 3).alias("k"))
    frozen = freeze_filter(dim, "k", fbits=8, shards=shards)
    fact = spark.range(0, 70000).select(F.col("id").alias("k"))

    # forcing the threshold to 0 bytes routes through the join path
    joined = frozen_semijoin(spark, fact, "k", frozen, shards, broadcast_max_bytes=0)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan  # probe rides a join, not a broadcast closure
    got = sorted(r.k for r in joined.collect())

    probe = frozen_probe_udf(spark, frozen, shards)
    want = sorted(
        r.k for r in fact.filter(probe(F.xxhash64(F.col("k")))).collect()
    )
    assert got == want
    members = {r.k for r in dim.collect()}
    assert members <= set(got)  # zero false negatives on either path

    # lookup twin: join-path values == broadcast-path values, NULLs agree
    dimv = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    fm = freeze_map(dimv, "k", "v", vbits=7, shards=shards)
    jl = frozen_lookup_join(fact, "k", fm, shards, out_col="v")
    got_v = {r.k: r.v for r in jl.collect()}
    lk = frozen_lookup_udf(spark, fm, shards)
    want_v = {
        r.k: r.v
        for r in fact.select("k", lk(F.xxhash64(F.col("k"))).alias("v")).collect()
    }
    assert got_v == want_v


def test_frozen_join_fanout_salted_equality(spark):
    """fanout > 1 (salted blob replication for join parallelism beyond
    `shards`) returns exactly the fanout=1 answer for both probe and
    lookup."""
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import (
        freeze_filter,
        freeze_map,
        frozen_lookup_join,
        frozen_probe_join,
    )

    shards = 4
    dim = spark.range(0, 8000).select((F.col("id") * 5).alias("k"))
    frozen = freeze_filter(dim, "k", fbits=8, shards=shards)
    fact = spark.range(0, 45000).select(F.col("id").alias("k"))
    base = sorted(r.k for r in frozen_probe_join(fact, "k", frozen, shards).collect())
    salted = sorted(
        r.k for r in frozen_probe_join(fact, "k", frozen, shards, fanout=8).collect()
    )
    assert base == salted

    dimv = spark.range(0, 8000).select(F.col("id").alias("k"), (F.col("id") % 31).alias("v"))
    fm = freeze_map(dimv, "k", "v", vbits=5, shards=shards)
    a = {r.k: r.v for r in frozen_lookup_join(fact, "k", fm, shards, out_col="v").collect()}
    b = {
        r.k: r.v
        for r in frozen_lookup_join(fact, "k", fm, shards, out_col="v", fanout=8).collect()
    }
    assert a == b


def test_frozen_join_path_null_keys_deterministic(spark):
    """Spark's xxhash64(NULL) is the CONSTANT 42 — a naive probe would
    send every null key to one shard with one fixed hash (all-or-nothing
    at 2^-f). The built-in wrappers keep the hash column NON-null (a
    nullable long batch arrives in pandas as float64, corrupting every
    64-bit hash in it) and instead null the SHARD on the join path /
    short-circuit the predicate on the broadcast path: probe False /
    lookup NULL for every null key, deterministically."""
    import pyspark.sql.functions as F

    from guava_probably_spark.operators import (
        freeze_filter,
        freeze_map,
        frozen_lookup_join,
        frozen_probe_join,
        frozen_semijoin,
    )

    dim = spark.range(0, 5000).select(F.col("id").alias("k"))
    frozen = freeze_filter(dim, "k", fbits=8, shards=4)
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("k")
    )
    out = frozen_probe_join(fact, "k", frozen, 4)
    assert out.filter(F.col("k").isNull()).count() == 0
    assert out.count() == fact.filter(F.col("k").isNotNull()).count()
    # broadcast-mode semijoin wrapper: same null handling
    out_b = frozen_semijoin(spark, fact, "k", frozen, 4)
    assert out_b.filter(F.col("k").isNull()).count() == 0

    fm = freeze_map(dim.withColumn("v", F.col("k") % 13), "k", "v", vbits=4, shards=4)
    lk = frozen_lookup_join(fact, "k", fm, 4, out_col="v")
    assert lk.filter(F.col("k").isNull() & F.col("v").isNotNull()).count() == 0
    assert lk.filter(F.col("k").isNotNull() & F.col("v").isNull()).count() == 0
