"""Freeze a key column into sharded static XOR filters (serving-side).

The mergeable filters (bloom / cuckoo / qf / sbf) are the BUILD-side
shapes: partials fold associatively through the scan-phase tree merge.
An XOR filter (sketches/xorf.py, Graf & Lemire 2020) is denser and
probe-faster but global — it cannot merge — so at 100-TB scale the freeze
is sharded: keys route to ``shards`` buckets by their 64-bit hash, each
shard's filter is solved executor-side from its hash set, and the result
is a small DataFrame of ``(shard, sketch, n)`` blobs.  No key list ever
reaches the driver; driver-visible state is shards × ~1.23·f·n/shards
bits.  Pick ``shards`` so a shard's distinct keys fit executor memory
(~10 M keys/shard is comfortable; 4096 shards covers 4·10^10 keys).

Probes broadcast the blob table and route each probe hash to its shard —
one gather+XOR per probe, FPP exactly 2^-f.  Keys are hashed JVM-side
with ``xxhash64`` (the FUNNEL_PREHASHED domain): the value bytes never
cross the JVM→Python boundary in either build or probe, the same fast
path the grouped prehash builds use.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..sketches.base import FUNNEL_PREHASHED
from ..sketches.xorf import XorFilter

FROZEN_SCHEMA = "shard bigint, sketch binary, n bigint"


def freeze_filter(
    df: DataFrame,
    col: str,
    fbits: int = 8,
    shards: int = 64,
) -> DataFrame:
    """Distinct keys of ``df[col]`` → ``shards`` XOR-filter blobs.

    One shuffle (hash → shard); the per-shard solve is executor-side and
    deterministic (blob = pure function of the shard's distinct hash set),
    so the output is identical across partitionings and reruns.
    """
    hashed = df.select(F.xxhash64(F.col(col)).alias("h")).where(F.col(col).isNotNull())
    sharded = hashed.withColumn("shard", F.pmod(F.col("h"), F.lit(shards)))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
        sk = XorFilter.build_from_hashes(h, fbits=fbits, funnel=FUNNEL_PREHASHED)
        return pd.DataFrame(
            {"shard": [shard], "sketch": [sk.to_bytes()], "n": [sk.n]}
        )

    return sharded.groupBy("shard").applyInPandas(build, schema=FROZEN_SCHEMA)


def frozen_probe_udf(spark: SparkSession, frozen: DataFrame, shards: int):
    """Membership predicate over a frozen filter table.

    Collects the (small) blob table, broadcasts it, and returns a callable
    to apply to the PRE-HASHED column — probe with
    ``probe(F.xxhash64(F.col("k")))`` so build and probe share the exact
    JVM hash domain.  Missing shards (no keys routed there) probe False.
    """
    rows = frozen.collect()
    blobs: list[bytes | None] = [None] * shards
    for r in rows:
        blobs[int(r.shard)] = bytes(r.sketch)
    bc = spark.sparkContext.broadcast(blobs)
    # per-worker decode cache OUTSIDE the udf body: each executor decodes
    # each shard blob once, not once per Arrow batch
    cache: dict[int, XorFilter] = {}

    @pandas_udf(BooleanType())
    def probe(hashes: pd.Series) -> pd.Series:
        from ..sketches.base import Sketch

        table = bc.value
        h = hashes.to_numpy(dtype=np.int64, na_value=0)
        isnull = hashes.isna().to_numpy()
        shard = np.mod(h, shards)
        out = np.zeros(len(h), dtype=bool)
        for s in np.unique(shard):
            blob = table[int(s)]
            if blob is None:
                continue
            sk = cache.get(int(s))
            if sk is None:
                sk = Sketch.from_bytes(blob)
                cache[int(s)] = sk
            m = shard == s
            hu = h[m].view(np.uint64)
            out[m] = sk.contains_hashes(hu, hu)
        out[isnull] = False
        return pd.Series(out)

    return probe


def freeze_map(
    df: DataFrame,
    key_col: str,
    value_col: str,
    fbits: int = 8,
    vbits: int = 8,
    shards: int = 64,
) -> DataFrame:
    """Distinct (key, value) pairs → ``shards`` static XOR-map blobs
    (sketches/xormap.py) — the serving-side replacement for a broadcast
    join against a small-value dimension: lookups return the EXACT
    ``vbits``-bit value for every frozen key at ~1.23·(f+v) bits/key with
    no key bytes stored.  Values must be non-negative ints < 2^vbits;
    duplicate keys must agree on the value (the per-shard solve raises
    otherwise — a silent pick would mislabel)."""
    from ..sketches.xormap import XorStaticMap

    hashed = df.select(
        F.xxhash64(F.col(key_col)).alias("h"),
        F.col(value_col).cast("long").alias("v"),
    ).where(F.col(key_col).isNotNull() & F.col(value_col).isNotNull())
    sharded = hashed.withColumn("shard", F.pmod(F.col("h"), F.lit(shards)))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
        v = pdf["v"].to_numpy(dtype=np.int64)
        sk = XorStaticMap.build_from_hashes(
            h, v, fbits=fbits, vbits=vbits, funnel=FUNNEL_PREHASHED
        )
        return pd.DataFrame(
            {"shard": [shard], "sketch": [sk.to_bytes()], "n": [sk.n]}
        )

    return sharded.groupBy("shard").applyInPandas(build, schema=FROZEN_SCHEMA)


def frozen_lookup_udf(spark: SparkSession, frozen: DataFrame, shards: int):
    """Value-lookup column over a frozen map table: apply to the
    PRE-HASHED key (``lookup(F.xxhash64(F.col("k")))``); returns the
    stored value, or NULL when the fingerprint misses (strangers at
    2^-f; frozen keys never miss)."""
    from pyspark.sql.types import LongType

    from ..sketches.base import Sketch

    rows = frozen.collect()
    blobs: list[bytes | None] = [None] * shards
    for r in rows:
        blobs[int(r.shard)] = bytes(r.sketch)
    bc = spark.sparkContext.broadcast(blobs)
    cache: dict[int, object] = {}

    @pandas_udf(LongType())
    def lookup(hashes: pd.Series) -> pd.Series:
        table = bc.value
        h = hashes.to_numpy(dtype=np.int64, na_value=0)
        isnull = hashes.isna().to_numpy()
        shard = np.mod(h, shards)
        out = np.zeros(len(h), dtype=np.float64)
        out[:] = np.nan
        for s in np.unique(shard):
            blob = table[int(s)]
            if blob is None:
                continue
            sk = cache.get(int(s))
            if sk is None:
                sk = Sketch.from_bytes(blob)
                cache[int(s)] = sk
            m = shard == s
            found, vals = sk.lookup_hashes(h[m].view(np.uint64))
            res = np.where(found, vals.astype(np.float64), np.nan)
            out[m] = res
        out[isnull] = np.nan
        return pd.Series(out).astype("Int64")

    return lookup


def frozen_semijoin(
    spark: SparkSession,
    fact: DataFrame,
    fact_col: str,
    frozen: DataFrame,
    shards: int,
) -> DataFrame:
    """Prune ``fact`` to rows whose key probes the frozen filter — the
    serving-side analogue of ``sketch_semijoin`` (FPs at 2^-f survive;
    follow with an exact join where exactness matters)."""
    probe = frozen_probe_udf(spark, frozen, shards)
    return fact.filter(probe(F.xxhash64(F.col(fact_col))))
