"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB has two hard requirements the built-in ``df.sample``
cannot give you: (1) reproducibility independent of partitioning, task
retries and cluster size, and (2) an exact oracle.  Every operator here
ranks rows by ``md5(key)`` (a frozen dual-dialect expression from
``textexpr.sample_rank_expr``), so the selected set is a pure function of
the data — rerun the job on a different cluster layout and you get the
same bytes.

Scale notes (local[32] verifies correctness; the plan is what matters):

- ``hash_sample`` compiles to ``TakeOrderedAndProject``: each task keeps a
  k-row heap and only k rows per partition cross to the driver-side merge —
  no full sort, no full shuffle.  Fine up to k ~ 10^6; beyond that use
  ``hash_threshold_sample`` (one scan + scalar filter, no ordering at all).
- ``stratified_sample`` is one hash-shuffle on the stratum key plus a
  partition-local sort (standard window top-k).  Hot strata are bounded by
  the per-stratum sort, not a driver collect; for 10^8-row strata prefer
  ``hash_threshold_sample`` per stratum.
- ``hash_split`` is a pure projection (whole-stage codegen, zero shuffle):
  the train/val/test label is a string comparison on an md5 prefix.

Reference parity: the reference library (guava-probably) has no sampler —
this module covers the prompt's training-data pipeline tier; determinism
discipline follows the same frozen-hash-contract style as its
murmur3-backed filters (reference CuckooFilter.java:60 funnel contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textexpr import hash_u60_expr, sample_rank_expr, split_label_expr

_RANK = "__gps_rank"

# temperature_sample integer contract: per-source weight q_s is the
# α-power of the source size quantized to 1/TEMP_SCALE resolution, and the
# keep decision compares a 60-bit hash against an integer threshold.
TEMP_SCALE = 1024
_U60 = 1 << 60


def temperature_weights(counts: dict, alpha: float) -> dict:
    """Quantized per-source mixing weights q_s = floor(n_s^α · TEMP_SCALE).

    α ∈ {0, 0.5, 1} uses exact integer / correctly-rounded-IEEE paths that
    a SQL oracle reproduces bit-for-bit (sqrt is correctly rounded; scaling
    by a power of two is exact; floor is exact); other α fall back to
    ``float ** alpha``, which is reproducible on the Spark side (thresholds
    are driver-computed literals) but not guaranteed across SQL engines.
    """
    import math

    q = {}
    for s, n in counts.items():
        if n <= 0:
            raise ValueError(f"source {s!r} has non-positive count {n}")
        if alpha == 0.0:
            q[s] = TEMP_SCALE
        elif alpha == 1.0:
            q[s] = int(n) * TEMP_SCALE
        elif alpha == 0.5:
            q[s] = int(math.floor(math.sqrt(float(n)) * TEMP_SCALE))
        else:
            q[s] = int(math.floor(float(n) ** alpha * TEMP_SCALE))
    return q


def temperature_thresholds(counts: dict, target_rows: int, alpha: float = 0.5) -> dict:
    """Integer keep-thresholds T_s for :func:`temperature_sample`.

    Source s keeps a row iff its 60-bit key hash < T_s, where
    T_s = min(2^60, ⌊target · q_s · 2^60 / (Σq · n_s)⌋) — i.e. keep
    probability min(1, target · p_s / n_s) with p_s = n_s^α / Σ n_t^α,
    the multinomial temperature-mixing distribution of mT5/XLM-R
    (Xue et al. 2021 §3.1; Conneau et al. 2020 §3). All arithmetic is
    arbitrary-precision integer, so the thresholds are exact at any scale.
    """
    if target_rows < 0:
        raise ValueError(f"target_rows must be >= 0, got {target_rows}")
    q = temperature_weights(counts, alpha)
    s_total = sum(q.values())
    return {
        s: min(_U60, (target_rows * q[s] * _U60) // (s_total * int(n)))
        for s, n in counts.items()
    }


def temperature_sample(
    df: DataFrame,
    source_col: str,
    key_cols: list[str],
    target_rows: int,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-based source mixing: downsample each source so the kept
    corpus follows p_s ∝ n_s^α (α=1 natural proportions, α=0 uniform over
    sources, α≈0.3–0.7 the usual multilingual-LM flattening).

    Plan shape: one narrow counts aggregation (column pruning reaches the
    scan — only ``source_col`` moves) feeding driver-side integer threshold
    math on |sources| rows, then ONE whole-stage-codegen filter pass
    comparing the md5-derived 60-bit key hash against per-source literal
    thresholds.  No shuffle touches the payload; rerun on any cluster
    layout and the kept set is byte-identical.  Sources whose fair share
    exceeds their size keep everything (threshold caps at 2^60) — the
    dedup-safe stance; express upsampling as repetition epochs downstream.
    Null-source rows are dropped (no weight ⇒ no mixture membership).

    Per-source take sizes are Binomial(n_s, T_s/2^60) — tight at scale.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
        if r[0] is not None
    }
    if not counts:
        return df.filter(F.lit(False))
    thresholds = temperature_thresholds(counts, target_rows, alpha)
    h = F.expr(hash_u60_expr(key_cols, "spark", salt))
    thr = F.coalesce(
        *[F.when(F.col(source_col) == s, F.lit(t)) for s, t in thresholds.items()]
    )
    return df.filter(F.col(source_col).isNotNull() & (h < thr))


def temperature_sample_sql_duck(
    table: str,
    source_col: str,
    key_cols: list[str],
    target_rows: int,
    alpha: float = 0.5,
    salt: str = "",
    select: str = "*",
) -> str:
    """DuckDB oracle for :func:`temperature_sample` — recomputes counts,
    quantized weights, and thresholds in HUGEINT SQL with the identical
    integer floor-division, then applies the same h60 < T_s filter.

    Only the IEEE-exact α values {0, 0.5, 1} are supported: for these the
    double math (sqrt → ×2^10 → floor) is correctly rounded / exact in
    both engines, so q_s — and every integer derived from it — matches the
    Python driver computation bit-for-bit.
    """
    if alpha == 0.0:
        qexpr = f"CAST({TEMP_SCALE} AS HUGEINT)"
    elif alpha == 1.0:
        qexpr = f"n * {TEMP_SCALE}"
    elif alpha == 0.5:
        qexpr = f"CAST(floor(sqrt(CAST(n AS DOUBLE)) * {TEMP_SCALE}) AS HUGEINT)"
    else:
        raise ValueError(f"oracle supports alpha in {{0, 0.5, 1}}, got {alpha}")
    h = hash_u60_expr(key_cols, "duck", salt)
    return (
        f"WITH c AS (SELECT {source_col} AS g, CAST(count(*) AS HUGEINT) AS n "
        f"FROM {table} WHERE {source_col} IS NOT NULL GROUP BY 1), "
        f"q AS (SELECT g, n, {qexpr} AS q FROM c), "
        f"s AS (SELECT CAST(sum(q) AS HUGEINT) AS st FROM q), "
        f"t AS (SELECT g, least(CAST({_U60} AS HUGEINT), "
        f"(CAST({target_rows} AS HUGEINT) * q * CAST({_U60} AS HUGEINT)) "
        f"// (st * n)) AS thr FROM q, s) "
        f"SELECT {select} FROM {table} JOIN t ON {source_col} = t.g "
        f"WHERE CAST({h} AS HUGEINT) < t.thr"
    )


def hash_sample(df: DataFrame, key_cols: list[str], k: int, salt: str = "") -> DataFrame:
    """Global uniform sample of exactly ``min(k, n)`` rows: bottom-k by hash.

    Deterministic in the data alone — partitioning, parallelism and retry
    schedules cannot change the result.  Different ``salt`` values give
    independent samples.
    """
    rank = F.expr(sample_rank_expr(key_cols, "spark", salt))
    ordered = df.withColumn(_RANK, rank).orderBy(_RANK, *key_cols)
    return ordered.limit(k).drop(_RANK)


def hash_threshold_sample(
    df: DataFrame, key_cols: list[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Approximate-size uniform sample with NO ordering: keep rows whose
    hash-rank prefix falls below ``fraction``.

    The row count is Binomial(n, fraction) — tight at scale — and the scan
    stays a single codegen filter, so this is the 10^12-row path where even
    per-partition top-k heaps would be waste.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    expr = split_label_expr(key_cols, {"keep": fraction, "drop": 1.0 - fraction}, "spark", salt)
    return df.filter(F.expr(expr) == "keep")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_cols: list[str],
    k_per_stratum: int,
    salt: str = "",
    salt_partitions: int = 32,
) -> DataFrame:
    """Exactly ``min(k, stratum size)`` rows from every stratum.

    Two-phase top-k so a hot stratum never serializes through one task:
    phase 1 windows over (stratum, hash-salt) — ``salt_partitions``-way
    parallel — keeping k rows per salt bucket; phase 2 re-windows the
    ≤ k·salt_partitions survivors per stratum for the final exact top-k.
    Every salt bucket's top-k contains all of its members of the global
    top-k, so the result is identical to the single-window formulation —
    deterministic order by (hash-rank, key), ties cannot flap between runs.
    """
    rank = F.expr(sample_rank_expr(key_cols, "spark", salt))
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(salt_partitions))
    order = [rank] + [F.col(c) for c in key_cols]
    w1 = Window.partitionBy(F.col(strata_col), bucket).orderBy(*order)
    pruned = (
        df.withColumn(_RANK, F.row_number().over(w1))
        .filter(F.col(_RANK) <= k_per_stratum)
        .drop(_RANK)
    )
    w2 = Window.partitionBy(strata_col).orderBy(*order)
    return (
        pruned.withColumn(_RANK, F.row_number().over(w2))
        .filter(F.col(_RANK) <= k_per_stratum)
        .drop(_RANK)
    )


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    fractions: dict[str, float],
    label_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment as a zero-shuffle projection.

    A row's label depends only on its key (and salt): append new data and
    existing rows never migrate between splits — the property that keeps a
    100 TB train/eval boundary stable across pipeline reruns.
    """
    return df.withColumn(label_col, F.expr(split_label_expr(key_cols, fractions, "spark", salt)))


def weighted_sample(
    df: DataFrame, key_cols: list[str], weight_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis &
    Spirakis 2006): top-k by ``u^(1/w)`` with ``u`` a hash-derived uniform.

    Ordering by ``ln(u)/w`` descending is the same total order without the
    pow — a single codegen projection feeding ``TakeOrderedAndProject``
    (per-partition k-row heaps, no full sort), so the plan is identical to
    ``hash_sample``'s.  P(row in sample) is proportional to weight in the
    without-replacement sense; rows with null, NaN or non-positive weight
    are excluded (Spark orders NaN ABOVE every number, so an unguarded NaN
    weight would pass ``w > 0`` and hijack the top of the sample).
    Deterministic in (data, salt) alone, like every sampler
    here — reruns and retries cannot flap the selected set.
    """
    from .textexpr import hash_uniform_expr

    u = F.expr(hash_uniform_expr(key_cols, "spark", salt))
    w = F.col(weight_col).cast("double")
    es_rank = F.log(u) / w
    return (
        df.filter(F.col(weight_col).isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn(_RANK, es_rank)
        .orderBy(F.desc(_RANK), *key_cols)
        .limit(k)
        .drop(_RANK)
    )


def priority_sample(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    k: int,
    salt: str = "",
    est_col: str = "est_weight",
) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup, JACM 2007): a fixed-size
    weighted sample that also carries an UNBIASED subset-sum estimator —
    the op a curation pipeline wants when it must answer "how many
    tokens/bytes does slice S hold?" from a k-row sample instead of a
    corpus scan.

    Each row gets priority ``q = w / u`` with ``u`` the hash-derived
    uniform in (0, 1]; the sample is the top-k by priority and
    ``est_col = max(w, tau)`` where ``tau`` is the (k+1)-th priority.
    For ANY fixed subset S, ``sum(est over sampled rows of S)`` is an
    exactly unbiased estimate of ``sum(w over S)`` — and with k+1 samples
    the variance is no worse than the optimal off-line scheme's (the
    paper's main theorem).  If the population has ≤ k qualifying rows,
    tau = 0 and every row reports its exact weight.

    Plan shape: one codegen projection (priority is a single division —
    no transcendentals, so the value is bit-identical on any
    IEEE-754 engine and the DuckDB oracle can check ``est_col`` exactly)
    feeding ``TakeOrderedAndProject`` with (k+1)-row per-partition heaps;
    the tau/rank pass is a window over the ≤ k+1 survivors, which are
    driver-scale by contract (same regime as ``weighted_sample``'s
    ``limit(k)``).  Deterministic in (data, salt) alone: partitioning,
    retries and cluster size cannot flap the sample or the estimates.
    Rows with null, NaN or non-positive weight are excluded (they can
    never be sampled and would poison tau — and Spark orders NaN ABOVE
    every number, so an unguarded NaN would pass ``w > 0`` and take a
    slot with a NaN estimate).

    Reference parity: like the rest of this module, no counterpart in
    guava-probably (SURVEY.md §2 pipeline tier); determinism discipline
    follows the frozen dual-dialect hash contract.
    """
    from .textexpr import hash_uniform_expr

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = F.expr(hash_uniform_expr(key_cols, "spark", salt))
    w = F.col(weight_col).cast("double")
    cand = (
        df.filter(F.col(weight_col).isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn(_RANK, w / u)
        .orderBy(F.desc(_RANK), *key_cols)
        .limit(k + 1)
    )
    # ≤ k+1 rows from here on: the unpartitioned windows are a single
    # driver-scale task by design, not an accident
    order = Window.orderBy(F.desc(_RANK), *[F.col(c) for c in key_cols])
    full = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = cand.withColumn("__gps_rn", F.row_number().over(order)).withColumn(
        "__gps_tau",
        F.when(F.count(F.lit(1)).over(full) == k + 1, F.min(_RANK).over(full)).otherwise(
            F.lit(0.0)
        ),
    )
    return (
        ranked.filter(F.col("__gps_rn") <= k)
        .withColumn(est_col, F.greatest(w, F.col("__gps_tau")))
        .drop(_RANK, "__gps_rn", "__gps_tau")
    )


def priority_sample_sql_duck(
    relation: str, key_cols: list[str], weight_col: str, k: int, salt: str = "", est_col: str = "est_weight"
) -> str:
    """Exact DuckDB oracle for :func:`priority_sample` — same hash uniform,
    same division, same tie order; ``est_col`` matches bit-for-bit because
    the arithmetic is one division and one max."""
    from .textexpr import hash_uniform_expr

    u = hash_uniform_expr(key_cols, "duck", salt)
    keys = ", ".join(key_cols)
    return (
        f"WITH pri AS (SELECT *, CAST({weight_col} AS DOUBLE) / {u} AS __p "
        f"FROM {relation} WHERE {weight_col} IS NOT NULL "
        f"AND NOT isnan(CAST({weight_col} AS DOUBLE)) "
        f"AND CAST({weight_col} AS DOUBLE) > 0), "
        f"r AS (SELECT *, row_number() OVER (ORDER BY __p DESC, {keys}) AS __rn, "
        f"count(*) OVER () AS __n FROM (SELECT * FROM pri ORDER BY __p DESC, {keys} LIMIT {k + 1})) "
        f"SELECT * EXCLUDE (__p, __rn, __n), "
        f"greatest(CAST({weight_col} AS DOUBLE), CASE WHEN __n = {k + 1} "
        f"THEN (SELECT min(__p) FROM r) ELSE 0.0 END) AS {est_col} "
        f"FROM r WHERE __rn <= {k}"
    )


def interleave_sources(
    df: DataFrame,
    source_col: str,
    weights: dict[str, int],
    key_cols: list[str],
    out_col: str = "mix_key",
    salt: str = "",
) -> DataFrame:
    """Deterministic data mixing: an integer sort key under which sources
    appear in proportion to their weights (stride scheduling).

    Rows are ranked within their source by hash (deterministic shuffle
    order), then ``mix_key = rank · (L / w_source)`` with L = lcm of the
    integer weights — consuming rows in ``(mix_key, source, rank)`` order
    yields every prefix with source proportions ≈ weights, exactly the
    curriculum/mixture guarantee a trainer wants, with no randomness to
    replay.  Unknown sources are dropped (explicit mixture contract).

    The per-source global rank is computed with a two-phase DETERMINISTIC
    bucket scheme — never a per-source ``Window``, which serializes each
    source's entire row set through a single task at 10^12-row scale:

      1. bucket = ``floor(hash_uniform · B)`` — a pure codegen function of
         the row, monotone in the md5 sort rank (the uniform IS the rank's
         leading 15 nibbles), so bucket order refines rank order;
      2. one NARROW counts pass (``groupBy(bucket, source).count()`` —
         column pruning reaches the scan, the text never moves) gives the
         per-(bucket, source) exclusive offsets, O(B·#sources) rows to the
         driver;
      3. a broadcast offset join + ``row_number`` over the PARALLEL
         (bucket, source) window — B × #sources bounded partitions, pure
         whole-stage codegen, the text crosses exactly one shuffle and
         never enters Python.

    Because the bucket is deterministic (no sampled RangePartitioner, no
    materialization barrier), the two passes agree by construction.  The
    key is exact integer (no float ordering), so the oracle and any re-run
    agree bit-for-bit.  Order by (mix_key, source, rank) downstream — or
    range-partition on mix_key to split the mixture into ordered shards.
    """
    import math

    from .textexpr import hash_uniform_expr

    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 or not isinstance(w, int) for w in weights.values()):
        raise ValueError(f"weights must be positive integers, got {weights}")
    lcm = math.lcm(*weights.values())
    spark = df.sparkSession
    n_buckets = spark.sparkContext.defaultParallelism * 4
    rank = F.expr(sample_rank_expr(key_cols, "spark", salt))
    u = F.expr(hash_uniform_expr(key_cols, "spark", salt))
    bucket = F.least(F.floor(u * n_buckets), F.lit(n_buckets - 1)).cast("int")
    base_df = (
        df.filter(F.col(source_col).isin(list(weights)))
        .withColumn("__gps_hr", rank)
        .withColumn("__gps_bk", bucket)
    )
    counts = (
        base_df.groupBy(F.col("__gps_bk").alias("bk"), F.col(source_col).alias("g"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    per_source: dict[str, int] = {}
    offsets: dict[tuple[int, str], int] = {}
    for r in sorted(counts, key=lambda r: (r.g, r.bk)):
        offsets[(r.bk, r.g)] = per_source.get(r.g, 0)
        per_source[r.g] = per_source.get(r.g, 0) + r.c
    # the join key column must carry the SOURCE column's own type (int
    # source ids are as legal as strings — a hardcoded string schema made
    # createDataFrame raise on them)
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    offs_schema = StructType(
        [
            StructField("__gps_obk", IntegerType()),
            StructField("__gps_g", df.schema[source_col].dataType),
            StructField("__gps_off", LongType()),
        ]
    )
    offs_df = F.broadcast(
        spark.createDataFrame(
            [(bk, g, off) for (bk, g), off in offsets.items()], offs_schema
        )
    )
    # parallel window: (bucket, source) has B × #sources partitions of
    # ~n/B rows each — no source ever sorts through a single task; the
    # broadcast offset join + row_number keep everything whole-stage
    # codegen (the text column crosses exactly ONE shuffle and never
    # enters Python)
    w = Window.partitionBy("__gps_bk", source_col).orderBy(
        F.col("__gps_hr"), *[F.col(c) for c in key_cols]
    )
    ranked = (
        base_df.join(
            offs_df,
            (F.col("__gps_bk") == F.col("__gps_obk"))
            & (F.col(source_col) == F.col("__gps_g")),
            "inner",
        )
        .drop("__gps_obk")
        .withColumn(
            "rank_in_source",
            F.row_number().over(w).cast("long") + F.col("__gps_off"),
        )
        .drop("__gps_hr", "__gps_bk", "__gps_g", "__gps_off")
    )
    stride = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(lcm // wt))
            for s, wt in weights.items()
        ]
    )
    return ranked.withColumn(out_col, F.col("rank_in_source") * stride)
