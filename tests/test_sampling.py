"""Deterministic sampling operators (pipeline/sampling.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from guava_probably_spark.pipeline.sampling import (
    hash_sample,
    hash_split,
    hash_threshold_sample,
    stratified_sample,
)
from guava_probably_spark.pipeline.textexpr import sample_rank_expr, split_label_expr


def _ids(df, col="id"):
    return sorted(r[col] for r in df.select(col).collect())


def test_hash_sample_partition_invariant_and_exact_k(spark):
    base = spark.range(10_000)
    a = _ids(hash_sample(base.repartition(3), ["id"], 500))
    b = _ids(hash_sample(base.repartition(17), ["id"], 500))
    assert a == b
    assert len(a) == 500
    # uniformity sanity: the chosen ids should spread across the domain
    assert min(a) < 500 and max(a) > 9_500
    mean = sum(a) / len(a)
    assert 4_000 < mean < 6_000


def test_hash_sample_salt_decorrelates(spark):
    base = spark.range(10_000)
    a = set(_ids(hash_sample(base, ["id"], 500)))
    b = set(_ids(hash_sample(base, ["id"], 500, salt="s2")))
    overlap = len(a & b)
    # independent 5% samples: E[overlap] = 25, far from 500
    assert overlap < 100


def test_hash_sample_plan_is_take_ordered(spark):
    plan = hash_sample(spark.range(1000), ["id"], 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heap, no full sort


def test_hash_threshold_sample_fraction_and_determinism(spark):
    base = spark.range(40_000)
    a = _ids(hash_threshold_sample(base.repartition(5), ["id"], 0.1))
    b = _ids(hash_threshold_sample(base.repartition(13), ["id"], 0.1))
    assert a == b
    # Binomial(40000, 0.1): 3σ ≈ 180
    assert abs(len(a) - 4_000) < 300
    # threshold sample at fraction f is a superset-consistent prefix of ranks:
    # every row kept at 0.05 is kept at 0.1
    small = set(_ids(hash_threshold_sample(base, ["id"], 0.05)))
    assert small <= set(a)


def test_stratified_sample_exact_k_per_stratum(spark):
    df = spark.range(2_000).withColumn("s", (F.col("id") % 7).cast("string"))
    # one tiny stratum with 3 rows
    df = df.union(
        spark.range(3).select((F.col("id") + 10_000).alias("id"), F.lit("tiny").alias("s"))
    )
    out = stratified_sample(df, "s", ["id"], 50)
    counts = {r.s: r.c for r in out.groupBy("s").agg(F.count("*").alias("c")).collect()}
    for s in map(str, range(7)):
        assert counts[s] == 50
    assert counts["tiny"] == 3
    # partition invariance
    again = stratified_sample(df.repartition(11), "s", ["id"], 50)
    assert _ids(out) == _ids(again)


def test_hash_split_fractions_disjoint_and_stable(spark):
    df = spark.range(30_000)
    out = hash_split(df, ["id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 30_000
    assert abs(counts["train"] - 24_000) < 400
    assert abs(counts["val"] - 3_000) < 250
    # appending data never migrates existing rows: label is a pure key fn
    sub = hash_split(df.filter(F.col("id") < 1_000), ["id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    full_map = {r.id: r.split for r in out.filter(F.col("id") < 1_000).collect()}
    assert {r.id: r.split for r in sub.collect()} == full_map


def test_split_label_expr_rejects_bad_fractions():
    with pytest.raises(ValueError):
        split_label_expr(["id"], {"a": 0.5, "b": 0.4}, "spark")
    with pytest.raises(ValueError):
        hash_threshold_sample(None, ["id"], 1.5)


def test_sampling_dialect_parity(spark):
    """Spark and DuckDB compute the identical rank and split label."""
    pdf = spark.range(2_000).withColumn(
        "k", F.concat(F.lit("key-"), F.col("id").cast("string"))
    ).toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    for cols in (["id"], ["k"], ["id", "k"]):
        s_rank = sample_rank_expr(cols, "spark", salt="z")
        d_rank = sample_rank_expr(cols, "duck", salt="z")
        s_lab = split_label_expr(cols, {"train": 0.9, "test": 0.1}, "spark")
        d_lab = split_label_expr(cols, {"train": 0.9, "test": 0.1}, "duck")
        spark.createDataFrame(pdf).createOrReplaceTempView("t")
        a = spark.sql(f"SELECT id, {s_rank} r, {s_lab} l FROM t ORDER BY id").toPandas()
        b = con.execute(f"SELECT id, {d_rank} r, {d_lab} l FROM t ORDER BY id").fetchdf()
        assert (a["r"] == b["r"]).all() and (a["l"] == b["l"]).all()


def test_weighted_sample_inclusion_proportional_to_weight(spark):
    """ES weighted sampling: items with 10x weight appear ~10x as often
    across independent salts; deterministic per salt; excludes w<=0."""
    import pandas as pd

    from guava_probably_spark.pipeline.sampling import weighted_sample

    pdf = pd.DataFrame({"id": range(1_000)})
    pdf["w"] = [10.0 if i < 100 else 1.0 for i in pdf["id"]]
    pdf.loc[pdf.index[:3], "w"] = [0.0, -1.0, None]  # excluded rows
    df = spark.createDataFrame(pdf)

    heavy = light = 0
    for s in range(8):
        got = {r.id for r in weighted_sample(df, ["id"], "w", 100, salt=str(s)).collect()}
        assert len(got) == 100
        assert not (got & {0, 1, 2})
        again = {r.id for r in weighted_sample(df.repartition(9), ["id"], "w", 100, salt=str(s)).collect()}
        assert got == again
        heavy += len([i for i in got if i < 100])
        light += len([i for i in got if i >= 100])
    # 97 heavy (w=10) vs 900 light (w=1): heavy inclusion ~63%/item*... just
    # require a strong, stable separation: heavy rate >> light rate
    heavy_rate = heavy / (8 * 97)
    light_rate = light / (8 * 900)
    assert heavy_rate > 4 * light_rate
    assert heavy_rate > 0.4


def test_prefix_sum_matches_pandas_any_partitioning(spark):
    import numpy as np
    import pandas as pd

    from guava_probably_spark.pipeline.packing import prefix_sum

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"k": rng.permutation(20_000), "v": rng.integers(0, 50, 20_000)})
    pdf.loc[pdf.index[:5], "v"] = None  # nulls count as 0
    want = pdf.sort_values("k").assign(run=lambda d: d["v"].fillna(0).cumsum())
    expect = dict(zip(want["k"], want["run"].astype("int64")))
    df = spark.createDataFrame(pdf)
    for parts in (3, 16):
        got = {r.k: r.running for r in prefix_sum(df.repartition(7), ["k"], "v", partitions=parts).collect()}
        assert got == expect


def test_pack_sequences_bins_contiguous_and_budgeted(spark):
    import numpy as np
    import pandas as pd

    from guava_probably_spark.pipeline.packing import pack_sequences

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({"k": np.arange(5_000), "tok": rng.integers(1, 400, 5_000)})
    out = pack_sequences(spark.createDataFrame(pdf), ["k"], "tok", budget=2048).toPandas()
    out = out.sort_values("k").reset_index(drop=True)
    bins = out["bin"].to_numpy()
    assert (np.diff(bins) >= 0).all()  # contiguous runs of the order
    # every bin except possibly via its straddling last doc stays in budget:
    # the exclusive prefix within a bin is < budget by construction
    excl = out["tok"].cumsum() - out["tok"]
    assert ((excl - bins * 2048) < 2048).all() and ((excl - bins * 2048) >= 0).all()
    assert bins.max() > 100  # actually packed many bins


def test_concat_group_texts_preserves_per_turn_bytes(spark):
    """Flattening a synthetic transcripts table then re-splitting must give
    back every turn's exact text in (conv_id, turn_idx) order — the
    per-row integrity invariant through the flatten step."""
    from guava_probably_spark.pipeline.packing import concat_group_texts
    from guava_probably_spark.sources import synth_transcripts

    df = synth_transcripts(spark, 4_000, seed=42).repartition(7)
    flat = {r.conv_id: r.text for r in concat_group_texts(df, "conv_id", "turn_idx", "text", sep="\x1e").collect()}
    rows = df.select("conv_id", "turn_idx", "text").collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append((r.turn_idx, r.text))
    for conv, turns in by_conv.items():
        want = [t for _, t in sorted(turns)]
        assert flat[conv].split("\x1e") == want


def test_prefix_sum_edge_cases(spark):
    """More partitions than rows (empty partitions get zero offsets) and
    negative values both stay exact."""
    import pandas as pd

    from guava_probably_spark.pipeline.packing import prefix_sum

    pdf = pd.DataFrame({"k": range(10), "v": [5, -3, 0, 7, -7, 2, 2, -1, 9, -9]})
    got = {
        r.k: r.running
        for r in prefix_sum(spark.createDataFrame(pdf), ["k"], "v", partitions=64).collect()
    }
    want = dict(zip(pdf["k"], pdf["v"].cumsum()))
    assert got == want


def test_interleave_sources_proportions_and_determinism(spark):
    """Every prefix of the mixed order holds source proportions within one
    stride of exact; the key is deterministic under repartitioning."""
    import pandas as pd

    from guava_probably_spark.pipeline.sampling import interleave_sources

    rows = []
    for s, n in (("a", 4_000), ("b", 4_000), ("c", 4_000)):
        rows += [(s, f"{s}{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "src string, k string")
    weights = {"a": 3, "b": 2, "c": 1}
    out = interleave_sources(df, "src", weights, ["k"]).toPandas()
    out = out.sort_values(["mix_key", "src", "rank_in_source"]).reset_index(drop=True)
    for T in (600, 3_000, 6_000):
        prefix = out.head(T)["src"].value_counts()
        for s, w in weights.items():
            assert abs(prefix.get(s, 0) - T * w / 6) <= 3, (T, s)
    again = interleave_sources(df.repartition(13), "src", weights, ["k"]).toPandas()
    a = out[["src", "k", "mix_key"]].sort_values(["src", "k"]).reset_index(drop=True)
    b = again[["src", "k", "mix_key"]].sort_values(["src", "k"]).reset_index(drop=True)
    assert a.equals(b)
    # unknown sources are dropped; bad weights rejected
    df2 = df.union(spark.createDataFrame([("zz", "x")], "src string, k string"))
    assert interleave_sources(df2, "src", weights, ["k"]).filter("src = 'zz'").count() == 0
    import pytest

    with pytest.raises(ValueError):
        interleave_sources(df, "src", {"a": 0}, ["k"])


def test_interleave_sources_int_source_column(spark):
    """Source ids need not be strings (regression: the broadcast-offsets
    frame hardcoded a string schema and crashed on int source columns)."""
    from guava_probably_spark.pipeline.sampling import interleave_sources

    rows = [(s, f"{s}-{i}") for s in (1, 2) for i in range(500)]
    df = spark.createDataFrame(rows, "src int, k string")
    out = interleave_sources(df, "src", {1: 1, 2: 2}, ["k"]).toPandas()
    assert len(out) == 1_000
    counts = out["src"].value_counts()
    assert counts[1] == 500 and counts[2] == 500
    # proportions hold in a prefix of the mixed order
    prefix = out.sort_values("mix_key").head(300)["src"].value_counts()
    assert abs(prefix.get(2, 0) - 200) <= 3


# ---------------------------------------------------------------------------
# temperature_sample (multinomial source mixing, Xue et al. 2021 / mT5)
# ---------------------------------------------------------------------------

_SKEW_CASE = (
    "CASE WHEN id % 10 < 6 THEN 'a' WHEN id % 10 < 9 THEN 'b' ELSE 'c' END"
)


def _skewed(spark, n=5_000):
    # 60 / 30 / 10 % source split over spark.range — oracle-reproducible
    return spark.range(n).withColumn("src", F.expr(_SKEW_CASE))


def test_temperature_sample_matches_duckdb_all_exact_alphas(spark, tmp_path):
    from guava_probably_spark.pipeline.sampling import (
        temperature_sample,
        temperature_sample_sql_duck,
    )

    df = _skewed(spark)
    p = str(tmp_path / "skew.parquet")
    df.write.mode("overwrite").parquet(p)
    sub = f"read_parquet('{p}/*.parquet')"
    for alpha in (0.0, 0.5, 1.0):
        got = _ids(temperature_sample(df, "src", ["id"], 1_500, alpha=alpha, salt="tt"))
        sql = temperature_sample_sql_duck(
            sub, "src", ["id"], 1_500, alpha=alpha, salt="tt", select="id"
        )
        want = sorted(r[0] for r in duckdb.sql(sql).fetchall())
        assert got == want, alpha
        assert 0 < len(got) < 5_000


def test_temperature_sample_proportions_follow_alpha(spark):
    """α=1 → natural proportions; α=0 → equal per-source allocation
    (subject to caps); α=0.5 between. Binomial 4σ bands."""
    from guava_probably_spark.pipeline.sampling import (
        temperature_sample,
        temperature_thresholds,
    )

    df = _skewed(spark, 10_000)  # a=6000 b=3000 c=1000
    counts = {"a": 6_000, "b": 3_000, "c": 1_000}
    for alpha in (0.0, 0.5, 1.0):
        kept = temperature_sample(df, "src", ["id"], 3_000, alpha=alpha)
        by = {r[0]: r[1] for r in kept.groupBy("src").count().collect()}
        T = temperature_thresholds(counts, 3_000, alpha)
        for s, n in counts.items():
            exp = n * T[s] / 2**60
            sigma = max(1.0, (exp * max(0.0, 1 - exp / n)) ** 0.5)
            assert abs(by.get(s, 0) - exp) <= 4 * sigma, (alpha, s, by, exp)
    # α=1 keeps natural ratio: a-take ≈ 6x c-take; α=0 equalizes (c capped)
    t1 = temperature_thresholds(counts, 3_000, 1.0)
    assert abs(t1["a"] - t1["c"]) <= 1  # same keep fraction for every source
    t0 = temperature_thresholds(counts, 3_000, 0.0)
    assert t0["c"] == 2**60  # fair share 1000 = size → keep all


def test_temperature_sample_partition_invariant_and_null_source(spark):
    from guava_probably_spark.pipeline.sampling import temperature_sample

    df = _skewed(spark).withColumn(
        "src", F.when(F.col("id") % 97 == 0, None).otherwise(F.col("src"))
    )
    a = _ids(temperature_sample(df.repartition(3), "src", ["id"], 1_000))
    b = _ids(temperature_sample(df.repartition(17), "src", ["id"], 1_000))
    assert a == b
    assert not any(i % 97 == 0 for i in a)  # null-source rows dropped


def test_temperature_sample_cap_and_edges(spark):
    from guava_probably_spark.pipeline.sampling import (
        temperature_sample,
        temperature_thresholds,
        temperature_weights,
    )

    df = _skewed(spark, 1_000)
    # target >= total: every non-null-source row kept
    assert temperature_sample(df, "src", ["id"], 10_000).count() == 1_000
    # target 0: nothing kept
    assert temperature_sample(df, "src", ["id"], 0).count() == 0
    # empty input: empty output, no crash
    assert temperature_sample(df.filter("id < 0"), "src", ["id"], 10).count() == 0
    with pytest.raises(ValueError):
        temperature_thresholds({"a": 100}, -1)
    with pytest.raises(ValueError):
        temperature_weights({"a": 0}, 0.5)


def test_temperature_sample_general_alpha_spark_side(spark):
    """α outside {0, .5, 1} has no SQL oracle but must stay deterministic
    and monotone: flatter α gives the small source a larger share."""
    from guava_probably_spark.pipeline.sampling import (
        temperature_sample,
        temperature_sample_sql_duck,
    )

    df = _skewed(spark, 10_000)
    takes = {}
    for alpha in (0.3, 0.7):
        kept = temperature_sample(df, "src", ["id"], 2_000, alpha=alpha)
        by = {r[0]: r[1] for r in kept.groupBy("src").count().collect()}
        takes[alpha] = by
        again = {
            r[0]: r[1]
            for r in temperature_sample(df.repartition(9), "src", ["id"], 2_000, alpha=alpha)
            .groupBy("src")
            .count()
            .collect()
        }
        assert by == again
    assert takes[0.3]["c"] > takes[0.7]["c"]
    assert takes[0.3]["a"] < takes[0.7]["a"]
    with pytest.raises(ValueError):
        temperature_sample_sql_duck("t", "src", ["id"], 10, alpha=0.3)


def test_priority_sample_matches_duckdb_oracle_bit_exact(spark):
    """Sample set AND est_weight match DuckDB bit-for-bit: the priority is
    one division on a bit-identical hash uniform, the estimate one max."""
    import pandas as pd

    from guava_probably_spark.pipeline.sampling import (
        priority_sample,
        priority_sample_sql_duck,
    )

    pdf = pd.DataFrame({"id": range(2_000)})
    pdf["w"] = (pdf["id"] % 37 + 1).astype("int64")
    df = spark.createDataFrame(pdf)
    got = {
        r.id: r.est_weight
        for r in priority_sample(df, ["id"], "w", 150, salt="ps").collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    sql = priority_sample_sql_duck("t", ["id"], "w", 150, salt="ps")
    want = {r[0]: r[2] for r in con.execute(sql).fetchall()}
    assert len(got) == 150
    assert got == want  # exact double equality, not approx


def test_priority_sample_partition_invariant_and_threshold_semantics(spark):
    """Repartitioning cannot flap the sample or the estimates; every
    estimate is >= both the row's weight and tau's floor semantics
    (est == w exactly for rows whose weight clears tau)."""
    import pandas as pd

    from guava_probably_spark.pipeline.sampling import priority_sample

    pdf = pd.DataFrame({"id": range(3_000)})
    pdf["w"] = (pdf["id"] % 11 + 1).astype("float64")
    df = spark.createDataFrame(pdf)
    a = sorted(
        (r.id, r.est_weight)
        for r in priority_sample(df.repartition(3), ["id"], "w", 200).collect()
    )
    b = sorted(
        (r.id, r.est_weight)
        for r in priority_sample(df.repartition(23), ["id"], "w", 200).collect()
    )
    assert a == b and len(a) == 200
    ests = [e for _, e in a]
    ws = dict(zip(pdf["id"], pdf["w"]))
    tau = min(ests)  # every estimate is max(w, tau) so min(est) == tau here
    for i, e in a:
        assert e == max(ws[i], tau)


def test_priority_sample_small_population_reports_exact_weights(spark):
    """n <= k: tau = 0, every qualifying row comes back with its exact
    weight (the estimator degenerates to the true subset sum); NaN and
    non-positive weights are excluded (the pandas None lands as NaN in a
    float64 column, and Spark orders NaN above every number — an
    unguarded NaN weight would hijack a slot; regression for the
    ~isnan guard)."""
    import pandas as pd

    from guava_probably_spark.pipeline.sampling import priority_sample

    pdf = pd.DataFrame(
        {"id": [1, 2, 3, 4, 5], "w": [2.0, 7.0, None, 0.0, -3.0]}
    )
    out = priority_sample(spark.createDataFrame(pdf), ["id"], "w", 10).collect()
    assert {r.id: r.est_weight for r in out} == {1: 2.0, 2: 7.0}


def test_priority_sample_unbiased_subset_sum():
    """The DLT estimator property itself (math, not the hash): over random
    uniforms, E[sum of est over sampled members of S] = sum of w over S.
    Vectorized simulation, tolerance ~5 sigma of the observed spread."""
    import numpy as np

    rng = np.random.default_rng(7)
    w = np.array([1.0, 1.0, 2.0, 3.0, 5.0, 8.0, 13.0, 21.0])
    n, k, trials = len(w), 3, 200_000
    u = rng.random((trials, n))
    pri = w / u
    # tau = (k+1)-th largest priority per trial
    part = np.partition(pri, n - k - 1, axis=1)
    tau = part[:, n - k - 1]
    in_sample = pri > tau[:, None]  # top-k (ties have measure zero)
    est = np.maximum(w[None, :], tau[:, None]) * in_sample
    for subset in ([0, 1], [4, 5, 6], list(range(n))):
        s = np.asarray(subset)
        sums = est[:, s].sum(axis=1)
        truth = w[s].sum()
        se = sums.std(ddof=1) / np.sqrt(trials)
        assert abs(sums.mean() - truth) < 5 * se + 1e-9
