"""Windowed sketches: merge-prefix running distinct (operators/window.py).

Oracle: pandas groupby-cumsum of first-occurrence indicators — the textbook
exact running distinct — compared row-for-row against the distributed
operator; the HLL estimate column is checked against the per-prefix bound.
"""

import os

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from guava_probably_spark.operators import running_distinct

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _exact_running(pdf, key, order, col):
    pdf = pdf.sort_values([key, order], kind="mergesort").reset_index(drop=True)
    first = ~pdf.duplicated([key, col])
    pdf["run_exact"] = first.astype("int64").groupby(pdf[key], sort=False).cumsum()
    return pdf


def test_running_distinct_matches_pandas_exact(spark):
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    out = running_distinct(
        events, "user_id", "ts", "event_type", p=12, carry=["event_id"]
    ).toPandas()
    exp = _exact_running(
        events.select("user_id", "ts", "event_id", "event_type").toPandas(),
        "user_id",
        "ts",
        "event_type",
    )
    merged = exp.merge(out, on=["user_id", "event_id"], suffixes=("", "_got"))
    assert len(merged) == len(exp) == len(out)
    assert (merged["run_exact"].to_numpy() == merged["run_distinct"].to_numpy()).all()
    # merge-prefix HLL estimate within bound at every prefix (LC regime slack)
    err = np.abs(merged["estimate"].to_numpy() - merged["run_exact"].to_numpy())
    bound = np.maximum(3 * 1.04 / np.sqrt(2**12) * merged["run_exact"].to_numpy(), 3.0)
    assert (err <= bound).all()


def test_running_distinct_final_row_equals_group_distinct(spark):
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    out = running_distinct(events, "user_id", "ts", "event_type", p=12)
    last = (
        out.groupBy("user_id")
        .agg(F.max("run_distinct").alias("final"))
        .toPandas()
        .set_index("user_id")["final"]
    )
    exact = (
        events.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("d"))
        .toPandas()
        .set_index("user_id")["d"]
    )
    assert last.sort_index().equals(exact.sort_index().astype("int64"))


def test_running_distinct_partition_invariant(spark):
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    a = (
        running_distinct(events, "user_id", "ts", "event_type", p=12, partitions=2)
        .orderBy("user_id", "ts")
        .toPandas()
    )
    b = (
        running_distinct(
            events.repartition(13), "user_id", "ts", "event_type", p=12, partitions=7
        )
        .orderBy("user_id", "ts")
        .toPandas()
    )
    assert (a["run_distinct"].to_numpy() == b["run_distinct"].to_numpy()).all()
    # merge-prefix register state is partitioning-independent → estimates equal
    assert np.allclose(a["estimate"].to_numpy(), b["estimate"].to_numpy())


def test_running_distinct_nulls_pass_through_uncounted(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 3,
            "o": [1, 2, 3, 4, 1, 2, 3],
            "v": ["x", None, "x", "y", None, "p", "p"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        running_distinct(df, "k", "o", "v", p=8)
        .orderBy("k", "o")
        .toPandas()
    )
    assert out["run_distinct"].tolist() == [1, 1, 1, 2, 0, 1, 1]


def test_running_distinct_plan_single_exchange(spark):
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    out = running_distinct(events, "user_id", "ts", "event_type", p=12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the repartition(key); sort is partition-local


def test_sessionize_batch_known_sessions(spark):
    """operators.sessionize: hand-crafted timeline with known session breaks."""
    import pandas as pd

    from guava_probably_spark.operators import sessionize

    t0 = pd.Timestamp("2024-06-01 09:00:00")
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 2,
            "ts": [
                t0,
                t0 + pd.Timedelta(minutes=10),
                t0 + pd.Timedelta(minutes=50),  # > 30m gap -> new session
                t0 + pd.Timedelta(minutes=55),
                t0 + pd.Timedelta(hours=3),     # new session
                t0,
                t0 + pd.Timedelta(minutes=29),  # within gap
            ],
        }
    )
    out = (
        sessionize(spark.createDataFrame(pdf), "k", "ts", gap="30 minutes")
        .orderBy("k", "ts")
        .toPandas()
    )
    assert out[out.k == "a"]["session_id"].tolist() == [0, 0, 1, 1, 2]
    assert out[out.k == "b"]["session_id"].tolist() == [0, 0]


def test_grouped_quantiles_matches_numpy_reference(spark):
    """operators.grouped_quantiles: nearest-rank (ceil(qn)-1) per key equals
    a direct numpy computation, including duplicate-heavy groups."""
    import numpy as np
    import pandas as pd

    from guava_probably_spark.operators import grouped_quantiles

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 50, 20_000)
    vals = np.round(rng.normal(100, 20, 20_000), 1)
    vals[keys == 7] = 5.0  # an all-duplicates group
    df = spark.createDataFrame(pd.DataFrame({"k": keys, "v": vals}))
    out = grouped_quantiles(df, "k", "v", qs=(0.1, 0.5, 0.9)).toPandas().set_index("k")
    for k in range(50):
        sv = np.sort(vals[keys == k])
        n = len(sv)
        for q, colname in ((0.1, "q10"), (0.5, "q50"), (0.9, "q90")):
            idx = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
            assert out.loc[k, colname] == sv[idx], (k, q)
        assert out.loc[k, "n"] == n


def test_grouped_mode_matches_pandas_with_ties(spark):
    """operators.grouped_mode: winner and deterministic tie-break (smallest
    value) against a pandas reference, including engineered ties."""
    import numpy as np
    import pandas as pd

    from guava_probably_spark.operators import grouped_mode

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 40, 10_000)
    vals = np.array([f"t{v}" for v in rng.integers(0, 6, 10_000)])
    # engineered exact tie in group 0: equal counts of "zz" and "aa"
    keys = np.concatenate([keys, np.full(8, 40)])
    vals = np.concatenate([vals, np.array(["zz", "aa"] * 4)])
    df = spark.createDataFrame(pd.DataFrame({"k": keys, "v": vals}))
    out = grouped_mode(df, "k", "v").toPandas().set_index("k")
    pdf = pd.DataFrame({"k": keys, "v": vals})
    for k, grp in pdf.groupby("k"):
        counts = grp["v"].value_counts()
        mc = counts.max()
        expect = min(c for c, n in counts.items() if n == mc)
        assert out.loc[k, "top_value"] == expect, k
        assert out.loc[k, "top_count"] == mc
        assert out.loc[k, "n"] == len(grp)
    assert out.loc[40, "top_value"] == "aa"  # tie broken to smallest


def test_quantile_trim_exact_matches_pandas(spark):
    """Per-group p90 trim keeps exactly the rows a pandas nearest-rank
    reference keeps, for both tails, under any partitioning."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from guava_probably_spark.operators.grouped_quantiles import quantile_trim

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 13, 5000).astype(str),
            "v": np.round(rng.lognormal(3, 1, 5000), 3),
            "rid": np.arange(5000),
        }
    )
    df = spark.createDataFrame(pdf).repartition(9)

    def ref_threshold(s):
        a = np.sort(s.to_numpy())
        return a[max(0, int(np.ceil(0.9 * len(a))) - 1)]  # nearest-rank

    th = pdf.groupby("g")["v"].apply(ref_threshold)
    expect_below = set(pdf[pdf["v"] <= pdf["g"].map(th)]["rid"])
    got_below = {r.rid for r in quantile_trim(df, "g", "v", 0.9).select("rid").collect()}
    assert got_below == expect_below
    got_above = {r.rid for r in quantile_trim(df, "g", "v", 0.9, keep="above").select("rid").collect()}
    assert got_above == set(pdf["rid"]) - expect_below


def test_quantile_trim_kll_close_to_exact(spark):
    """The sketch path keeps a set within KLL rank-error of the exact trim."""
    import numpy as np
    import pandas as pd

    from guava_probably_spark.operators.grouped_quantiles import quantile_trim

    rng = np.random.default_rng(11)
    n = 20_000
    pdf = pd.DataFrame(
        {"g": rng.integers(0, 4, n).astype(str), "v": rng.normal(0, 1, n), "rid": np.arange(n)}
    )
    df = spark.createDataFrame(pdf).repartition(8)
    exact = {r.rid for r in quantile_trim(df, "g", "v", 0.5).select("rid").collect()}
    approx = {r.rid for r in quantile_trim(df, "g", "v", 0.5, method="kll").select("rid").collect()}
    # symmetric difference bounded by rank error (3*1.33/k per group tail)
    eps = 3 * 1.33 / 200
    assert len(exact ^ approx) <= 2 * eps * n + 64


def test_running_distinct_null_before_empty_string(spark):
    """ADVICE r1 regression: a null row preceding a genuine empty-string
    value in the same key group must not consume ''s first-occurrence slot.
    Old sentinel-fill code yielded run_distinct [0,0,1] for [null,'','x']."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b"],
            "o": [1, 2, 3, 1, 2],
            "v": [None, "", "x", "", None],
        }
    )
    out = (
        running_distinct(spark.createDataFrame(pdf), "k", "o", "v", p=6)
        .orderBy("k", "o")
        .collect()
    )
    assert [r.run_distinct for r in out] == [0, 1, 2, 1, 1]


def test_sessionize_subsecond_gap_precision(spark):
    """Timestamps keep microsecond precision: a whole-second floor made
    sub-second gaps degenerate (gap < 1s split same-session events in
    different wall-clock seconds) and boundary calls off by up to ~1 s."""
    import datetime as dt

    from guava_probably_spark.operators import sessionize

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("u", base + dt.timedelta(milliseconds=ms))
        for ms in (0, 900, 1800, 5000)  # 0.9s gaps, then a 3.2s gap
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = {r.ts: r.session_id for r in sessionize(df, "k", "ts", gap="1 second").collect()}
    sids = [out[base + dt.timedelta(milliseconds=ms)] for ms in (0, 900, 1800, 5000)]
    # 0.9s <= 1s keeps the first three together; 3.2s starts session 1
    assert sids == [0, 0, 0, 1]
    out2 = sessionize(df, "k", "ts", gap="500 milliseconds")
    sids2 = [r.session_id for r in out2.orderBy("ts").collect()]
    assert sids2 == [0, 1, 2, 3]  # every 0.9s gap exceeds 500ms


def test_running_distinct_binary_values_with_nulls(spark):
    """Binary is a supported funnel type everywhere; the window kernel used
    to fill nulls with 0 (invalid for binary) and crash in-kernel."""
    from guava_probably_spark.operators import running_distinct

    rows = [
        ("k", i, bytes([i % 3]) if i % 4 else None) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k string, o int, v binary")
    out = running_distinct(df, "k", "o", "v", p=12).orderBy("o").collect()
    # nulls never count; 3 distinct byte values total
    assert out[-1].run_distinct == 3
    assert out[0].run_distinct == (0 if rows[0][2] is None else 1)


def test_running_distinct_rejects_bad_p_and_reserved_carry(spark):
    from guava_probably_spark.operators import running_distinct

    df = spark.createDataFrame([("k", 1, "x")], "k string, o int, v string")
    import pytest

    with pytest.raises(ValueError, match="precision"):
        running_distinct(df, "k", "o", "v", p=64)
    with pytest.raises(ValueError, match="collides"):
        running_distinct(df, "k", "o", "v", carry=["estimate"])
