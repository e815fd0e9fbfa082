"""Corpus integrity digests (pipeline/integrity.py): one-scan multiset
equality with a bit-exact DuckDB twin, plus the exceptAll drill-down."""

import duckdb
import pytest

import pyspark.sql.functions as F

from guava_probably_spark.pipeline.integrity import (
    DIGEST_MOD,
    corpus_diff,
    corpus_digest,
    corpus_digest_sql_duck,
    digest_u60_expr,
    grouped_digest,
)

COLS = ["conv_id", "turn_idx", "text"]


@pytest.fixture(scope="module")
def turns(spark, transcripts_path):
    return spark.read.parquet(transcripts_path).select(*COLS)


def _dig(df):
    r = corpus_digest(df, COLS).collect()[0]
    return r.digest, r.n


def test_digest_order_and_partition_invariant(turns):
    base = _dig(turns)
    assert base == _dig(turns.repartition(13))
    assert base == _dig(turns.orderBy(F.desc("text")))
    assert 0 <= base[0] < DIGEST_MOD


def test_digest_detects_every_corruption_class(spark, turns):
    base, n = _dig(turns)

    # one character edited in one turn of 10k
    edited = turns.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == turns.first().conv_id) & (F.col("turn_idx") == 0),
            F.concat(F.col("text"), F.lit("!")),
        ).otherwise(F.col("text")),
    )
    de, ne = _dig(edited)
    assert ne == n and de != base  # same cardinality, different digest

    # two turns swap positions (texts intact, ordering broken)
    c = turns.first().conv_id
    swapped = turns.withColumn(
        "turn_idx",
        F.when((F.col("conv_id") == c) & (F.col("turn_idx") == 0), 1)
        .when((F.col("conv_id") == c) & (F.col("turn_idx") == 1), 0)
        .otherwise(F.col("turn_idx")),
    )
    ds, ns = _dig(swapped)
    assert ns == n and ds != base

    # a dropped row and a duplicated row
    dropped = turns.limit(int(n) - 1)
    assert _dig(dropped) != (base, n)
    dup = turns.unionAll(turns.limit(1))
    dd, nd = _dig(dup)
    assert nd == n + 1 and dd != base


def test_digest_null_empty_and_framing_unambiguous(spark):
    mk = lambda rows: spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    d_null = _dig(mk([("c", 0, None)]))
    d_empty = _dig(mk([("c", 0, "")]))
    d_n = _dig(mk([("c", 0, "n")]))
    assert len({d_null, d_empty, d_n}) == 3
    # boundary shift between adjacent fields cannot collide
    a = _dig(mk([("ab", 1, "c")]))
    b = _dig(mk([("a", 1, "bc")]))
    assert a != b


def test_digest_salt_decorrelates(turns):
    d1 = corpus_digest(turns, COLS, salt="").collect()[0].digest
    d2 = corpus_digest(turns, COLS, salt="v2").collect()[0].digest
    assert d1 != d2


def test_digest_bit_exact_duckdb_parity(turns, transcripts_path):
    spark_row = corpus_digest(turns, COLS, salt="par").collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{transcripts_path}')"
    )
    duck = con.execute(corpus_digest_sql_duck("t", COLS, salt="par")).fetchone()
    assert (spark_row.digest, spark_row.n) == duck


def test_grouped_digest_rolls_up_to_global(turns):
    per_conv = grouped_digest(turns, ["conv_id"], COLS).collect()
    total = sum(r.digest for r in per_conv) % DIGEST_MOD
    g = corpus_digest(turns, COLS).collect()[0]
    assert total == g.digest
    assert sum(r.n for r in per_conv) == g.n


def test_corpus_diff_finds_the_changed_rows(spark, turns):
    c = turns.first().conv_id
    edited = turns.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == c) & (F.col("turn_idx") == 0),
            F.lit("TAMPERED"),
        ).otherwise(F.col("text")),
    )
    diff = corpus_diff(turns, edited, COLS).collect()
    assert len(diff) == 2
    sides = {r.side: r for r in diff}
    assert sides["a"].conv_id == c and sides["b"].text == "TAMPERED"
    assert corpus_diff(turns, turns, COLS).count() == 0


def test_digest_expr_spark_duck_row_level_parity(spark):
    """The per-row u60 values themselves are bit-identical — the digest
    parity above is not a sum coincidence."""
    df = spark.createDataFrame(
        [("a", 1, "hello"), ("b", 2, None), ("c", 3, "")],
        "conv_id string, turn_idx int, text string",
    )
    sv = [
        r.h
        for r in df.select(
            F.expr(digest_u60_expr(COLS, "spark")).alias("h")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('a', 1, 'hello'), "
        "('b', 2, NULL), ('c', 3, '')) AS v(conv_id, turn_idx, text)"
    )
    dv = [
        r[0]
        for r in con.execute(
            f"SELECT {digest_u60_expr(COLS, 'duck')} FROM t"
        ).fetchall()
    ]
    assert sv == dv


def test_transcript_integrity_fixture_is_clean(spark, transcripts_path):
    from guava_probably_spark.pipeline.integrity import transcript_integrity

    t = spark.read.parquet(transcripts_path)
    rep = transcript_integrity(t)
    bad = rep.filter(
        "NOT idx_ok OR NOT ts_monotone OR NOT tool_tagged OR null_texts > 0"
    ).count()
    assert bad == 0
    assert rep.count() == t.select("conv_id").distinct().count()


def test_transcript_integrity_flags_each_violation_class(spark, transcripts_path):
    from guava_probably_spark.pipeline.integrity import transcript_integrity

    t = spark.read.parquet(transcripts_path)
    # pick a conversation with >= 3 turns to corrupt
    victim = (
        t.groupBy("conv_id").count().filter("count >= 3").first().conv_id
    )
    is_v = F.col("conv_id") == victim

    # drop a middle turn -> idx gap in exactly that conv
    gapped = t.filter(~(is_v & (F.col("turn_idx") == 1)))
    rep = {r.conv_id: r for r in transcript_integrity(gapped).collect()}
    assert not rep[victim].idx_ok
    assert all(r.idx_ok for c, r in rep.items() if c != victim)

    # time travel on one turn -> ts_monotone false there only
    warped = t.withColumn(
        "ts",
        F.when(is_v & (F.col("turn_idx") == 1), F.to_timestamp(F.lit("1999-01-01"))
        ).otherwise(F.col("ts")),
    )
    rep = {r.conv_id: r for r in transcript_integrity(warped).collect()}
    assert not rep[victim].ts_monotone
    assert all(r.ts_monotone for c, r in rep.items() if c != victim)

    # tool name on a non-tool turn -> tool_tagged false
    mistagged = t.withColumn(
        "tool",
        F.when(is_v & (F.col("turn_idx") == 0) & (F.col("role") != "tool"),
               F.lit("bash")).otherwise(F.col("tool")),
    )
    rep = {r.conv_id: r for r in transcript_integrity(mistagged).collect()}
    assert not rep[victim].tool_tagged

    # emptied text counts
    blanked = t.withColumn(
        "text", F.when(is_v & (F.col("turn_idx") == 0), F.lit("")).otherwise(F.col("text"))
    )
    rep = {r.conv_id: r for r in transcript_integrity(blanked).collect()}
    assert rep[victim].null_texts == 1


def test_transcript_integrity_single_shuffle_plan(spark, transcripts_path):
    """Window and groupBy both partition on conv_id, so Catalyst satisfies
    the aggregation's distribution requirement with the window's exchange:
    the whole validation is exactly ONE shuffle."""
    from guava_probably_spark.pipeline.integrity import transcript_integrity

    t = spark.read.parquet(transcripts_path)
    plan = transcript_integrity(t)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
