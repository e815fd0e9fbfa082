"""Streaming sketch tests: file-source micro-batches → windowed sketch state
(applyInPandasWithState) and incremental foreachBatch sink."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from guava_probably_spark.sketches import Sketch, SketchSpec
from guava_probably_spark.streaming import incremental_sketch_sink, windowed_sketch_stream

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


@pytest.fixture()
def stream_dir(spark, transcripts_path, tmp_path):
    """Stage the transcripts fixture as two separate files arriving in order."""
    src = spark.read.parquet(transcripts_path)
    staged = str(tmp_path / "staged")
    src.repartition(2).write.mode("overwrite").parquet(staged)
    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    files = sorted(glob.glob(f"{staged}/part-*.parquet"))
    return incoming, files


def test_windowed_sketch_stream(spark, stream_dir, tmp_path):
    incoming, files = stream_dir
    shutil.copy(files[0], incoming)

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL).parquet(incoming)
    )
    # watermark wider than the fixture's whole time span: this test checks
    # per-window accuracy with NO late drops (the unordered two-file replay
    # makes old-window rows arrive "late"); late-drop semantics are covered
    # by test_windowed_stream_drops_late_data_past_watermark
    out = windowed_sketch_stream(
        stream, "ts", "conv_id", SketchSpec("hll", {"p": 12}), window="1 day",
        watermark="3650 days",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_sketches")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        shutil.copy(files[1], incoming)  # second micro-batch
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM win_sketches"
        ).collect()
    finally:
        q.stop()
    assert rows
    # latest emission per window vs exact distinct per window on full data
    latest = {}
    for r in rows:
        latest[r.window_start] = r  # memory sink appends; later rows win
    full = spark.read.parquet(incoming)
    exact = {
        r.w: r.d
        for r in full.select(
            F.window("ts", "1 day").getField("start").alias("w"), "conv_id"
        )
        .groupBy("w")
        .agg(F.countDistinct("conv_id").alias("d"))
        .collect()
    }
    assert set(latest) == set(exact)
    checked = 0
    for w, row in latest.items():
        sk = Sketch.from_bytes(bytes(row.sketch))
        d = exact[w]
        assert abs(sk.estimate() - d) / max(d, 1) <= sk.relative_error_bound() + 0.02
        checked += 1
    assert checked >= 2  # multiple event-time windows exercised


def test_incremental_sketch_sink(spark, stream_dir, tmp_path):
    incoming, files = stream_dir
    state = str(tmp_path / "hll.blob")
    stream = spark.readStream.schema(TRANSCRIPT_DDL).parquet(incoming)
    writer = incremental_sketch_sink(
        stream, "conv_id", SketchSpec("hll", {"p": 13}), state
    )
    q = writer.option("checkpointLocation", str(tmp_path / "ck2")).start()
    try:
        shutil.copy(files[0], incoming)
        q.processAllAvailable()
        shutil.copy(files[1], incoming)
        q.processAllAvailable()
    finally:
        q.stop()
    with open(state, "rb") as f:
        sk = Sketch.from_bytes(f.read())
    exact = (
        spark.read.parquet(incoming).select(F.countDistinct("conv_id").alias("c")).collect()[0].c
    )
    assert abs(sk.estimate() - exact) / exact <= sk.relative_error_bound()


def test_streaming_dedup_bloom_fingerprints(spark, sf_dir, tmp_path):
    """Docs arrive in two micro-batches with overlap: every fingerprint is
    emitted exactly once across batches (bloom zero-FN ⇒ no dup survives a
    replay; fpp bounds the over-drop)."""
    import glob as _glob
    import shutil as _shutil

    from guava_probably_spark.streaming.dedup import dedup_stream_sink

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    # batch 1: doc_id < 30; batch 2: doc_id 20..49 (10 overlapping texts)
    staged = str(tmp_path / "staged")
    docs.filter("doc_id < 30").coalesce(1).write.parquet(staged + "/b1")
    docs.filter("doc_id >= 20 AND doc_id < 50").coalesce(1).write.parquet(staged + "/b2")
    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    state = str(tmp_path / "bloom.state")
    seen: list = []

    stream = spark.readStream.schema("doc_id long, text string").parquet(incoming)
    q = dedup_stream_sink(
        stream,
        state,
        capacity=10_000,
        on_batch=lambda df, bid: seen.extend((r.doc_id, r.text) for r in df.collect()),
        query_name="dedup_test",
    )
    try:
        for b in ("b1", "b2"):
            for f in _glob.glob(f"{staged}/{b}/part-*.parquet"):
                _shutil.copy(f, incoming + f"/{b}.parquet")
            q.processAllAvailable()
    finally:
        q.stop()
    texts_emitted = [t for _, t in seen]
    norm = lambda t: " ".join(t.lower().split())
    # no normalized text emitted twice
    normed = [norm(t) for t in texts_emitted]
    assert len(normed) == len(set(normed))
    # every distinct text of the union was emitted (capacity 10k, fpp 1e-3:
    # expected over-drop ~0 on 50 docs; deterministic given the seeded hash)
    want = {norm(r.text) for r in docs.filter("doc_id < 50").collect()}
    assert set(normed) == want
    # state survived: a THIRD batch replaying b1 emits nothing
    from guava_probably_spark.streaming.dedup import dedup_batch_incremental

    replay = dedup_batch_incremental(
        spark.read.parquet(staged + "/b1"), state, capacity=10_000
    )
    assert replay.count() == 0


def test_session_sketch_stream(spark, tmp_path):
    """Session windows (inactivity gap): two keys with known event times in
    batch 1; a far-future event in batch 2 advances the watermark past
    last_event + gap, so batch 3 fires the timeouts and emits both closed
    sessions with correct bounds, counts and sketch estimates."""
    import pandas as pd

    from guava_probably_spark.streaming import session_sketch_stream

    t0 = pd.Timestamp("2024-03-01 10:00:00")

    def mk(rows, path):
        pdf = pd.DataFrame(rows, columns=["conv_id", "ts", "tool"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)

    staged = str(tmp_path / "staged")
    mk(
        [
            ("A", t0, "bash"),
            ("A", t0 + pd.Timedelta(minutes=2), "edit"),
            ("A", t0 + pd.Timedelta(minutes=4), "bash"),
            ("B", t0 + pd.Timedelta(minutes=1), "grep"),
        ],
        staged + "/b1",
    )
    # far-future sentinel: advances the watermark way past both sessions
    mk([("C", t0 + pd.Timedelta(hours=10), "x")], staged + "/b2")
    mk([("C", t0 + pd.Timedelta(hours=11), "y")], staged + "/b3")

    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    stream = spark.readStream.schema("conv_id string, ts timestamp, tool string").parquet(
        incoming
    )
    out = session_sketch_stream(
        stream, "conv_id", "ts", "tool", SketchSpec("hll", {"p": 10}),
        gap="10 minutes", watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .start()
    )
    try:
        for b in ("b1", "b2", "b3"):
            for f in glob.glob(f"{staged}/{b}/part-*.parquet"):
                shutil.copy(f, incoming + f"/{b}.parquet")
            q.processAllAvailable()
        rows = {r.conv_id: r for r in spark.sql("SELECT * FROM sessions").collect()}
    finally:
        q.stop()
    assert "A" in rows and "B" in rows  # both sessions closed by the timeout
    a = rows["A"]
    assert a.n == 3
    assert a.session_start == t0.to_pydatetime()
    assert a.session_end == (t0 + pd.Timedelta(minutes=4)).to_pydatetime()
    sk = Sketch.from_bytes(bytes(a.sketch))
    assert round(sk.estimate()) == 2  # bash, edit
    b = rows["B"]
    assert b.n == 1 and round(Sketch.from_bytes(bytes(b.sketch)).estimate()) == 1


def test_windowed_stream_drops_late_data_past_watermark(spark, tmp_path):
    """Late-data semantics: an event older than (max event time - watermark)
    arriving in a later micro-batch must NOT update its window's sketch."""
    import pandas as pd

    t0 = pd.Timestamp("2024-04-01 00:30:00")

    def mk(rows, path):
        pdf = pd.DataFrame(rows, columns=["conv_id", "ts"])
        pdf["turn_idx"] = 0
        pdf["role"] = "user"
        pdf["text"] = "x"
        pdf["tool"] = ""
        spark.createDataFrame(
            pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        ).coalesce(1).write.mode("overwrite").parquet(path)

    staged = str(tmp_path / "staged")
    mk([("a", t0), ("b", t0 + pd.Timedelta(minutes=5))], staged + "/b1")
    # advance watermark far past window(t0) + delay
    mk([("c", t0 + pd.Timedelta(hours=30))], staged + "/b2")
    # LATE: new conv for the t0 window, arriving after the watermark passed it
    mk([("late_conv", t0 + pd.Timedelta(minutes=1))], staged + "/b3")
    mk([("d", t0 + pd.Timedelta(hours=31))], staged + "/b4")

    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    stream = spark.readStream.schema(TRANSCRIPT_DDL).parquet(incoming)
    out = windowed_sketch_stream(
        stream, "ts", "conv_id", SketchSpec("hll", {"p": 10}),
        window="1 hour", watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_late"))
        .start()
    )
    try:
        for b in ("b1", "b2", "b3", "b4"):
            for f in glob.glob(f"{staged}/{b}/part-*.parquet"):
                shutil.copy(f, incoming + f"/{b}.parquet")
            q.processAllAvailable()
        rows = spark.sql("SELECT * FROM late_test").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:
        latest[r.window_start] = r
    w0 = pd.Timestamp("2024-04-01 00:00:00").to_pydatetime()
    first_window = latest[min(latest)]
    # the late event never reached the state: count stays 2, estimate ~2
    assert first_window.n == 2
    sk = Sketch.from_bytes(bytes(first_window.sketch))
    assert round(sk.estimate()) == 2


def test_session_stream_ignores_late_event_after_close(spark, tmp_path):
    """A late event for an already-closed session must not resurrect it —
    exactly one emitted session per key despite the late replay."""
    import pandas as pd

    from guava_probably_spark.streaming import session_sketch_stream

    t0 = pd.Timestamp("2024-03-05 08:00:00")

    def mk(rows, path):
        pdf = pd.DataFrame(rows, columns=["conv_id", "ts", "tool"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)

    staged = str(tmp_path / "staged")
    mk([("A", t0, "bash"), ("A", t0 + pd.Timedelta(minutes=3), "edit")], staged + "/b1")
    mk([("C", t0 + pd.Timedelta(hours=10), "x")], staged + "/b2")  # advance watermark
    mk([("C", t0 + pd.Timedelta(hours=11), "y")], staged + "/b3")  # close A
    # LATE event for A, far behind the watermark
    mk([("A", t0 + pd.Timedelta(minutes=4), "grep")], staged + "/b4")
    mk([("C", t0 + pd.Timedelta(hours=12), "z")], staged + "/b5")

    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    stream = spark.readStream.schema("conv_id string, ts timestamp, tool string").parquet(
        incoming
    )
    out = session_sketch_stream(
        stream, "conv_id", "ts", "tool", SketchSpec("hll", {"p": 10}),
        gap="10 minutes", watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ls"))
        .start()
    )
    try:
        for b in ("b1", "b2", "b3", "b4", "b5"):
            for f in glob.glob(f"{staged}/{b}/part-*.parquet"):
                shutil.copy(f, incoming + f"/{b}.parquet")
            q.processAllAvailable()
        rows = [r for r in spark.sql("SELECT * FROM late_sessions").collect() if r.conv_id == "A"]
    finally:
        q.stop()
    assert len(rows) == 1  # the late event neither extended nor re-opened it
    assert rows[0].n == 2


def test_windowed_stream_generic_over_sketch_kinds(spark, stream_dir, tmp_path):
    """The streaming state machinery is kind-generic: a Misra-Gries
    heavy-hitter stream and a CMS stream produce per-window sketches whose
    decoded answers match batch-built sketches over the same rows."""
    import pandas as pd

    incoming, files = stream_dir
    for i, f in enumerate(files):
        shutil.copy(f, incoming + f"/mgk{i}.parquet")

    for kind, params in (("mg", {"k": 32}), ("cms", {"epsilon": 0.01, "delta": 0.01})):
        stream = spark.readStream.schema(TRANSCRIPT_DDL).parquet(incoming)
        out = windowed_sketch_stream(
            stream, "ts", "role", SketchSpec(kind, params), window="1 day",
            watermark="3650 days",
        )
        name = f"win_{kind}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ck_{kind}"))
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql(f"SELECT * FROM {name}").collect()
        finally:
            q.stop()
        assert rows
        batch = spark.read.parquet(incoming)
        for r in rows:
            sk = Sketch.from_bytes(bytes(r.sketch))
            day = pd.Timestamp(r.window_start)
            want = (
                batch.filter(
                    (F.col("ts") >= F.lit(day)) & (F.col("ts") < F.lit(day + pd.Timedelta(days=1)))
                )
                .groupBy("role")
                .count()
                .collect()
            )
            truth = {w.role: w["count"] for w in want}
            n = sum(truth.values())
            for role, c in truth.items():
                est = (
                    float(sk.estimate([role])[0])
                    if kind == "cms"
                    else sk.estimate_count(role)
                )
                if kind == "cms":
                    assert c <= est <= c + 0.01 * n + 1
                else:
                    # MG bracketing: c - n/(k+1) <= counter <= c
                    assert c - n / 33 - 1 <= est <= c


def test_windowed_dd_stream_value_bound(spark, stream_dir, tmp_path):
    """The streaming window operator is sketch-generic: a DDSketch spec
    yields per-window RELATIVE-error quantiles, and each window's final
    emission is byte-identical to a batch DD build over that window's rows
    (DD merge/ingest are order-insensitive, so incremental micro-batch
    state == one-shot build)."""
    import numpy as np

    from guava_probably_spark.sketches.dd import DDSketch

    incoming, files = stream_dir
    shutil.copy(files[0], incoming)
    stream = spark.readStream.schema(TRANSCRIPT_DDL).parquet(incoming)
    out = windowed_sketch_stream(
        stream, "ts", "turn_idx", SketchSpec("dd", {"alpha": 0.01}),
        window="1 day", watermark="3650 days",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_dd")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .start()
    )
    try:
        q.processAllAvailable()
        shutil.copy(files[1], incoming)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM win_dd").collect()
    finally:
        q.stop()
    assert rows
    latest = {}
    for r in rows:
        latest[r.window_start] = r
    full = spark.read.parquet(incoming)
    for w, r in latest.items():
        vals = np.array(
            [
                x.turn_idx
                for x in full.filter(
                    F.window("ts", "1 day").getField("start") == w
                ).collect()
            ],
            dtype=np.float64,
        )
        ref = DDSketch(0.01)
        ref.update(vals)
        assert r.sketch == ref.to_bytes() and r.n == len(vals)
        sk = Sketch.from_bytes(r.sketch)
        srt = np.sort(vals)
        for qq in (0.5, 0.99):
            est = sk.quantile(qq)
            true = srt[int(qq * (len(srt) - 1))]
            assert abs(est - true) <= 0.01 * abs(true) * (1 + 1e-9)


def test_windowed_mg_stream_heavy_hitters(spark, stream_dir, tmp_path):
    """Streaming heavy hitters: an MG spec through the same windowed
    operator yields per-window top items whose [c, c+e] brackets contain
    the exact per-window counts (the Misra–Gries guarantee survives the
    incremental micro-batch state because MG merge is the mergeable-
    summaries fold)."""
    incoming, files = stream_dir
    shutil.copy(files[0], incoming)
    stream = spark.readStream.schema(TRANSCRIPT_DDL).parquet(incoming)
    out = windowed_sketch_stream(
        stream, "ts", "tool", SketchSpec("mg", {"k": 64}),
        window="1 day", watermark="3650 days",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_mg")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_mg"))
        .start()
    )
    try:
        q.processAllAvailable()
        shutil.copy(files[1], incoming)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM win_mg").collect()
    finally:
        q.stop()
    assert rows
    latest = {}
    for r in rows:
        latest[r.window_start] = r
    full = spark.read.parquet(incoming)
    for w, r in latest.items():
        sk = Sketch.from_bytes(r.sketch)
        exact = {
            x.tool: x.c
            for x in full.filter(
                F.window("ts", "1 day").getField("start") == w
            )
            .filter(F.col("tool").isNotNull())
            .groupBy("tool")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        n = sum(exact.values())
        assert r.n == n
        assert sk.e <= n // (64 + 1) + 1
        for item, c in sk.counters.items():
            assert c <= exact[item] <= c + sk.e, (w, item)


def test_incremental_shll_sink_sliding_windows(spark, stream_dir, tmp_path):
    """Live sliding-distinct counter: the stream folds into ONE shll blob;
    after replay, any trailing window queried from the blob matches the
    exact windowed COUNT(DISTINCT) within bound — and the blob is
    byte-identical to a batch build over the same rows (restart-safety of
    the canonical merge)."""
    from guava_probably_spark.operators import collect_weighted_sketch

    incoming, files = stream_dir
    state = str(tmp_path / "shll.blob")
    stream = spark.readStream.schema(TRANSCRIPT_DDL).parquet(incoming).withColumn(
        "ts_epoch", F.col("ts").cast("timestamp").cast("long")
    )
    writer = incremental_sketch_sink(
        stream,
        "conv_id",
        SketchSpec("shll", {"p": 13}),
        state,
        weight_col="ts_epoch",
    )
    q = writer.option("checkpointLocation", str(tmp_path / "ck_shll")).start()
    try:
        shutil.copy(files[0], incoming)
        q.processAllAvailable()
        shutil.copy(files[1], incoming)
        q.processAllAvailable()
    finally:
        q.stop()
    with open(state, "rb") as f:
        sk = Sketch.from_bytes(f.read())
    all_rows = spark.read.parquet(incoming).withColumn(
        "ts_epoch", F.col("ts").cast("timestamp").cast("long")
    )
    batch = collect_weighted_sketch(
        all_rows, "conv_id", "ts_epoch", SketchSpec("shll", {"p": 13})
    )[0]
    assert sk.to_bytes() == batch.to_bytes()
    lo, hi = all_rows.agg(F.min("ts_epoch"), F.max("ts_epoch")).collect()[0]
    w = max((hi - lo) // 2, 1)
    exact = (
        all_rows.filter(F.col("ts_epoch") >= hi - w)
        .select(F.countDistinct("conv_id").alias("c"))
        .collect()[0]
        .c
    )
    est = sk.estimate_window(w)
    assert abs(est - exact) <= max(sk.relative_error_bound() * exact, 3.0)


def test_incremental_sink_qf_replay_idempotent(spark, stream_dir, tmp_path):
    """Quotient filter through the incremental sink: the running blob
    answers membership with zero FN over everything streamed, and —
    because the canonical set-union merge is IDEMPOTENT — re-merging a
    replayed micro-batch leaves the state byte-identical (the
    restart-safety story for the byte-canonical kinds, checked for real)."""
    incoming, files = stream_dir
    state = str(tmp_path / "qf.blob")
    stream = spark.readStream.schema(TRANSCRIPT_DDL).parquet(incoming)
    writer = incremental_sketch_sink(
        stream, "conv_id", SketchSpec("qf", {"capacity": 200_000, "fpp": 0.01}), state
    )
    q = writer.option("checkpointLocation", str(tmp_path / "ckq")).start()
    try:
        shutil.copy(files[0], incoming)
        q.processAllAvailable()
        shutil.copy(files[1], incoming)
        q.processAllAvailable()
    finally:
        q.stop()
    with open(state, "rb") as f:
        blob = f.read()
    sk = Sketch.from_bytes(blob)
    convs = [
        r.conv_id for r in spark.read.parquet(incoming).select("conv_id").distinct().collect()
    ]
    assert sk.might_contain_batch(convs).all()  # zero FN over the stream
    # replay idempotence: folding batch 1 in again changes nothing
    from guava_probably_spark.operators import collect_sketch

    batch1 = spark.read.schema(TRANSCRIPT_DDL).parquet(files[0])
    part, _, _ = collect_sketch(
        batch1, "conv_id", SketchSpec("qf", {"capacity": 200_000, "fpp": 0.01})
    )
    sk.merge(part)
    assert sk.to_bytes() == blob
