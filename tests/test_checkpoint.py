"""Resumability (SURVEY.md §5.2.6): kill after a partial wave, restart,
assert identical final blob + zero re-computation on a clean resume."""

import pytest
from pyspark.sql import functions as F

from guava_probably_spark.operators import (
    build_with_checkpoint,
    checkpoint_metrics,
    collect_sketch,
    job_lineage,
    list_input_files,
)
from guava_probably_spark.sketches import SketchSpec


@pytest.fixture(scope="module")
def multi_file_input(spark, transcripts_path, tmp_path_factory):
    """Re-write the transcripts fixture as 8 parquet part files."""
    out = str(tmp_path_factory.mktemp("ck") / "transcripts8")
    spark.read.parquet(transcripts_path).repartition(8).write.mode("overwrite").parquet(out)
    return out


def test_checkpoint_resume_identical_blob(spark, multi_file_input, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck") / "partials")
    spec = SketchSpec("hll", {"p": 13})
    files = list_input_files(spark, multi_file_input)
    assert len(files) == 8

    # simulated kill: first run covers only 5 of 8 files
    sk_partial, st1 = build_with_checkpoint(
        spark, multi_file_input, "conv_id", spec, ck, files_limit=5
    )
    assert st1.recomputed == 5 and st1.reused == 0

    # restart: only the 3 missing files are recomputed
    sk_full, st2 = build_with_checkpoint(spark, multi_file_input, "conv_id", spec, ck)
    assert st2.reused == 5 and st2.recomputed == 3
    assert st2.total_files == 8

    # second restart: nothing recomputed, blob identical
    sk_again, st3 = build_with_checkpoint(spark, multi_file_input, "conv_id", spec, ck)
    assert st3.recomputed == 0 and st3.reused == 8
    assert sk_again.to_bytes() == sk_full.to_bytes()

    # and the checkpointed result equals the non-checkpointed distributed build
    direct, n, _ = collect_sketch(spark.read.parquet(multi_file_input), "conv_id", spec)
    assert sk_full.to_bytes() == direct.to_bytes()
    assert st2.rows == n


def test_checkpoint_lineage_isolation(spark, multi_file_input, tmp_path_factory):
    """A different spec must not reuse another job's partials."""
    ck = str(tmp_path_factory.mktemp("ck") / "partials2")
    a = SketchSpec("hll", {"p": 12})
    b = SketchSpec("hll", {"p": 13})
    assert job_lineage(a, "conv_id") != job_lineage(b, "conv_id")
    _, st_a = build_with_checkpoint(spark, multi_file_input, "conv_id", a, ck)
    _, st_b = build_with_checkpoint(spark, multi_file_input, "conv_id", b, ck)
    assert st_a.recomputed == 8 and st_b.recomputed == 8  # no cross-reuse

    m = checkpoint_metrics(spark, ck)
    assert m.count() == 16
    row = m.first()
    assert row.secs > 0 and row.n > 0 and row.bytes > 0


def test_corrupt_checkpoint_row_heals_to_clean_result(spark, tmp_path):
    """Flip bytes inside one checkpointed sketch blob on disk: the next run
    must detect it (uniform ValueError decode contract), rebuild only that
    file, and produce a blob byte-equal to an uncorrupted run."""
    import glob as _glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from guava_probably_spark.operators import build_with_checkpoint

    src = str(tmp_path / "src")
    spark.range(20_000).repartition(6).write.parquet(src)
    spec = SketchSpec("hll", {"p": 12})

    ck_clean = str(tmp_path / "ck_clean")
    clean, _ = build_with_checkpoint(spark, src, "id", spec, ck_clean)

    ck = str(tmp_path / "ck_corrupt")
    build_with_checkpoint(spark, src, "id", spec, ck)
    part = sorted(_glob.glob(f"{ck}/part-*.parquet"))[0]
    t = pq.read_table(part)
    blobs = t.column("sketch").to_pylist()
    blobs[0] = bytes(blobs[0][: len(blobs[0]) // 2])  # torn write: truncation
    cols = {name: t.column(name) for name in t.column_names}
    cols["sketch"] = pa.array(blobs, type=pa.binary())
    pq.write_table(pa.table(cols), part)
    # drop the ChecksumFileSystem sidecar or Spark rejects the rewritten file
    crc = os.path.join(os.path.dirname(part), f".{os.path.basename(part)}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    healed, stats = build_with_checkpoint(spark, src, "id", spec, ck)
    assert healed.to_bytes() == clean.to_bytes()

def test_duplicate_checkpoint_rows_do_not_double_count(spark, tmp_path):
    """The same file checkpointed twice (overlapping waves after a restart
    race) must count once: the resume reduce keeps one decodable row per
    file, so the final blob and row count are unchanged."""
    src = str(tmp_path / "src")
    spark.range(10_000).repartition(4).write.parquet(src)
    spec = SketchSpec("hll", {"p": 12})

    ck = str(tmp_path / "ck_dup")
    first, st1 = build_with_checkpoint(spark, src, "id", spec, ck)
    # duplicate every checkpoint row wholesale
    dup = spark.read.parquet(ck)
    dup.write.mode("append").parquet(ck)

    again, st2 = build_with_checkpoint(spark, src, "id", spec, ck)
    assert st2.recomputed == 0
    assert again.to_bytes() == first.to_bytes()
    assert st2.rows == st1.rows == 10_000


def test_checkpoint_resume_dd_value_sketch(spark, multi_file_input, tmp_path_factory):
    """Resumability holds for the value-sketch tier too: a killed DD build
    resumes from per-file partials and the final blob is byte-identical to
    the one-shot distributed build (DD merge is order-insensitive, so even
    the partial/recomputed mix can't perturb the bytes)."""
    ck = str(tmp_path_factory.mktemp("ck") / "partials_dd")
    spec = SketchSpec("dd", {"alpha": 0.01})
    sk_partial, st1 = build_with_checkpoint(
        spark, multi_file_input, "turn_idx", spec, ck, files_limit=5
    )
    assert st1.recomputed == 5 and st1.reused == 0
    sk_full, st2 = build_with_checkpoint(spark, multi_file_input, "turn_idx", spec, ck)
    assert st2.reused == 5 and st2.recomputed == 3
    direct, n, _ = collect_sketch(
        spark.read.parquet(multi_file_input), "turn_idx", spec
    )
    assert sk_full.to_bytes() == direct.to_bytes()
    assert st2.rows == n and sk_full.n == n
