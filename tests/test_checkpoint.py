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
