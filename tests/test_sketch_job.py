"""The spark-submit sketch CLI (jobs/sketch_job.py) — subprocess smokes of
the global, grouped, and checkpointed build paths, with blob round-trips."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tmp_path, *args, input_path=None):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "sketch_job.py"),
         "--input", input_path or "/root/testdata/sf0.001/events.parquet",
         *args],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "PYSPARK_SUBMIT_ARGS":
             "--master local[2] --conf spark.ui.enabled=false pyspark-shell"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_sketch_job_global_hll_blob_roundtrip(tmp_path):
    from guava_probably_spark.sketches import Sketch

    blob_path = str(tmp_path / "hll.bin")
    s = _run(tmp_path, "--col", "user_id", "--kind", "hll",
             "--param", "p=12", "--output", blob_path)
    assert s["rows"] == 1000
    sk = Sketch.from_bytes(open(blob_path, "rb").read())
    assert abs(sk.estimate() - s["estimate"]) < 1e-9
    assert abs(sk.estimate() - 15) <= 15 * sk.relative_error_bound()


def test_sketch_job_bottomk_witness_sample(tmp_path):
    from guava_probably_spark.sketches import Sketch

    blob_path = str(tmp_path / "bk.bin")
    s = _run(tmp_path, "--col", "user_id", "--kind", "bottomk",
             "--param", "k=64", "--output", blob_path)
    sk = Sketch.from_bytes(open(blob_path, "rb").read())
    # sf0.001 events has 15 distinct users — below saturation the sample
    # IS the distinct set, straight out of a spark-submit blob
    assert sorted(sk.sample()) == list(range(15))
    assert s["rows"] == 1000


def test_sketch_job_grouped_build(tmp_path):
    out_dir = str(tmp_path / "grouped")
    s = _run(tmp_path, "--col", "user_id", "--kind", "theta",
             "--param", "k=256", "--key", "event_type", "--output", out_dir)
    assert s["groups"] == 5
    import pyarrow.parquet as pq

    t = pq.read_table(out_dir)
    assert set(t.column_names) >= {"event_type", "sketch", "n"}
    assert t.num_rows == 5


def test_sketch_job_tuple_weighted_build(tmp_path):
    """--kind tuple --value-col: distinct-key value totals from the CLI.
    sf0.001 events is far below k=1024 saturation, so the blob's
    sum_estimate is the EXACT sum of event_id over all rows (every user
    retained with its full sum)."""
    from guava_probably_spark.sketches import Sketch

    blob_path = str(tmp_path / "tuple.bin")
    s = _run(tmp_path, "--col", "user_id", "--kind", "tuple",
             "--param", "k=1024", "--value-col", "event_id",
             "--output", blob_path)
    sk = Sketch.from_bytes(open(blob_path, "rb").read())
    assert s["rows"] == 1000
    assert sk.estimate() == 15.0  # 15 distinct users, exact below saturation
    assert sk.sum_estimate() == float(sum(range(1000)))  # exact Σ event_id
    assert abs(s["sum_estimate"] - sk.sum_estimate()) < 1e-9
