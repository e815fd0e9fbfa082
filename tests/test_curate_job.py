"""The spark-submit curation CLI (jobs/curate_job.py) — one subprocess
smoke per fast op; the slow ops (dedup, decontaminate) are covered by
their operator tests and the session's spark-submit runs."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tmp_path, *args):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate_job.py"),
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(tmp_path / "out"), *args],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "PYSPARK_SUBMIT_ARGS":
             "--master local[2] --conf spark.ui.enabled=false pyspark-shell"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_curate_job_split_and_sample(tmp_path):
    s = _run(tmp_path, "--op", "split", "--fractions", "train=0.8,val=0.1,test=0.1")
    assert s["input_rows"] == s["output_rows"] == 500

    s = _run(tmp_path, "--op", "sample", "--k", "50")
    assert s["output_rows"] == 50


def test_curate_job_histogram_and_quality(tmp_path):
    s = _run(tmp_path, "--op", "histogram", "--bins", "8")
    assert s["output_rows"] <= 8  # duplicate splits may collapse

    s = _run(tmp_path, "--op", "histogram", "--bins", "4", "--stratify", "source")
    assert s["output_rows"] >= 4  # ≥ bins per source dimension

    s = _run(tmp_path, "--op", "quality")  # self-scored LM typicality
    assert s["input_rows"] == s["output_rows"] == 500


def test_curate_job_ngram_decontaminate(tmp_path):
    # train == input → every doc with ≥ n tokens flags as contaminated
    s = _run(
        tmp_path,
        "--op", "ngram-decontaminate",
        "--train", "/root/testdata/sf0.001/documents.parquet",
        "--n", "5", "--threshold", "0.9",
    )
    assert s["output_rows"] == 500
    assert s["contaminated_rows"] >= 450  # only sub-5-token docs escape


def test_curate_job_boilerplate_and_overlap(tmp_path):
    s = _run(tmp_path, "--op", "boilerplate", "--min-docs", "2")
    # line removal never adds docs; NULL-text docs pass through
    assert 0 < s["output_rows"] <= s["input_rows"] == 500

    s = _run(tmp_path, "--op", "overlap", "--stratify", "source", "--sketch-k", "256")
    # sf0.001 documents has a small source dimension: C(n_sources, 2) pairs
    assert s["output_rows"] >= 1


def test_sketchlib_zip_ships_every_module():
    """The committed --py-files artifact must contain every current
    package module — a stale zip means spark-submit ImportErrors for
    operators that pass every local test (bit round 3: dd/kmeans/overlap
    were missing until scripts/package.py was re-run). Name parity only
    (byte equality would nag on every edit before repackaging). The zip is
    an untracked build artifact (.gitignore) — build it fresh when a clean
    checkout lacks it; when one exists, its contents are what is checked,
    so a stale artifact still fails."""
    import zipfile

    zip_path = os.path.join(REPO, "sketchlib.zip")
    if not os.path.exists(zip_path):
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        try:
            import package as _package

            _package.build(zip_path)
        finally:
            sys.path.pop(0)
    zipped = {
        n for n in zipfile.ZipFile(zip_path).namelist()
        if n.endswith(".py")
    }
    on_disk = set()
    pkg_root = os.path.join(REPO, "guava_probably_spark")
    for root, _, names in os.walk(pkg_root):
        for name in names:
            if name.endswith(".py"):
                on_disk.add(
                    os.path.relpath(os.path.join(root, name), REPO).replace(os.sep, "/")
                )
    missing = on_disk - zipped
    assert not missing, f"re-run scripts/package.py — zip is missing {sorted(missing)}"


def test_curate_job_dsir(tmp_path):
    s = _run(
        tmp_path,
        "--op", "dsir",
        "--train", "/root/testdata/sf0.001/documents.parquet",
        "--k", "50",
    )
    assert s["output_rows"] == 50


def test_curate_job_c4(tmp_path):
    # the sf fixture text has no punctuation (no page would pass the
    # 3-sentence gate), so build a tiny corpus with real sentence structure
    import duckdb

    inp = str(tmp_path / "c4_in.parquet")
    duckdb.sql(
        "COPY (SELECT i AS doc_id, CASE WHEN i % 2 = 0 THEN "
        "'First full sentence with words here. ' || chr(10) || "
        "'Second full sentence with words here! ' || chr(10) || "
        "'Third full sentence with words here?' "
        "ELSE 'no punctuation here at all' END AS text "
        "FROM range(20) t(i)) TO '" + inp + "' (FORMAT PARQUET)"
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate_job.py"),
         "--input", inp, "--output", str(tmp_path / "out"), "--op", "c4"],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "PYSPARK_SUBMIT_ARGS":
             "--master local[2] --conf spark.ui.enabled=false pyspark-shell"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    s = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert s["input_rows"] == 20 and s["output_rows"] == 10


def test_curate_job_profile(tmp_path):
    # one-scan column profile of sf0.001 documents: one output row per
    # profilable column, both full-table and --stratify-narrowed
    s = _run(tmp_path, "--op", "profile")
    assert s["input_rows"] == 500
    assert s["output_rows"] >= 3  # doc_id, source, text at minimum

    s = _run(tmp_path, "--op", "profile", "--stratify", "doc_id,source")
    assert s["output_rows"] == 2


def test_curate_job_freeze(tmp_path):
    s = _run(tmp_path, "--op", "freeze", "--id", "doc_id", "--shards", "8")
    # one row per non-empty shard, each carrying an XOR-filter blob
    assert 1 <= s["output_rows"] <= 8
