import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# arena-pinned malloc for the forked python workers (see bench.py header):
# avoids mmap/page-zeroing churn under this sandbox's THP compaction pressure
os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.warehouse.dir", "/tmp/gps-test-warehouse")
        .appName("gps-tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory):
    from guava_probably_spark.fixtures import write_transcripts_parquet

    p = tmp_path_factory.mktemp("fixtures") / "transcripts.parquet"
    write_transcripts_parquet(str(p), rows=10_000, seed=42)
    return str(p)
