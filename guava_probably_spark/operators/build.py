"""Distributed sketch build: mapInArrow partials + treeAggregate-style merge.

THE load-bearing design decision (SURVEY.md §3.4): PySpark pandas GROUPED_AGG
UDAFs perform NO partial aggregation — a naive pandas UDAF would shuffle all
raw rows (10^12 turns at design scale). Instead:

  scan → select(col) → mapInArrow(build partial per partition)   [no shuffle]
  → repartition(P/fanin) → mapInArrow(merge)  … repeated         [shuffles
    only sketch blobs, KB-sized]
  → driver merges the ≤fanin survivors

Raw data is scanned exactly once and never shuffled.  Column pruning pushes
through mapInArrow because we select the hashed column first (verified by
plans.assert_no_raw_shuffle / tests).

Grouped (per-key) sketches use the two-phase salted pattern
(BASELINE.json:14 "skew handled explicitly"): groupBy(key, salt) partials →
groupBy(key) merge, so a hot conv_id is built by `salt` tasks in parallel and
merged, instead of serializing on one task.
"""

from __future__ import annotations

import math
import time
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from ..sketches import Sketch, SketchSpec

PARTIAL_SCHEMA = "sketch binary, n bigint, overflow bigint, part_id bigint, secs double"
_PARTIAL_ARROW = pa.schema(
    [
        ("sketch", pa.binary()),
        ("n", pa.int64()),
        ("overflow", pa.int64()),
        ("part_id", pa.int64()),
        ("secs", pa.float64()),
    ]
)


def _merge_into(acc: Sketch, other: Sketch, dedup: bool = True) -> int:
    """Merge other into acc; returns overflow count (cuckoo only).
    ``dedup`` is the cuckoo merge semantics (see CuckooSketch.merge_counted)
    and must match the build's ``dedup_build`` — a multiset (delete-capable)
    build merged with set-union would collapse copies split across
    partitions."""
    from ..sketches import CuckooSketch

    if isinstance(acc, CuckooSketch):
        _, overflow = acc.merge_counted(other, dedup=dedup)
        return overflow
    acc.merge(other)
    return 0


def _spec_dedup(spec: SketchSpec) -> bool:
    """The cuckoo build/merge dedup semantics a spec asks for (True unless
    the spec opts into multiset delete-workflow builds)."""
    return bool(spec.params.get("dedup_build", True))


_FOLD_DECODE_THREADS = 8
_FOLD_DECODE_MIN_ROWS = 8


def fold_sketch_rows(rows, dedup: bool = True) -> tuple[Sketch | None, int, int]:
    """THE sketch-row fold: (blob-or-Sketch, n, overflow) triples →
    (merged sketch | None, total n, total overflow). Every partial/driver
    merge loop in the library goes through here so overflow accounting has
    one definition. ``dedup`` follows the build's semantics (_spec_dedup).

    Decode runs in a small thread pool when there are enough blob rows:
    ``Sketch.from_bytes`` is dominated by ``zlib.decompress`` + numpy
    buffer work, both of which release the GIL — measured 5× on the
    headline job's driver fold (64 × ~1 MB bloom partials: 1.1 s → 0.2 s).
    Merge order is unchanged (decode is pure; the sequential fold below
    consumes decoded sketches in the input order)."""
    rows = list(rows) if not isinstance(rows, list) else rows
    blob_count = sum(1 for r in rows if not isinstance(r[0], Sketch))
    blob_bytes = sum(
        len(r[0]) for r in rows if isinstance(r[0], (bytes, bytearray))
    )
    # pool spin-up (~1 ms) must not tax small folds — rolling_merge folds
    # ≤window KB-blobs PER OUTPUT ROW through here
    if blob_count >= _FOLD_DECODE_MIN_ROWS and blob_bytes >= 4_000_000:
        from concurrent.futures import ThreadPoolExecutor

        def decode(r):
            blob, cnt, ov = r
            sk = blob if isinstance(blob, Sketch) else Sketch.from_bytes(blob)
            return sk, cnt, ov

        with ThreadPoolExecutor(max_workers=_FOLD_DECODE_THREADS) as pool:
            rows = list(pool.map(decode, rows))
    acc: Sketch | None = None
    n = 0
    overflow = 0
    for blob, cnt, ov in rows:
        sk = blob if isinstance(blob, Sketch) else Sketch.from_bytes(blob)
        if acc is None:
            acc = sk
        else:
            overflow += _merge_into(acc, sk, dedup=dedup)
        n += cnt
        overflow += ov
    return acc, n, overflow


def _ingest_overflow(sk: Sketch, column) -> int:
    """One column batch into ``sk`` via the distributed-build path: hash
    once + set-semantics ingest for hash sketches (funnel bound), raw
    update for value sketches. Returns the capacity-overflow count — a
    cuckoo insert can FAIL at capacity, and dropping that count on the
    build path would be a silent false negative, so it flows into the
    partial's overflow column (bloom bits can't overflow; estimators
    never fail)."""
    from ..sketches.base import FUNNEL_NONE, FUNNEL_PREHASHED, hash_column

    ingest = getattr(sk, "ingest_hashes", None)
    if sk.funnel in (FUNNEL_NONE, FUNNEL_PREHASHED) or ingest is None:
        # FUNNEL_PREHASHED: the column already IS the 64-bit hash stream
        # (JVM xxhash64) — update() derives (h1, h2) from it; murmur3
        # re-hashing here would silently change the register domain
        sk.update(column)
        return 0
    _, h1, h2 = hash_column(column, sk.funnel)
    return int(ingest(h1, h2) or 0)


def build_partials(df: DataFrame, col: str, spec: SketchSpec) -> DataFrame:
    """One partial sketch row per input partition; raw rows never shuffle."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        t0 = time.monotonic()
        sk = spec.create()
        n = 0
        overflow = 0
        first = True
        for batch in batches:
            column = batch.column(0)
            if first:
                _bind_funnel(sk, column)
                first = False
            overflow += _ingest_overflow(sk, column)
            n += len(column) - column.null_count
        if n == 0:
            return
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        yield pa.RecordBatch.from_pydict(
            {
                "sketch": [sk.to_bytes()],
                "n": [n],
                "overflow": [overflow],
                "part_id": [pid],
                "secs": [time.monotonic() - t0],
            },
            schema=_PARTIAL_ARROW,
        )

    return df.select(col).mapInArrow(fn, PARTIAL_SCHEMA)


def _bind_funnel(sk: Sketch, column: pa.Array) -> None:
    """Auto-bind a hashed sketch's funnel to the column's arrow type on first
    batch (string → UTF8 funnel, int → LONG funnel)."""
    from ..sketches.base import FUNNEL_LONG, FUNNEL_NONE, FUNNEL_PREHASHED, FUNNEL_UTF8

    if sk.funnel in (FUNNEL_NONE, FUNNEL_PREHASHED):
        # value sketch: nothing to bind; prehashed: the int column is the
        # hash stream, NOT a FUNNEL_LONG key column — rebinding would
        # murmur3 the hashes and break byte-parity with the JVM prehash path
        return
    if pa.types.is_integer(column.type):
        sk.funnel = FUNNEL_LONG
    elif pa.types.is_string(column.type) or pa.types.is_large_string(column.type):
        sk.funnel = FUNNEL_UTF8
    elif pa.types.is_binary(column.type) or pa.types.is_large_binary(column.type):
        sk.funnel = FUNNEL_UTF8


def _merge_stage(dedup: bool = True):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        t0 = time.monotonic()
        acc, n, overflow = fold_sketch_rows(
            (
                (blob, cnt, ov)
                for batch in batches
                for blob, cnt, ov in zip(
                    batch.column(0).to_pylist(),
                    batch.column(1).to_pylist(),
                    batch.column(2).to_pylist(),
                )
            ),
            dedup=dedup,
        )
        if acc is None:
            return
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        yield pa.RecordBatch.from_pydict(
            {
                "sketch": [acc.to_bytes()],
                "n": [n],
                "overflow": [overflow],
                "part_id": [pid],
                "secs": [time.monotonic() - t0],
            },
            schema=_PARTIAL_ARROW,
        )

    return fn


def tree_merge(partials: DataFrame, fanin: int = 64, dedup: bool = True) -> DataFrame:
    """treeAggregate-style reduction: log_fanin(P) stages, each shuffling only
    sketch rows (≤1 per partition). ``dedup`` follows the build's cuckoo
    semantics (_spec_dedup)."""
    df = partials
    p = df.rdd.getNumPartitions()
    stage = _merge_stage(dedup)
    while p > fanin:
        p = max(1, math.ceil(p / fanin))
        df = df.repartition(p).mapInArrow(stage, PARTIAL_SCHEMA)
    return df


def collect_sketch(
    df: DataFrame, col: str, spec: SketchSpec, fanin: int = 64
) -> tuple[Sketch, int, int]:
    """End-to-end: build + tree-merge + driver-side final merge.

    Returns (sketch, rows_consumed, merge_overflow_count).
    """
    dedup = _spec_dedup(spec)
    partials = tree_merge(build_partials(df, col, spec), fanin, dedup=dedup)
    rows = partials.collect()
    if not rows:
        return spec.create(), 0, 0
    acc, n, overflow = fold_sketch_rows(
        ((r.sketch, r.n, r.overflow) for r in rows), dedup=dedup
    )
    return acc, n, overflow


def build_weighted_partials(
    df: DataFrame, key_col: str, value_col: str, spec: SketchSpec
) -> DataFrame:
    """One weighted partial per partition for sketches whose ``update``
    takes (keys, weights) — tuple sketch per-key sums, CMS/CountSketch/MG
    weighted frequencies. Null keys are filtered JVM-side so the weight
    column stays aligned with the hashed keys (the sketches raise on a
    length mismatch rather than misalign silently)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        t0 = time.monotonic()
        sk = spec.create()
        n = 0
        first = True
        for batch in batches:
            keys = batch.column(0)
            if first:
                _bind_funnel(sk, keys)
                first = False
            if len(keys) == 0:
                continue
            w = batch.column(1).to_numpy(zero_copy_only=False)
            sk.update(keys, weights=w)
            n += len(keys)
        if n == 0:
            return
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        yield pa.RecordBatch.from_pydict(
            {
                "sketch": [sk.to_bytes()],
                "n": [n],
                "overflow": [0],
                "part_id": [pid],
                "secs": [time.monotonic() - t0],
            },
            schema=_PARTIAL_ARROW,
        )

    pruned = df.select(
        F.col(key_col).alias("k"), F.col(value_col).cast("long").alias("w")
    ).filter(F.col("k").isNotNull() & F.col("w").isNotNull())
    return pruned.mapInArrow(fn, PARTIAL_SCHEMA)


def collect_weighted_sketch(
    df: DataFrame, key_col: str, value_col: str, spec: SketchSpec, fanin: int = 64
) -> tuple[Sketch, int, int]:
    """collect_sketch for (key, weight) sketches: same scan-once partials +
    KB-blob tree merge, two columns in. The tuple-sketch entry point —
    ``collect_weighted_sketch(turns, "conv_id", "n_tokens",
    SketchSpec("tuple", {"k": 4096}))`` answers "estimated total tokens
    across distinct conversations" from one blob."""
    partials = tree_merge(
        build_weighted_partials(df, key_col, value_col, spec), fanin
    )
    rows = partials.collect()
    if not rows:
        return spec.create(), 0, 0
    return fold_sketch_rows((r.sketch, r.n, r.overflow) for r in rows)


# ---------------------------------------------------------------------------
# Multi-sketch single-pass build: one scan, many sketches.
# At 100 TB the scan dominates; building HLL+bloom+CMS over the same column
# (or several columns) in one mapInArrow pass costs one read instead of k.
# ---------------------------------------------------------------------------

MULTI_SCHEMA = "name string, sketch binary, n bigint, overflow bigint"
_MULTI_ARROW = pa.schema(
    [
        ("name", pa.string()),
        ("sketch", pa.binary()),
        ("n", pa.int64()),
        ("overflow", pa.int64()),
    ]
)


def build_partials_multi(
    df: DataFrame, targets: list[tuple[str, str, SketchSpec]]
) -> DataFrame:
    """targets: [(name, column, spec)] → partial rows (name, sketch, n)."""
    cols = list(dict.fromkeys(c for _, c, _ in targets))
    col_idx = {c: i for i, c in enumerate(cols)}

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..sketches.base import FUNNEL_NONE, hash_column

        sks = {name: spec.create() for name, _, spec in targets}
        ns = dict.fromkeys(sks, 0)
        ovs = dict.fromkeys(sks, 0)
        first = True
        for batch in batches:
            # hash each column ONCE per batch; all hash-based sketches on the
            # same column share (h1, h2) — 3 sketches over conv_id = 1 hash
            hashed: dict[str, tuple] = {}
            for name, c, _ in targets:
                column = batch.column(col_idx[c])
                sk = sks[name]
                if first:
                    _bind_funnel(sk, column)
                ing = getattr(sk, "ingest_hashes", None)
                if sk.funnel == FUNNEL_NONE or ing is None:
                    # value-carrying kinds (bottomk witnesses, varopt
                    # samples) have no hash-only ingest — same fallback as
                    # the single-sketch build
                    sk.update(column)
                else:
                    if c not in hashed:
                        _, h1, h2 = hash_column(column, sk.funnel)
                        hashed[c] = (h1, h2)
                    ovs[name] += int(ing(*hashed[c]) or 0)
                ns[name] += len(column) - column.null_count
            first = False
        if all(v == 0 for v in ns.values()):
            return
        yield pa.RecordBatch.from_pydict(
            {
                "name": [name for name, _, _ in targets],
                "sketch": [sks[name].to_bytes() for name, _, _ in targets],
                "n": [ns[name] for name, _, _ in targets],
                "overflow": [ovs[name] for name, _, _ in targets],
            },
            schema=_MULTI_ARROW,
        )

    return df.select(*cols).mapInArrow(fn, MULTI_SCHEMA)


def _merge_stage_multi(dedups: dict[str, bool]):
    """``dedups``: per-target cuckoo merge semantics (_spec_dedup)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # repartition(p, "name") routes ALL of a name's rows to one task,
        # so at large executor counts this task merges every partial of
        # its name — decode through the same gated thread pool as
        # fold_sketch_rows (zlib releases the GIL) so a 1000-blob merge
        # isn't serial-decode bound
        rows: list[tuple[str, bytes, int, int]] = []
        for batch in batches:
            rows.extend(
                zip(
                    batch.column(0).to_pylist(),
                    batch.column(1).to_pylist(),
                    batch.column(2).to_pylist(),
                    batch.column(3).to_pylist(),
                )
            )
        if not rows:
            return
        if (
            len(rows) >= _FOLD_DECODE_MIN_ROWS
            and sum(len(r[1]) for r in rows) >= 4_000_000
        ):
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=_FOLD_DECODE_THREADS) as pool:
                decoded = list(pool.map(lambda r: Sketch.from_bytes(r[1]), rows))
        else:
            decoded = [Sketch.from_bytes(r[1]) for r in rows]
        accs: dict[str, Sketch] = {}
        ns: dict[str, int] = {}
        ovs: dict[str, int] = {}
        for (name, _blob, cnt, ov), sk in zip(rows, decoded):
            if name in accs:
                ovs[name] = ovs.get(name, 0) + _merge_into(
                    accs[name], sk, dedup=dedups.get(name, True)
                )
            else:
                accs[name] = sk
            ns[name] = ns.get(name, 0) + cnt
            ovs[name] = ovs.get(name, 0) + ov
        keys = sorted(accs)
        yield pa.RecordBatch.from_pydict(
            {
                "name": keys,
                "sketch": [accs[k].to_bytes() for k in keys],
                "n": [ns[k] for k in keys],
                "overflow": [ovs[k] for k in keys],
            },
            schema=_MULTI_ARROW,
        )

    return fn


def _collect_multi(
    dfm: DataFrame, fanin: int, targets: list[tuple[str, str, SketchSpec]]
) -> dict[str, tuple[Sketch, int, int]]:
    """Tree-merge named partials and fold the collected rows per name."""
    dedups = {name: _spec_dedup(spec) for name, _, spec in targets}
    stage = _merge_stage_multi(dedups)
    p = dfm.rdd.getNumPartitions()
    while p > fanin:
        p = max(1, math.ceil(p / fanin))
        dfm = dfm.repartition(p, "name").mapInArrow(stage, MULTI_SCHEMA)
    grouped: dict[str, list] = {}
    for row in dfm.collect():
        grouped.setdefault(row.name, []).append((row.sketch, row.n, row.overflow))
    return {
        name: fold_sketch_rows(rows, dedup=dedups.get(name, True))
        for name, rows in grouped.items()
    }


def collect_sketches_multi(
    df: DataFrame, targets: list[tuple[str, str, SketchSpec]], fanin: int = 64
) -> dict[str, tuple[Sketch, int, int]]:
    """One scan → {name: (sketch, rows, overflow)} for every target."""
    return _collect_multi(build_partials_multi(df, targets), fanin, targets)


# ---------------------------------------------------------------------------
# Python-native scan path: workers read parquet directly with pyarrow.
# The JVM schedules FILE NAMES; column pages are decoded straight into the
# numpy kernels with zero JVM→Python Arrow IPC — the measured bottleneck for
# wide text columns (the JVM-scan path serializes every row across the
# socket).  pyarrow.fs handles s3://... and hdfs://... in production; tasks
# stay ordinary Spark tasks (locality/retry/speculation all apply).
# ---------------------------------------------------------------------------

def build_partials_files_multi(
    spark, files: list[str], targets: list[tuple[str, str, SketchSpec]]
) -> DataFrame:
    cols = list(dict.fromkeys(c for _, c, _ in targets))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        from ..sketches.base import FUNNEL_NONE, hash_column

        sks = {name: spec.create() for name, _, spec in targets}
        ns = dict.fromkeys(sks, 0)
        ovs = dict.fromkeys(sks, 0)
        first = True
        for batch in batches:
            for file_path in batch.column(0).to_pylist():
                # use_threads=False: 32 parallel workers must not each spin
                # up an internal arrow thread pool (oversubscription)
                table = pq.read_table(
                    file_path.removeprefix("file:"), columns=cols, use_threads=False
                )
                # 16k-row chunks keep hash temporaries cache-resident:
                # measured 2-3x kernel speedup and much better multi-core
                # scaling vs whole-file batches (DRAM-bandwidth bound)
                for rb in table.to_batches(max_chunksize=16384):
                    hashed: dict[str, tuple] = {}
                    for name, c, _ in targets:
                        column = rb.column(rb.schema.get_field_index(c))
                        sk = sks[name]
                        if first:
                            _bind_funnel(sk, column)
                        ing = getattr(sk, "ingest_hashes", None)
                        if sk.funnel == FUNNEL_NONE or ing is None:
                            # value-carrying kinds (bottomk witnesses,
                            # varopt samples) have no hash-only ingest
                            sk.update(column)
                        else:
                            if c not in hashed:
                                _, h1, h2 = hash_column(column, sk.funnel)
                                hashed[c] = (h1, h2)
                            ovs[name] += int(ing(*hashed[c]) or 0)
                        ns[name] += len(column) - column.null_count
                    first = False
        if all(v == 0 for v in ns.values()):
            return
        yield pa.RecordBatch.from_pydict(
            {
                "name": [name for name, _, _ in targets],
                "sketch": [sks[name].to_bytes() for name, _, _ in targets],
                "n": [ns[name] for name, _, _ in targets],
                "overflow": [ovs[name] for name, _, _ in targets],
            },
            schema=_MULTI_ARROW,
        )

    # explicit numSlices assignment: repartition(n) hash-collides n rows
    # into ~0.63n partitions (stragglers get 2-3 files); parallelize slices
    # round-robin exactly.  ~2 slices per core keeps every core busy while
    # emitting ONE partial set per task (not per file) — fewer blobs to
    # serialize/merge than one-task-per-file.
    slices = min(len(files), max(64, spark.sparkContext.defaultParallelism * 2))
    files_df = spark.createDataFrame(
        spark.sparkContext.parallelize([(f,) for f in files], slices),
        "file string",
    )
    return files_df.mapInArrow(fn, MULTI_SCHEMA)


def collect_sketches_files(
    spark,
    input_path: str,
    targets: list[tuple[str, str, SketchSpec]],
    fanin: int = 64,
) -> dict[str, tuple[Sketch, int, int]]:
    """File-granular multi-sketch build: list files → per-file partials read
    with pyarrow in the workers → tree merge."""
    from .checkpoint import list_input_files

    files = list_input_files(spark, input_path)
    return _collect_multi(build_partials_files_multi(spark, files, targets), fanin, targets)


# ---------------------------------------------------------------------------
# Grouped (per-key) sketches — two-phase salted aggregation
# ---------------------------------------------------------------------------

def build_grouped(
    df: DataFrame,
    key: str | list[str],
    col: str,
    spec: SketchSpec,
    salt: int = 8,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-key sketches: (*keys, sketch binary, n bigint).

    Phase 1 groups by (*keys, salt) so a hot key (zipf conv_id) is split
    across `salt` parallel tasks; phase 2 merges the ≤salt partials per key.
    Only phase 1 shuffles raw rows — unavoidable for per-key results — and
    phase 2 shuffles sketch blobs.  For >10^4 distinct keys prefer the
    vectorized ``grouped_hll`` (applyInPandas costs ~1 ms of Python/group).

    ``weight_col``: per-row int64 weights for weighted sketches (tuple /
    CMS / CountSketch) — "total tokens across distinct conversations PER
    SEGMENT" is one grouped pass. Null keys/weights are filtered first so
    weights stay aligned with the hashed keys (the sketches raise on
    misalignment rather than corrupt silently).
    """
    keys = [key] if isinstance(key, str) else list(key)
    key_ddl = ", ".join(f"{k} {df.schema[k].dataType.simpleString()}" for k in keys)
    out_schema = f"{key_ddl}, sketch binary, n bigint"
    # pandas renders a nullable int column as float64(NaN); remember the true
    # Spark-side type so the kernel hashes int64, not doubles
    col_is_int = df.schema[col].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint", "long",
    )

    def build_fn(pdf):
        import pandas as pd

        sk = spec.create()
        column = pa.Array.from_pandas(pdf[col])
        if col_is_int and pa.types.is_floating(column.type):
            column = column.cast(pa.int64())
        _bind_funnel(sk, column)
        if weight_col is not None:
            import numpy as np

            w = np.asarray(pdf["_w"], dtype=np.int64)
            sk.update(column, weights=w)
            overflow = 0
        else:
            overflow = _ingest_overflow(sk, column)
        if overflow:
            # the grouped output schema has no overflow column, so a group
            # exceeding a cuckoo's capacity must fail LOUDLY — dropping the
            # count would be silent false negatives (size the capacity for
            # the largest group, or use bloom/hll for unbounded groups)
            key_vals = tuple(pdf[k].iloc[0] for k in keys)
            raise OverflowError(
                f"cuckoo capacity overflow in group {key_vals}: "
                f"{overflow} elements did not fit"
            )
        n = len(column) - column.null_count
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row.update({"sketch": [sk.to_bytes()], "n": [n]})
        return pd.DataFrame(row)

    def merge_fn(pdf):
        import pandas as pd

        acc, n, _ = fold_sketch_rows(
            ((blob, cnt, 0) for blob, cnt in zip(pdf["sketch"], pdf["n"])),
            dedup=_spec_dedup(spec),
        )
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row.update({"sketch": [acc.to_bytes()], "n": [n]})
        return pd.DataFrame(row)

    if weight_col is not None:
        base = df.select(
            *keys, col, F.col(weight_col).cast("long").alias("_w")
        ).filter(F.col(col).isNotNull() & F.col("_w").isNotNull())
    else:
        base = df.select(*keys, col)
    salted = base.withColumn(
        "_salt", F.coalesce(F.pmod(F.xxhash64(F.col(col)), F.lit(salt)), F.lit(0))
    )
    phase1 = salted.groupBy(*keys, "_salt").applyInPandas(build_fn, out_schema)
    if salt <= 1:
        return phase1
    return phase1.groupBy(*keys).applyInPandas(merge_fn, out_schema)
