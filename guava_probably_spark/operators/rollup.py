"""Sketch rollup / grouping sets — re-aggregation WITHOUT rescanning.

The killer property of mergeable sketches (SURVEY.md §2.3 "grouping sets /
cube / rollup"): a sketch DataFrame at the finest grouping level rolls up to
every coarser level by MERGE.  At 100 TB the raw scan happens once, at the
finest level; every marginal (per-day, per-role, global…) is a KB-sized
blob merge.

``rollup_sketches(grouped, keys, ...)`` takes (k1, …, kn, sketch, n) and
returns the union of all prefix levels (ROLLUP semantics), with dropped keys
set to NULL — mirroring SQL ``GROUP BY ROLLUP(k1, …, kn)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from ..sketches import Sketch
from .build import _merge_into, _spec_dedup


def _merge_groups_fn(n_keys: int, dedup: bool = True):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        accs: dict[tuple, Sketch] = {}
        ns: dict[tuple, int] = {}
        schema = None
        for batch in batches:
            schema = batch.schema
            keys_cols = [batch.column(i).to_pylist() for i in range(n_keys)]
            blobs = batch.column(n_keys).to_pylist()
            counts = batch.column(n_keys + 1).to_pylist()
            for i, blob in enumerate(blobs):
                key = tuple(col[i] for col in keys_cols)
                sk = Sketch.from_bytes(blob)
                if key in accs:
                    _merge_into(accs[key], sk, dedup=dedup)
                else:
                    accs[key] = sk
                ns[key] = ns.get(key, 0) + counts[i]
        if not accs:
            return
        keys_sorted = sorted(accs, key=lambda t: tuple(str(x) for x in t))
        arrays = []
        for i in range(n_keys):
            arrays.append(pa.array([k[i] for k in keys_sorted], type=schema.field(i).type))
        arrays.append(pa.array([accs[k].to_bytes() for k in keys_sorted], type=pa.binary()))
        arrays.append(pa.array([ns[k] for k in keys_sorted], type=pa.int64()))
        yield pa.RecordBatch.from_arrays(arrays, schema=schema)

    return fn


def merge_level(grouped: DataFrame, keys: list[str], dedup: bool = True) -> DataFrame:
    """Merge a sketch DataFrame down to the given (sub)set of keys.

    Input columns: *parent_keys, sketch, n — parent keys not in `keys` are
    dropped and their sketches merged.  Shuffles only sketch blobs.
    ``dedup`` must match the cuckoo build semantics (pass False for
    dedup_build=False multiset tables; irrelevant for other kinds)."""
    n_keys = len(keys)
    sel = grouped.select(*keys, "sketch", "n")
    schema_ddl = ", ".join(
        f"{k} {grouped.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (schema_ddl + ", " if schema_ddl else "") + "sketch binary, n bigint"
    if n_keys == 0:
        merged = sel.repartition(1).mapInArrow(_merge_groups_fn(0, dedup), out_schema)
        return merged
    return sel.repartition(*keys).mapInArrow(_merge_groups_fn(n_keys, dedup), out_schema)


def cube_sketches(grouped: DataFrame, keys: list[str], dedup: bool = True) -> DataFrame:
    """SQL CUBE over a sketch DataFrame: every SUBSET of `keys` (2^k
    levels), each coarser level a blob merge of the finest one — mirrors
    ``GROUP BY CUBE`` without rescanning. Dropped keys are NULL."""
    from itertools import combinations

    finest = grouped.select(*keys, "sketch", "n")
    levels = [finest]
    for depth in range(len(keys) - 1, -1, -1):
        for subset in combinations(keys, depth):
            lvl = merge_level(finest, list(subset), dedup)
            for k in keys:
                if k not in subset:
                    lvl = lvl.withColumn(
                        k, F.lit(None).cast(grouped.schema[k].dataType.simpleString())
                    )
            levels.append(lvl.select(*keys, "sketch", "n"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out


def rollup_sketches(grouped: DataFrame, keys: list[str], dedup: bool = True) -> DataFrame:
    """SQL ROLLUP over a sketch DataFrame: every prefix level of `keys`,
    coarser levels computed by merging the finer ones (never rescanning).
    Dropped keys are NULL (SQL rollup convention)."""
    levels = []
    current = grouped.select(*keys, "sketch", "n")
    for depth in range(len(keys), -1, -1):
        lvl_keys = keys[:depth]
        if depth < len(keys):
            current = merge_level(current, lvl_keys, dedup)
        lvl = current
        for k in keys[depth:]:
            lvl = lvl.withColumn(
                k, F.lit(None).cast(grouped.schema[k].dataType.simpleString())
            )
        levels.append(lvl.select(*keys, "sketch", "n"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out


def rolling_merge(
    grouped: DataFrame,
    order_col: str,
    window: int,
    partition_cols: list[str] | None = None,
    dedup: bool = True,
) -> DataFrame:
    """Sliding-window sketch merge over an ordered sketch table: the row at
    order value d carries the merge of the last ``window`` rows' sketches —
    e.g. 7-day actives from a daily HLL table, with NO rescan of the raw
    events (the canonical payoff of mergeable sketches: the 100 TB scan
    happened once when the daily table was built; every rolling window is a
    ≤``window``-blob merge).

    Input columns: (*partition_cols, order_col, sketch, n). Output adds
    ``window_sketch`` (merged blob) and ``window_n`` (summed raw count).
    Scale: the window function shuffles one KB-blob row per (partition,
    order) — a daily table is tiny regardless of the raw-data scale; a hot
    partition holds |distinct order values| rows, not raw rows. ``dedup``
    follows the cuckoo build semantics (irrelevant for other kinds).

    SINGLE-PARTITION CAVEAT: with no ``partition_cols`` the plan is
    ``Window.partitionBy()`` = ``Exchange SinglePartition`` — every input
    row flows through ONE task. That is the intended posture for the
    intended input (a daily/hourly sketch table: ≤10^3–10^4 KB-blob rows,
    the 100 TB scan already happened when that table was built), but it
    does NOT scale to large ungrouped sketch tables. If the input has more
    than ~10^5 rows, pass ``partition_cols`` (e.g. a tenant or metric key)
    so each partition's window sorts independently. Plan shape is pinned by
    test_rolling_merge_plan_posture.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import BinaryType
    from pyspark.sql.functions import pandas_udf

    from .build import fold_sketch_rows

    if window < 1:
        raise ValueError("window must be >= 1")

    @pandas_udf(BinaryType())
    def merge_blobs(lists):
        import pandas as pd

        out = []
        for blobs in lists:
            acc, _, _ = fold_sketch_rows(
                ((bytes(b), 0, 0) for b in blobs if b is not None), dedup=dedup
            )
            out.append(acc.to_bytes() if acc is not None else None)
        return pd.Series(out)

    parts = partition_cols or []
    w = (
        Window.partitionBy(*parts)
        .orderBy(order_col)
        .rowsBetween(-(window - 1), 0)
    )
    return grouped.withColumn(
        "window_sketch", merge_blobs(F.collect_list("sketch").over(w))
    ).withColumn("window_n", F.sum("n").over(w))
