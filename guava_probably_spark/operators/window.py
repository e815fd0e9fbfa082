"""Windowed sketches: merge-prefix running distinct per key (SURVEY.md §2.3
"Window functions" row — the per-conv running-distinct use-case deferred from
v1, now shipped).

``running_distinct(df, key, order, col)`` answers, for every row, "how many
distinct values of `col` has this `key` seen up to and including this row
(ordered by `order`)?" — both EXACTLY and as a running HLL estimate whose
state at row t is the merge of the per-row sketches of the prefix [0, t]
(the merge-prefix formulation: prefix_sketch(t) = prefix_sketch(t-1) ∪
sketch(row_t)).

Spark-first plan shape (one shuffle, zero per-row Python):

  1. ``repartition(key)`` — the one unavoidable shuffle of any partitioned
     window; payload is only (key, order, carry…, value), never re-shuffled.
  2. ``sortWithinPartitions(key, order)`` — JVM Tungsten sort, no extra
     exchange (SortExec is partition-local above the repartition).
  3. one ``mapInArrow`` kernel over the sorted partition, vectorized across
     ALL keys at once (no per-group Python — same design as
     operators/grouped_hll.py, which a naive ``Window`` + UDF or
     ``applyInPandas``-per-group formulation would pay ~1 ms/group for):

     - exact running distinct: arrow ``dictionary_encode`` (C++ hashing) →
       first-occurrence-within-segment indicator → segmented cumsum.
     - running HLL estimate WITHOUT per-prefix re-estimation: each row
       changes at most ONE register, so the estimator's Σ 2^-reg and
       zero-register count evolve by per-row deltas. A stable argsort by
       (segment, register) + the monotonic-key trick turns the per-register
       running max into one ``np.maximum.accumulate``; deltas scatter back
       to time order and a segmented cumsum yields the exact register-state
       statistics of every prefix — O(n log n) total for ALL rows, vs
       O(n·m) naive.

Scale notes (10^12-turn spec, BASELINE.json): the shuffle is narrow rows
(key + order + 8-byte value hash dominate); a hot key serializes into one
partition but the kernel is one vectorized pass — same skew posture as
grouped_hll. Each partition is materialized once in the Python worker;
bound partition width via `partitions` as with any sort-based window.

Reference parity: guava-probably has no window surface (SURVEY.md §2.3 —
"✗"); this is the north-rule extension built on the same merge-prefix
property that makes its filters distributively mergeable
(putAll(filter), [GP:.../CuckooFilter.java]).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from ..sketches.base import hash_column
from ..sketches.hll import _alpha, _leading_zero_rho


def _segmented_cumsum(x: np.ndarray, seg_first_pos: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """Cumsum of x reset at each segment start; seg is the per-row segment id
    (nondecreasing), seg_first_pos[s] = first row index of segment s."""
    cs = np.cumsum(x)
    base = cs[seg_first_pos] - x[seg_first_pos]
    return cs - base[seg]


def _kernel(p: int, n_carry: int):
    m = 1 << p
    alpha = _alpha(m)
    shift = np.uint64(64 - p)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cols: list[list[pa.Array]] = []
        for batch in batches:
            if not cols:
                cols = [[] for _ in range(batch.num_columns)]
            for i in range(batch.num_columns):
                cols[i].append(batch.column(i))
        if not cols:
            return
        arrs = [pa.chunked_array(c).combine_chunks() for c in cols]
        key_arr, order_arr = arrs[0], arrs[1]
        carry_arrs = arrs[2 : 2 + n_carry]
        val = arrs[-1]
        n = len(key_arr)
        if n == 0:
            return  # an empty arrow batch (not just an empty iterator)

        # --- segments: rows arrive sorted by (key, order); boundary = key change
        # null-safe encode: a null key's NaN index would make every
        # null-key row its own segment (NaN != NaN) instead of one group
        from ._arrow_common import encode_keys

        _, kc = encode_keys(key_arr)
        is_start = np.empty(n, dtype=bool)
        is_start[0] = True
        np.not_equal(kc[1:], kc[:-1], out=is_start[1:])
        seg = np.cumsum(is_start, dtype=np.int64) - 1
        seg_first_pos = np.flatnonzero(is_start)

        # --- exact running distinct: first occurrence of value within segment.
        # Null rows are EXCLUDED from the first-occurrence computation itself
        # (ADVICE r1): the old code filled nulls with ''/0 before encoding, so
        # a null row preceding a genuine ''/0 in the same key group consumed
        # its first-occurrence slot and the exact count undercounted forever.
        valid = None
        if val.null_count:
            valid = val.is_valid().to_numpy(zero_copy_only=False)
            if pa.types.is_string(val.type) or pa.types.is_large_string(val.type):
                fill = ""
            elif pa.types.is_binary(val.type) or pa.types.is_large_binary(val.type):
                fill = b""  # 0 is not a valid binary fill and raised in-kernel
            else:
                fill = 0
            val = val.fill_null(fill)  # filled copy feeds ONLY the hash
            # kernel (rho zeroed below)
        enc = val.dictionary_encode()
        vcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        combo = seg * np.int64(len(enc.dictionary)) + vcode
        first = np.zeros(n, dtype=bool)
        if valid is not None:
            vpos = np.flatnonzero(valid)
            _, fi = np.unique(combo[vpos], return_index=True)
            first[vpos[fi]] = True
        else:
            _, first_idx = np.unique(combo, return_index=True)
            first[first_idx] = True
        run = _segmented_cumsum(first.astype(np.int64), seg_first_pos, seg)

        # --- running HLL register deltas
        _, h1, _ = hash_column(val)
        reg = (h1 >> shift).astype(np.int64)
        rho = _leading_zero_rho(h1 << np.uint64(p), 64 - p).astype(np.int64)
        if valid is not None:
            rho[~valid] = 0  # null rows touch no register
        comp = seg * np.int64(m) + reg
        order2 = np.argsort(comp, kind="stable")  # time order preserved within (seg, reg)
        sc = comp[order2]
        srho = rho[order2]
        K = np.int64(128)  # > max rho (width+1 ≤ 61+1); keys strictly separate
        acc = np.maximum.accumulate(sc * K + srho)
        new = acc - sc * K  # segmented running max of rho within (seg, reg)
        prev = np.empty(n, dtype=np.int64)
        prev[0] = 0
        prev[1:] = new[:-1]
        prev[np.flatnonzero(np.concatenate(([True], sc[1:] != sc[:-1])))] = 0

        delta = np.exp2(-new.astype(np.float64)) - np.exp2(-prev.astype(np.float64))
        touch = ((prev == 0) & (new > 0)).astype(np.int64)
        delta_t = np.empty(n, dtype=np.float64)
        delta_t[order2] = delta
        touch_t = np.empty(n, dtype=np.int64)
        touch_t[order2] = touch

        # --- per-prefix estimator statistics (all-zero registers sum to m)
        S = m + _segmented_cumsum(delta_t, seg_first_pos, seg)
        zeros_ct = m - _segmented_cumsum(touch_t, seg_first_pos, seg)
        est = alpha * m * m / S
        lc = (est <= 2.5 * m) & (zeros_ct > 0)
        with np.errstate(divide="ignore"):
            est[lc] = m * np.log(m / np.maximum(zeros_ct[lc], 1))

        yield pa.RecordBatch.from_arrays(
            [key_arr, order_arr, *carry_arrs, pa.array(run), pa.array(est)],
            names=["__k", "__o"]
            + [f"__c{i}" for i in range(n_carry)]
            + ["run_distinct", "estimate"],
        )

    return fn


def running_distinct(
    df: DataFrame,
    key: str,
    order: str,
    col: str,
    p: int = 12,
    carry: Sequence[str] = (),
    partitions: int | None = None,
) -> DataFrame:
    """Per-(key, order-prefix) running distinct count of `col`: exact
    (`run_distinct`) + merge-prefix HLL estimate (`estimate`). Extra `carry`
    columns pass through untouched. One shuffle, one sorted vectorized pass."""
    if not 4 <= p <= 18:
        # p=64 would silently corrupt the (seg, reg) composite keys (shift
        # 0, registers from full wrapped hashes); match HllSketch's bound
        raise ValueError("precision p must be in [4, 18]")
    carry = [c for c in carry if c not in (key, order)]
    for c in carry:
        if c in ("run_distinct", "estimate"):
            raise ValueError(
                f"carry column {c!r} collides with an output column name"
            )
    spark = df.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism * 2
    narrow = df.select(key, order, *carry, col)
    sorted_parts = narrow.repartition(parts, key).sortWithinPartitions(key, order)
    types = {f.name: f.dataType.simpleString() for f in narrow.schema.fields}
    schema = ", ".join(
        [f"__k {types[key]}", f"__o {types[order]}"]
        + [f"__c{i} {types[c]}" for i, c in enumerate(carry)]
        + ["run_distinct bigint", "estimate double"]
    )
    out = sorted_parts.mapInArrow(_kernel(p, len(carry)), schema)
    out = out.withColumnRenamed("__k", key).withColumnRenamed("__o", order)
    for i, c in enumerate(carry):
        out = out.withColumnRenamed(f"__c{i}", c)
    return out
