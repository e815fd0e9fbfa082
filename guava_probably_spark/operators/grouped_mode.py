"""Exact grouped mode (most frequent value) at high key cardinality —
"dominant tool per conversation" — vectorized across all keys per partition.

Same family as grouped_hll/grouped_quantiles: one narrow shuffle, then per
partition ONE lexsort finds the run lengths of every (key, value) pair and a
second lexsort on (key, count desc, first-pos asc) picks each key's winner.
Tie-break is deterministic: the smallest value in sort order — the oracle
reproduces it with min(value) over the max-count set.

Skew armor (``pre_reduce``, default on): a MAP-SIDE ``(key, value, count)``
combine runs on each input partition BEFORE the exchange, so a hot key ships
at most ``parts × distinct_values`` counted rows across the shuffle instead
of its entire row set — the same posture grouped_hll/theta/cms take. Mode is
count-distributive, so the reduced build is exactly equal to the unreduced
one (tested row-identical on planted-hot-key input).

No per-group Python; a hot key is one in-partition sorted run.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame


def _gather_pairs(batches: Iterator[pa.RecordBatch]):
    """Collect (keys, values[, counts]) from a partition's batches, dropping
    null values. Returns None if no rows survive. Counts is None for raw
    (un-reduced) input."""
    keys_parts, v_parts, c_parts = [], [], []
    counted = False
    for batch in batches:
        key_arr = batch.column(0)
        val = batch.column(1)
        cnt = batch.column(2) if batch.num_columns > 2 else None
        counted = counted or cnt is not None
        if val.null_count:
            keep = val.is_valid()
            key_arr = key_arr.filter(keep)
            if cnt is not None:
                cnt = cnt.filter(keep)
            val = val.drop_null()
        if len(val) == 0:
            continue
        keys_parts.append(key_arr)
        v_parts.append(val)
        if cnt is not None:
            c_parts.append(cnt.to_numpy(zero_copy_only=False).astype(np.int64))
    if not keys_parts:
        return None
    keys = pa.chunked_array(keys_parts).combine_chunks()
    vals = pa.chunked_array(v_parts).combine_chunks()
    if len(keys) == 0:
        return None
    w = np.concatenate(c_parts) if counted else None
    return keys, vals, w


def _encode_runs(keys, vals, w):
    """Dictionary-encode and collapse to distinct (key, value) runs with
    summed weights. Returns (kuniq, vdict, vorder, run_key, run_val,
    run_cnt) where run_val indexes the VALUE-ORDER rank (ascending) so the
    smallest-value tie-break is a stable first-pick."""
    from ._arrow_common import encode_keys

    kuniq, kc = encode_keys(keys)
    venc = vals.dictionary_encode()
    # arrow dictionary codes are appearance-ordered; re-rank by VALUE order
    # so the tie-break (smallest value) is well-defined
    vdict = venc.dictionary
    vorder = pa.compute.sort_indices(vdict).to_numpy(zero_copy_only=False)
    vrank = np.empty(len(vdict), dtype=np.int64)
    vrank[vorder] = np.arange(len(vdict))
    vc = vrank[venc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]

    order = np.lexsort((vc, kc))
    sk_, sv_ = kc[order], vc[order]
    run_start = np.empty(len(sk_), dtype=bool)
    run_start[0] = True
    np.logical_or(sk_[1:] != sk_[:-1], sv_[1:] != sv_[:-1], out=run_start[1:])
    rs = np.flatnonzero(run_start)
    run_key = sk_[rs]
    run_val = sv_[rs]
    if w is None:
        run_cnt = np.diff(np.append(rs, len(sk_)))
    else:
        run_id = np.cumsum(run_start) - 1
        run_cnt = np.bincount(run_id, weights=w[order]).astype(np.int64)
    return kuniq, vdict, vorder, run_key, run_val, run_cnt


def _prereduce_stage():
    """Map-side combine: per input partition emit distinct (key, value,
    count) rows. Runs BEFORE the exchange — the shuffle is bounded by
    distinct pairs per partition no matter how hot a key is."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        gathered = _gather_pairs(batches)
        if gathered is None:
            return
        keys, vals, w = gathered
        kuniq, vdict, vorder, run_key, run_val, run_cnt = _encode_runs(keys, vals, w)
        yield pa.RecordBatch.from_arrays(
            [
                kuniq.take(pa.array(run_key)),
                vdict.take(pa.array(vorder[run_val])),
                pa.array(run_cnt.astype(np.int64)),
            ],
            names=["k", "v", "c"],
        )

    return fn


def _build_stage():
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        gathered = _gather_pairs(batches)
        if gathered is None:
            return
        keys, vals, w = gathered
        kuniq, vdict, vorder, run_key, run_val, run_cnt = _encode_runs(keys, vals, w)
        # per key: max count, tie -> smallest value (run_val asc within key)
        pick_order = np.lexsort((run_val, -run_cnt, run_key))
        pk, pv, pc = run_key[pick_order], run_val[pick_order], run_cnt[pick_order]
        first = np.empty(len(pk), dtype=bool)
        first[0] = True
        np.not_equal(pk[1:], pk[:-1], out=first[1:])
        win_key = pk[first]
        win_val = pv[first]
        win_cnt = pc[first]
        n_per = np.bincount(run_key, weights=run_cnt, minlength=len(kuniq)).astype(
            np.int64
        )
        out_keys = kuniq.take(pa.array(win_key))
        out_vals = vdict.take(pa.array(vorder[win_val]))
        yield pa.RecordBatch.from_arrays(
            [out_keys, out_vals, pa.array(win_cnt.astype(np.int64)), pa.array(n_per[win_key])],
            names=["key", "top_value", "top_count", "n"],
        )

    return fn


def grouped_mode(
    df: DataFrame,
    key: str,
    col: str,
    partitions: int | None = None,
    pre_reduce: bool = True,
) -> DataFrame:
    """Per-key exact mode → (key, top_value, top_count, n); ties broken by
    the smallest value.

    ``pre_reduce`` (default) applies the map-side (key, value, count)
    combine, bounding a hot key's shuffle footprint to
    ``input_parts × distinct_values`` counted rows instead of its raw row
    set. Mode is count-distributive, so results are identical either way.
    """
    key_type = df.schema[key].dataType.simpleString()
    val_type = df.schema[col].dataType.simpleString()
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    narrow = df.select(key, col)
    if pre_reduce:
        reduced = narrow.mapInArrow(
            _prereduce_stage(), f"k {key_type}, v {val_type}, c bigint"
        )
        colocated = reduced.repartition(parts, "k")
    else:
        colocated = narrow.repartition(parts, key)
    schema = f"key {key_type}, top_value {val_type}, top_count bigint, n bigint"
    return colocated.mapInArrow(_build_stage(), schema).withColumnRenamed("key", key)
