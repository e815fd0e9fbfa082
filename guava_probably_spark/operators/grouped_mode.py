"""Exact grouped mode (most frequent value) at high key cardinality —
"dominant tool per conversation" — vectorized across all keys per partition.

Same family as grouped_hll/grouped_quantiles: one narrow (key, value)
shuffle, then per partition ONE lexsort finds the run lengths of every
(key, value) pair and a second lexsort on (key, count desc, first-pos asc)
picks each key's winner. Tie-break is deterministic: the smallest value in
sort order — the oracle reproduces it with min(value) over the max-count
set.

No per-group Python; a hot key is one in-partition sorted run.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame


def _build_stage():
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        keys_parts = []
        v_parts = []
        for batch in batches:
            key_arr = batch.column(0)
            val = batch.column(1)
            if val.null_count:
                keep = val.is_valid()
                key_arr = key_arr.filter(keep)
                val = val.drop_null()
            if len(val) == 0:
                continue
            keys_parts.append(key_arr)
            v_parts.append(val)
        if not keys_parts:
            return
        keys = pa.chunked_array(keys_parts).combine_chunks()
        vals = pa.chunked_array(v_parts).combine_chunks()
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
        run_cnt = np.diff(np.append(rs, len(sk_)))
        # per key: max count, tie -> smallest value (run_val asc within key)
        pick_order = np.lexsort((run_val, -run_cnt, run_key))
        pk, pv, pc = run_key[pick_order], run_val[pick_order], run_cnt[pick_order]
        first = np.empty(len(pk), dtype=bool)
        first[0] = True
        np.not_equal(pk[1:], pk[:-1], out=first[1:])
        win_key = pk[first]
        win_val = pv[first]
        win_cnt = pc[first]
        n_per = np.bincount(kc, minlength=len(kuniq)).astype(np.int64)
        out_keys = kuniq.take(pa.array(win_key))
        out_vals = vdict.take(pa.array(vorder[win_val]))
        yield pa.RecordBatch.from_arrays(
            [out_keys, out_vals, pa.array(win_cnt), pa.array(n_per[win_key])],
            names=["key", "top_value", "top_count", "n"],
        )

    return fn


def grouped_mode(
    df: DataFrame,
    key: str,
    col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Per-key exact mode → (key, top_value, top_count, n); ties broken by
    the smallest value."""
    key_type = df.schema[key].dataType.simpleString()
    val_type = df.schema[col].dataType.simpleString()
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    colocated = df.select(key, col).repartition(parts, key)
    schema = f"key {key_type}, top_value {val_type}, top_count bigint, n bigint"
    return colocated.mapInArrow(_build_stage(), schema).withColumnRenamed("key", key)
