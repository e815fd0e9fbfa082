"""Exact grouped quantiles at high key cardinality — vectorized across ALL
keys in a partition (the order-statistics sibling of operators/grouped_hll.py).

The sketch path (`build_grouped` with KLL/t-digest via applyInPandas) pays
~1 ms of Python per group — wrong at 10^8 conv_ids. When per-key exact
quantiles are wanted (bounded rows per key, e.g. turns per conversation),
one narrow shuffle of (key, float64) plus ONE lexsort per partition answers
every requested quantile for every key simultaneously:

  repartition(key) → lexsort (key, value) → segment boundaries →
  per-quantile index gather (idx = max(0, ⌈q·n⌉−1), the nearest-rank /
  `quantile_disc` convention DuckDB uses — oracle-matched by construction).

Skew posture: a hot key sorts inside one partition — O(n log n) vectorized,
no Python per group; the shuffle carries 8-byte values, never the payload.
For UNBOUNDED per-key rows prefer the mergeable KLL sketch path; this
operator is the exact fast path for bounded groups.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame


def _build_stage(qs: Sequence[float]):
    qarr = np.asarray(qs, dtype=np.float64)

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
            arr = val.to_numpy(zero_copy_only=False).astype(np.float64)
            finite = ~np.isnan(arr)
            if not finite.all():
                # pandas-origin frames surface missing floats as NaN, not
                # null — NaN sorts last and would poison the top quantiles
                key_arr = key_arr.filter(pa.array(finite))
                arr = arr[finite]
            if len(arr) == 0:
                continue
            keys_parts.append(key_arr)
            v_parts.append(arr)
        if not keys_parts:
            return
        keys = pa.chunked_array(keys_parts).combine_chunks()
        v = np.concatenate(v_parts)
        from ._arrow_common import encode_keys

        uniq, codes = encode_keys(keys)
        order = np.lexsort((v, codes))
        sc = codes[order]
        sv = v[order]
        n_per = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        starts = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(n_per, out=starts[1:])
        cols = [uniq, pa.array(n_per)]
        names = ["key", "n"]
        for q in qarr:
            idx = np.maximum(np.ceil(q * n_per).astype(np.int64) - 1, 0)
            np.minimum(idx, n_per - 1, out=idx)
            cols.append(pa.array(sv[starts[:-1] + idx]))
            names.append(f"q{int(round(q * 100))}")
        yield pa.RecordBatch.from_arrays(cols, names=names)

    return fn


def grouped_quantiles(
    df: DataFrame,
    key: str,
    col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    partitions: int | None = None,
) -> DataFrame:
    """Exact nearest-rank quantiles per key: (key, n, q25, q50, …)."""
    key_type = df.schema[key].dataType.simpleString()
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    narrow = df.select(key, df[col].cast("double"))
    colocated = narrow.repartition(parts, key)
    qcols = ", ".join(f"q{int(round(q * 100))} double" for q in qs)
    schema = f"key {key_type}, n bigint, {qcols}"
    return colocated.mapInArrow(_build_stage(qs), schema).withColumnRenamed(
        "key", key
    )


def quantile_trim(
    df: DataFrame,
    key: str,
    col: str,
    q: float = 0.9,
    keep: str = "below",
    method: str = "exact",
    kll_k: int = 200,
) -> DataFrame:
    """Filter rows relative to their own group's q-quantile.

    The outlier-trim step of a training-data pipeline ("drop documents
    longer than their source's p90") as two passes over the data:

      pass 1 computes one threshold per key — ``method="exact"`` uses the
      lexsort kernel above (bounded per-key rows), ``method="kll"`` the
      mergeable sketch path (unbounded rows, bounded error);
      pass 2 broadcast-joins the tiny (key, threshold) relation back and
      filters with a codegen comparison — no second shuffle of the data.

    ``keep="below"`` retains rows with value <= threshold (ties kept on
    both sides, matching the SQL oracle); ``keep="above"`` the complement.
    The broadcast holds one float per key: fine to ~10^7 keys, beyond that
    fall back to a shuffled join on key.
    """
    from pyspark.sql import functions as F

    if keep not in ("below", "above"):
        raise ValueError(f"keep must be 'below' or 'above', got {keep!r}")
    qname = f"q{int(round(q * 100))}"
    th_col = "__gps_trim_threshold"
    if method == "exact":
        th = grouped_quantiles(df, key, col, qs=(q,)).select(
            key, F.col(qname).alias(th_col)
        )
    elif method == "kll":
        from guava_probably_spark import SketchSpec
        from guava_probably_spark.functions import quantile_udf
        from guava_probably_spark.operators.build import build_grouped

        g = build_grouped(df, key, col, SketchSpec("kll", {"k": kll_k}))
        th = g.select(key, quantile_udf(q)("sketch").alias(th_col))
    else:
        raise ValueError(f"method must be 'exact' or 'kll', got {method!r}")
    cond = F.col(col).cast("double") <= F.col(th_col)
    joined = df.join(F.broadcast(th), key)
    return joined.filter(cond if keep == "below" else ~cond).drop(th_col)
