"""Equi-depth histogram: sketch-chosen boundaries, EXACT bucket counts.

The standard profiling question over a 100-TB numeric column ("what does
the length / price / score distribution look like?") as two cheap passes:

1. ONE mergeable-sketch pass (KLL by default, t-digest selectable) picks
   ``bins − 1`` quantile split points — KB of driver state, no shuffle of
   the data (``collect_sketch`` tree-merges per-partition partials);
2. ONE whole-stage-codegen pass assigns each row its bucket with a chained
   ``WHEN`` comparison ladder over the sorted split literals (no Python, no
   sort, no range shuffle — the classic exact approach, ``ntile`` over a
   global sort, is a single-task total ordering at scale; and no
   higher-order array fold, which Spark evaluates interpreted) and
   hash-aggregates exact counts.

Counts are EXACT for the returned boundaries; only the boundary PLACEMENT
is approximate — each bucket holds n/bins rows ± the sketch's published
rank error (ε·n per edge, KLL ε ≈ 1.7/k·√(log(n/δ)) — see
``KllSketch.rank_error_bound``).  NULLs are excluded (documented; count
them separately if needed).

Output: (bucket, lo, hi, rows) with lo inclusive / hi exclusive; the outer
edges are the sketch's 0/1-quantile estimates (display only — bucket
membership depends solely on the splits, so every row is counted exactly
once whatever the edge estimates say).  Duplicate split points (heavy mass
on one value) collapse, so fewer than ``bins`` buckets can come back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sketches import SketchSpec
from .build import collect_sketch


def histogram_equidepth(
    df: DataFrame,
    col: str,
    bins: int = 10,
    spec: SketchSpec | None = None,
) -> DataFrame:
    """Equi-depth histogram of ``df[col]`` — see module doc.

    Returns a DataFrame (bucket int, lo double, hi double, rows long),
    ordered by bucket.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    spec = spec or SketchSpec("kll", {"k": 200})
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    sk, n, _ = collect_sketch(vals, "v", spec)
    if n == 0:
        return df.sparkSession.createDataFrame(
            [], "bucket int, lo double, hi double, rows long"
        )
    qs = [i / bins for i in range(1, bins)]
    import numpy as np

    splits = sorted(set(float(x) for x in np.atleast_1d(sk.quantile(np.array(qs)))))
    lo_all = float(sk.quantile(0.0))
    hi_all = float(sk.quantile(1.0))
    # bucket = number of splits at-or-below v.  A chained WHEN ladder over
    # the sorted splits (first split that exceeds v names the bucket) stays
    # inside whole-stage codegen; the previous F.aggregate fold over an
    # array literal was a higher-order function, which Spark evaluates
    # interpreted (CodegenFallback) — measured ~6x slower on this pass.
    if splits:
        ladder = F.when(F.col("v") < F.lit(splits[0]), 0)
        for i, s in enumerate(splits[1:], start=1):
            ladder = ladder.when(F.col("v") < F.lit(s), i)
        bucket = ladder.otherwise(len(splits)).alias("bucket")
    else:  # bins == 1 (or full split collapse): everything is bucket 0
        bucket = F.lit(0).alias("bucket")
    counts = {
        r["bucket"]: r["rows"]
        for r in vals.select(bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("rows"))
        .collect()
    }
    edges = [lo_all] + splits + [hi_all]
    rows = [
        (b, edges[b], edges[b + 1], int(counts.get(b, 0)))
        for b in range(len(splits) + 1)
    ]
    return df.sparkSession.createDataFrame(
        rows, "bucket int, lo double, hi double, rows long"
    )


def histogram_equidepth_grouped(
    df: DataFrame,
    key: str,
    col: str,
    bins: int = 10,
    k: int = 200,
) -> DataFrame:
    """Per-key equi-depth histograms straight out of grouped KLL blobs —
    the per-source profile ("length distribution by source") with ZERO
    passes beyond the sketch build.

    One ``grouped_kll`` build (skew-armored, mergeable) yields a KB blob
    per key; each blob answers both the bins−1 split points AND the bucket
    masses: rows(bucket) = n·(rank(hi) − rank(lo)).  Counts carry the KLL
    rank error (± ε·n per bucket edge, ε from ``rank_error_bound``) —
    approximate where the global :func:`histogram_equidepth` is exact,
    because a per-key exact second pass would rescan the table per key
    set; profiling tolerates ±ε, and the error column makes it explicit.

    Returns (key, bucket, lo, hi, rows, rows_error_bound), ordered by
    (key, bucket).  Keys are assumed low-cardinality (sources, splits,
    languages — profiling dimensions); the blobs come to the driver, bins
    × |keys| rows go back out.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    import numpy as np

    from ..sketches import Sketch
    from .grouped_kll import grouped_kll

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    vals = df.select(
        F.col(key).alias("k"), F.col(col).cast("double").alias("v")
    ).filter(F.col("v").isNotNull() & ~F.isnan("v"))
    g = grouped_kll(vals, "k", "v", k=k)  # output schema: (key, sketch, n)
    out = []
    for r in g.collect():  # |keys| KB blobs — profiling dimensions only
        sk = Sketch.from_bytes(r.sketch)
        n = int(r.n)
        qs = np.linspace(0.0, 1.0, bins + 1)
        edges = np.atleast_1d(sk.quantile(qs)).astype(float)
        err = int(np.ceil(sk.rank_error_bound() * n))
        # duplicate splits (heavy mass on one value) collapse, like the
        # global operator
        uniq = [edges[0]]
        for e in edges[1:]:
            if e > uniq[-1]:
                uniq.append(e)
        if len(uniq) == 1:
            # every quantile landed on one value (constant-valued or
            # single-row key): the key still owns its n rows — emit the
            # degenerate [v, v] bucket rather than dropping the key, the
            # same posture as the global operator under full collapse
            out.append((r.key, 0, float(uniq[0]), float(uniq[0]), n, err))
            continue
        ranks = np.atleast_1d(sk.rank(np.array(uniq))).astype(float)
        ranks[-1] = 1.0  # rank() is strictly-below; the top edge closes the last bucket
        for b in range(len(uniq) - 1):
            rows = int(round((ranks[b + 1] - ranks[b]) * n))
            out.append((r.key, b, float(uniq[b]), float(uniq[b + 1]), rows, err))
    schema = StructType(
        [
            StructField(key, df.schema[key].dataType),  # preserve key type
            StructField("bucket", IntegerType()),
            StructField("lo", DoubleType()),
            StructField("hi", DoubleType()),
            StructField("rows", LongType()),
            StructField("rows_error_bound", LongType()),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema).orderBy(key, "bucket")
