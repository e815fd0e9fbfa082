"""Sketch-accelerated semi-join pruning (SURVEY.md §2.3 "Joins").

The distributed use of `mightContain` (SURVEY.md §2 row 5): build a filter on
the dim side's join keys, broadcast the KB-sized blob, and pre-filter the
fact side before the real join — Catalyst's own InjectRuntimeFilter does the
same internally with BloomFilterAggregate; ours is the from-scratch,
user-controllable version with selectable filter kind (bloom or cuckoo).

At 100 TB scale this is the difference between shuffling the whole fact
table into the join and shuffling only the ~selectivity fraction that can
match. False positives only ever let extra rows through (the exact join
then drops them); zero false negatives ⇒ never drops a matching row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import might_contain_udf
from ..sketches import SketchSpec
from .build import collect_sketch


def sketch_prune(
    spark: SparkSession,
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    kind: str = "bloom",
    fpp: float = 0.01,
    capacity: int | None = None,
) -> DataFrame:
    """Filter `fact` down to rows whose key might be in dim[dim_key]."""
    if capacity is None:
        capacity = dim.count()  # dims are small by assumption; else pass it
    spec = SketchSpec(kind, {"capacity": max(capacity, 1), "fpp": fpp})
    sk, _, overflow = collect_sketch(dim, dim_key, spec)
    if overflow:
        raise OverflowError(f"semi-join filter overflowed by {overflow} entries")
    probe = might_contain_udf(spark, sk.to_bytes())
    return fact.filter(probe(fact[fact_key]))


def sketch_semijoin(
    spark: SparkSession,
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    kind: str = "bloom",
    fpp: float = 0.01,
) -> DataFrame:
    """Exact inner join, sketch-pruned: prune fact first, then join (the
    join itself removes any false positives — result is exactly equal to the
    unpruned join)."""
    from pyspark.sql.functions import broadcast

    pruned = sketch_prune(spark, fact, fact_key, dim, dim_key, kind, fpp)
    return pruned.join(broadcast(dim), pruned[fact_key] == dim[dim_key], "inner")
