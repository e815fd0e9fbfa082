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
    """Filter `fact` down to rows whose key might be in dim[dim_key].

    Null fact keys are dropped (a null never equals any dim key, matching
    inner/semi-join semantics)."""
    sk = _dim_filter(dim, dim_key, kind, fpp, capacity)
    probe = might_contain_udf(spark, sk.to_bytes())
    return fact.filter(_null_safe_probe(fact, fact_key, probe))


def _null_safe_probe(fact: DataFrame, fact_key: str, probe):
    """probe(key) that never lets a null into the probed batch: a null in
    a nullable int64 batch surfaces to pandas as float64, corrupting keys
    past 2^53 (the probe UDF raises on that) — probe coalesce(key, 0) and
    mask the null rows to False (a null matches nothing)."""
    from pyspark.sql.functions import coalesce, lit, when
    from pyspark.sql.types import NumericType

    key = fact[fact_key]
    numeric = isinstance(fact.schema[fact_key].dataType, NumericType)
    probed = probe(coalesce(key, lit(0)) if numeric else key)
    return when(key.isNull(), lit(False)).otherwise(probed)


def _dim_filter(dim: DataFrame, dim_key: str, kind: str, fpp: float, capacity: int | None):
    """Build the broadcastable filter blob on the dim side's keys.

    ``kind="sbf"`` builds one-pass without a capacity (scalable bloom,
    per-partial fpp/P so the compound union bound lands at ``fpp``);
    bloom/cuckoo size to ``capacity`` or a ``count()`` of the dim."""
    if kind == "sbf":
        parts = max(dim.rdd.getNumPartitions(), 1)
        spec = SketchSpec("sbf", {"fpp": max(fpp / parts, 1e-12)})
        sk, _, _ = collect_sketch(dim, dim_key, spec)
        return sk.compact()
    if capacity is None:
        capacity = dim.count()  # dims are small by assumption; else pass it
    spec = SketchSpec(kind, {"capacity": max(capacity, 1), "fpp": fpp})
    sk, _, overflow = collect_sketch(dim, dim_key, spec)
    if overflow:
        raise OverflowError(f"semi-join filter overflowed by {overflow} entries")
    return sk


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


def sketch_antijoin(
    spark: SparkSession,
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    kind: str = "bloom",
    fpp: float = 0.01,
    capacity: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Corpus delta: the fact rows whose key is NOT in dim[dim_key].

    The incremental-ingest question at 100 TB — "which of today's 10^9
    documents are new relative to the existing corpus?" — without shuffling
    either side in full.  The filter contract inverts cleanly:

    - probe == False  ⇒ the key is DEFINITELY absent (zero FN means a
      present key always probes True) — those rows pass with no join at all;
    - probe == True   ⇒ either a real match or a false positive (rate ≤
      fpp).  With ``exact=True`` (default) only this candidate slice —
      |matches| + fpp·|new| rows, not the whole fact side — goes through a
      real ``left_anti`` join to rescue the false positives.  The result is
      then EXACTLY the unfiltered anti-join.

    ``exact=False`` skips the rescue join entirely: the result is a pure
    broadcast-probe filter (no shuffle of any side) that under-reports new
    rows by ≤ fpp — the conservative direction for dedup-style ingest
    (a duplicate is never re-admitted; a few new rows wait for a later
    pass or a smaller fpp).

    ``kind="sbf"`` builds the dim filter one-pass without a capacity.
    """
    sk = _dim_filter(dim, dim_key, kind, fpp, capacity)
    probe = might_contain_udf(spark, sk.to_bytes())
    # null fact keys never match any dim key: SQL anti-join keeps them, so
    # the null-safe probe's False puts them in definitely-new — correct
    hit = _null_safe_probe(fact, fact_key, probe)
    definitely_new = fact.filter(~hit)
    if not exact:
        return definitely_new
    from pyspark.sql.functions import broadcast

    candidates = fact.filter(hit)
    # distinct shrinks the broadcast; the explicit hint keeps the rescue a
    # BroadcastHashJoin even when autoBroadcastJoinThreshold is disabled
    # (the documented plan shape — nothing here may shuffle the fact side)
    dim_keys = broadcast(dim.select(dim[dim_key].alias("__dim_key")).distinct())
    rescued = candidates.join(
        dim_keys, candidates[fact_key] == dim_keys["__dim_key"], "left_anti"
    )
    return definitely_new.unionByName(rescued)
