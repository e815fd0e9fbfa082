"""Distributed connected components — the cluster step of near-dedup.

Pair generators (minhash/simhash/embedding LSH) emit EDGES; picking one
canonical document per duplicate *cluster* needs the transitive closure of
those edges.  This is min-label propagation with pointer jumping:

  round:  label(v) ← min(label(v), min over neighbors label(u))   (1 shuffle)
          label(v) ← label(label(v))        — path halving        (1 shuffle)

Alternating the two is the DataFrame form of the large-star/small-star
alternation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14): neighbor-min alone needs O(diameter) rounds, the
pointer-jump contracts chains so convergence is O(log n) rounds in
practice.  Each round is two shuffles on ids (AQE coalesces/splits at
runtime) plus one count action for the fixpoint test; ``localCheckpoint``
truncates the lineage so plans don't grow with the iteration count.

At convergence a node's label IS the minimum id in its component, so the
label doubles as the canonical (kept) document id — no extra pass.

Near-dup graphs are shallow (clusters are near-cliques around a template),
so typical convergence is 2-3 rounds even at 10^9 edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_iters: int = 25
) -> DataFrame:
    """(v, component) for every node appearing in ``edges``; component =
    min node id reachable over the undirected edge set."""
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    )
    sym = sym.localCheckpoint()
    labels = sym.select(F.col("src").alias("v")).distinct().withColumn(
        "label", F.col("v")
    )
    for _ in range(max_iters):
        neigh = sym.join(
            labels.withColumnRenamed("v", "src"), "src"
        ).select(F.col("dst").alias("v"), "label")
        # checkpoint before the self-join below: concrete attributes sidestep
        # self-join ambiguity, and the lineage stays O(1) per round anyway
        cand = (
            neigh.union(labels)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        # path halving: follow the label one hop through the label table
        new_labels = (
            cand.join(
                cand.toDF("lv", "llabel"),
                cand["label"] == F.col("lv"),
                "left",
            )
            .select(
                cand["v"],
                F.coalesce(F.col("llabel"), cand["label"]).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("v", F.col("label").alias("component"))


def keep_canonical(
    docs: DataFrame, id_col: str, components: DataFrame
) -> DataFrame:
    """Drop every non-canonical duplicate: keep rows whose id is its
    component's min (the label), plus rows in no component at all."""
    losers = components.filter(F.col("v") != F.col("component")).select(
        F.col("v").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
