"""Connected components over candidate-duplicate pair graphs — the
clustering stage of the near-dup pipeline (LSH pairs -> duplicate
clusters -> one canonical keeper per cluster).

Reference capability: elasticsearch-hadoop has no graph operator; this is
part of the driver-mandated LLM-pipeline dedup extension (SURVEY.md §2.C
extensions).  The pair stage (operators/dedup.py minhash_lsh_pairs) finds
EDGES; real corpora need the transitive closure — A~B, B~C means A,B,C are
one duplicate cluster even when A~C never collided in a band.

Algorithm: iterative minimum-label propagation to a fixpoint.
    label(v) <- min(label(v), min over neighbors u of label(u))
Each iteration is one hash-partitioned equi-join (edges x labels) plus one
groupBy-min — both shuffle on node id, no cross product anywhere.  It
converges in O(component diameter) iterations; duplicate clusters are
near-cliques (diameter 1-3), so 2-4 iterations in practice.  For
adversarial long-chain graphs the literature alternative is the
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) with O(log^2 n) rounds; min-label
propagation is chosen because dup-cluster graphs have tiny diameter and
each round is a single cheap join.

Scale notes (100 TB):
- State per round is |V| (node, label) rows + the bidirected edge list —
  both tiny relative to the corpus (only docs that collided in a band).
- The convergence check is a single sum(label) aggregate (monotonically
  decreasing, integral): one count-free action per round, no collect of
  data rows.
- localCheckpoint truncates the loop-grown lineage so round k's plan does
  not replay rounds 1..k-1 (classic iterative-Spark pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str,
    dst: str,
    max_iterations: int = 25,
) -> DataFrame:
    """Return (node, cluster_id) for every node appearing in ``pairs``,
    where cluster_id = min node id reachable through the pair graph.

    ``pairs`` is an undirected edge list (one row per edge, either
    orientation).  Runs min-label propagation to the exact fixpoint, so the
    result equals the true transitive-closure minimum — the DuckDB
    recursive-CTE oracle can replay it exactly.
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    bidir = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = bidir.select("u").distinct().withColumn("lbl", F.col("u"))

    prev_sum = None
    for _ in range(max_iterations):
        neigh_min = (
            bidir.join(
                labels.select(F.col("u").alias("v"), F.col("lbl").alias("vlbl")), "v"
            )
            .groupBy("u")
            .agg(F.min("vlbl").alias("nlbl"))
        )
        labels = (
            labels.join(neigh_min, "u", "left")
            .select("u", F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"))
            .localCheckpoint(eager=False)
        )
        # sum(label) decreases strictly every round until the fixpoint;
        # one scalar action per round, nothing collected.
        cur_sum = labels.agg(F.sum("lbl")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("u").alias("node"), F.col("lbl").alias("cluster_id"))


def duplicate_clusters(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Cluster the pair graph and annotate membership: returns one row per
    clustered node with (node, cluster_id, cluster_size, is_canonical);
    canonical = the minimum node id of the cluster (so cluster_id itself).
    The downstream dedup action is `filter(~is_canonical)` -> drop list."""
    cc = connected_components(pairs, src, dst)
    w = Window.partitionBy("cluster_id")
    return (
        cc.withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("is_canonical", F.col("node") == F.col("cluster_id"))
    )
