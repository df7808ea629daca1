"""Connected components over candidate-duplicate pair graphs — the
clustering stage of the near-dup pipeline (LSH pairs -> duplicate
clusters -> one canonical keeper per cluster).

Reference capability: elasticsearch-hadoop has no graph operator; this is
part of the driver-mandated LLM-pipeline dedup extension (SURVEY.md §2.C
extensions).  The pair stage (operators/dedup.py minhash_lsh_pairs) finds
EDGES; real corpora need the transitive closure — A~B, B~C means A,B,C are
one duplicate cluster even when A~C never collided in a band.

Algorithm: iterative minimum-label propagation accelerated with pointer
jumping (path doubling), run to the exact fixpoint.
    label(v) <- min(label(v),            -- keep
                    label(label(v)),     -- pointer jump: label ids are
                                         -- node ids, so shortcut through
                                         -- the label's own label
                    min over neighbors u of label(u))
Each iteration is two hash-partitioned equi-joins (labels x labels on the
label id, edges x labels on node id) plus one groupBy-min — all shuffle on
narrow (node, label) rows, no cross product anywhere.  Plain neighbor
propagation moves a component's minimum one hop per round (O(diameter)
rounds); the jump term doubles the covered radius each round
(r -> 2r + 1), so convergence takes O(log diameter) rounds — the same
doubling idea as the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), kept in the
min-label formulation so the fixpoint provably equals the recursive-CTE
transitive-closure minimum the DuckDB oracle computes.  Measured on the
corpus fixture's 10-node chains: 10 rounds (+1 confirm) before, 4 (+1)
after — each round is a full Spark job, so rounds are the cost driver at
every scale.

Scale notes (100 TB):
- State per round is |V| (node, label) rows + the bidirected edge list —
  both tiny relative to the corpus (only docs that collided in a band).
  The jump join adds one more O(|V|) hash join per round against the
  round-start checkpointed labels (never a derived frame, so nothing is
  computed twice within a round).
- The convergence check is a single sum(label) aggregate (monotonically
  decreasing, integral): one count-free action per round, no collect of
  data rows.  Unchanged labels through BOTH the jump and the neighbor
  min imply the neighbor fixpoint alone holds, which is the exact
  min-reachable fixpoint.
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
    # seed with min(self, min neighbor) — one groupBy does what the old
    # identity seed needed a whole first round (join + groupBy + action) for
    labels = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("u"), F.col("mv")).alias("lbl"))
        .localCheckpoint(eager=False)
    )

    prev_sum = None
    for _ in range(max_iterations):
        # pointer jump: lbl <- min(lbl, lbl(lbl)).  Every label value is a
        # node id present in `labels`, so the lookup is a plain self-join of
        # the checkpointed round-start frame (left join is belt: the lookup
        # always hits).  This is what turns O(diameter) rounds into
        # O(log diameter).
        jumped = (
            labels.join(
                labels.select(F.col("u").alias("lbl"), F.col("lbl").alias("jlbl")),
                "lbl",
                "left",
            )
            .select("u", F.least(F.col("lbl"), F.coalesce("jlbl", "lbl")).alias("lbl"))
        )
        neigh_min = (
            bidir.join(
                labels.select(F.col("u").alias("v"), F.col("lbl").alias("vlbl")), "v"
            )
            .groupBy("u")
            .agg(F.min("vlbl").alias("nlbl"))
        )
        labels = (
            jumped.join(neigh_min, "u", "left")
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
