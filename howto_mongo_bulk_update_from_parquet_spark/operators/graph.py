"""Connected components over a pair list — the final stage of
near-dup dedup: candidate pairs → duplicate CLUSTERS → keep one
representative per cluster.

Algorithm: iterative min-label propagation (each node takes the min
of its own label and its neighbors'), converging in O(component
diameter) rounds — near-dup clusters are small and tight, so 2-4
rounds in practice. Each round is one shuffle-by-key join; the loop
runs in the driver but touches only DataFrame lineage, never rows.

Scale notes (100 TB): diameter-bound rounds are the right trade for
dedup graphs (many tiny components). For adversarial long-chain
graphs switch to large-star/small-star (O(log n) rounds, same
join-shape per round). `localCheckpoint` every round truncates the
growing lineage so round N's plan doesn't replay rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", *,
                         max_iterations: int = 20,
                         loop_shuffle_partitions: int | None = 8) -> DataFrame:
    """(node, cluster) for every node in `pairs`, cluster = min node id
    reachable in its component.

    `loop_shuffle_partitions` scopes the shuffle width of the
    iterative rounds (saved/restored around the loop): the label
    frontier is at most |V| rows — a sliver of the corpus the pairs
    came from — so per-round cost is task-launch overhead, not data;
    a narrow width halves wall-clock on candidate-pair graphs.
    Size it up (or pass None to inherit the session width) when a
    dedup graph's vertex set itself is cluster-scale. Every round's
    result is materialized inside the scope (eager localCheckpoint),
    so downstream consumers shuffle at the caller's width."""
    spark = pairs.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if loop_shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(loop_shuffle_partitions))
    try:
        return _components_loop(pairs, id_a, id_b, max_iterations)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _components_loop(pairs: DataFrame, id_a: str, id_b: str,
                     max_iterations: int) -> DataFrame:
    edges = (pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
             .unionByName(pairs.select(F.col(id_b).alias("s"),
                                       F.col(id_a).alias("d")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("s").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(max_iterations):
        nbr_min = (edges.join(labels, edges.d == labels.node)
                   .groupBy("s").agg(F.min("label").alias("nbr_label")))
        new_labels = (labels.join(nbr_min, labels.node == nbr_min.s, "left")
                      .select("node",
                              F.least("label", F.coalesce("nbr_label", "label"))
                               .alias("label"),
                              (F.col("label") >
                               F.coalesce("nbr_label", "label")).alias("__chg"))
                      .localCheckpoint(eager=True))
        changed = new_labels.filter(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster"))


def dedup_representatives(pairs: DataFrame, id_a: str = "id_a",
                          id_b: str = "id_b") -> DataFrame:
    """(node, cluster, keep): keep=true for the cluster representative
    (min id). Anti-joining a corpus against keep=false nodes removes
    every duplicate while retaining one exemplar per cluster."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.withColumn("keep", F.col("node") == F.col("cluster"))
