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
graphs pass `pointer_jump=True`: each round additionally hops through
the new label's label (path doubling), giving O(log diameter)
convergence — ~8 instead of ~63 rounds on a 64-chain (pytest-pinned)
— at the cost of a second join per round, which is why the
tiny-diameter dedup queries leave it off. `localCheckpoint` every
round truncates the growing lineage so round N's plan doesn't replay
rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", *,
                         max_iterations: int = 20,
                         loop_shuffle_partitions: int | None = 8,
                         pointer_jump: bool = False) -> DataFrame:
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
    so downstream consumers shuffle at the caller's width.

    CONCURRENCY: the width is scoped by flipping the session conf
    for the loop's duration (Spark offers no per-query override for
    groupBy/join shuffle width) — any OTHER query planned on the same
    SparkSession while the loop runs would silently plan at the
    narrowed width. The catalog/selfcheck harnesses execute queries
    serially, so this holds there; callers driving the session from
    multiple threads must pass `loop_shuffle_partitions=None` (no
    conf mutation — AQE's partition coalescing then recovers most of
    the narrow-width win by shrinking the tiny frontier shuffles at
    runtime)."""
    spark = pairs.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if loop_shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(loop_shuffle_partitions))
    try:
        return _components_loop(pairs, id_a, id_b, max_iterations,
                                pointer_jump)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _components_loop(pairs: DataFrame, id_a: str, id_b: str,
                     max_iterations: int,
                     pointer_jump: bool = False) -> DataFrame:
    labels, _ = _components_loop_stats(pairs, id_a, id_b, max_iterations,
                                       pointer_jump)
    return labels


def _components_loop_stats(pairs: DataFrame, id_a: str, id_b: str,
                           max_iterations: int,
                           pointer_jump: bool = True) -> tuple[DataFrame, int]:
    """Min-label propagation, optionally WITH pointer jumping: each
    round a node takes min(own, neighbors') label and — when
    `pointer_jump` — hops once through its new label's label (path
    doubling). Labels only decrease and always name a reachable node,
    so the fixpoint is the per-component min either way; the hop
    shortcuts label chains so convergence is O(log diameter) rounds
    instead of O(diameter) — the difference between ~8 and ~63 rounds
    on an adversarial 64-chain (pytest-pinned). Dedup candidate
    graphs have tiny diameters, so the catalog queries skip the hop
    (one join per round instead of two); flip it on for graphs whose
    components can chain. Returns (labels, rounds_run) including the
    final no-change round that proves the fixpoint."""
    edges = (pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
             .unionByName(pairs.select(F.col(id_b).alias("s"),
                                       F.col(id_a).alias("d")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("s").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        nbr_min = (edges.join(labels, edges.d == labels.node)
                   .groupBy("s").agg(F.min("label").alias("nbr_label")))
        stepped = (labels.join(nbr_min, labels.node == nbr_min.s, "left")
                   .select("node", F.col("label").alias("old_label"),
                           F.least("label", F.coalesce("nbr_label", "label"))
                            .alias("mid")))
        if pointer_jump:
            # follow the new label to ITS current label (mid is always
            # a node: either self or a neighbor's label, and labels of
            # labels only point lower)
            hop = labels.select(F.col("node").alias("hn"),
                                F.col("label").alias("hl"))
            stepped = (stepped.join(hop, stepped.mid == hop.hn, "left")
                       .select("node", "old_label",
                               F.least("mid", F.coalesce("hl", "mid"))
                                .alias("mid")))
        # the changed-count rides the round's checkpoint
        # materialization via an Observation (r17, guide §1.4): one
        # job per round instead of two (the r16 form paid a separate
        # count() against the checkpointed frame)
        import uuid as _uuid

        from pyspark.sql import Observation
        obs = Observation(f"cc_changed_{_uuid.uuid4().hex[:8]}")
        new_labels = (stepped
                      .select("node", F.col("mid").alias("label"),
                              (F.col("old_label") > F.col("mid"))
                              .alias("__chg"))
                      .observe(obs, F.sum(F.col("__chg").cast("long"))
                               .alias("__n"))
                      .localCheckpoint(eager=True))
        changed = int(obs.get["__n"] or 0)
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster")), rounds


def dedup_representatives(pairs: DataFrame, id_a: str = "id_a",
                          id_b: str = "id_b") -> DataFrame:
    """(node, cluster, keep): keep=true for the cluster representative
    (min id). Anti-joining a corpus against keep=false nodes removes
    every duplicate while retaining one exemplar per cluster."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.withColumn("keep", F.col("node") == F.col("cluster"))
