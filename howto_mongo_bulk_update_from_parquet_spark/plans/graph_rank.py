"""PageRank over the supplier→customer shipment graph — the classic
iterative-propagation algorithm, run for a fixed 3 iterations with a
full cross-engine oracle (the DuckDB side unrolls the iterations as
chained CTEs).

Iterative float discipline (same as `plans/kmeans.py` /
`plans/text_stats.py`): every per-edge contribution is a SINGLE IEEE
operation chain (pr/outdeg — one divide), rounded to 9 decimals and
summed as DECIMAL(20,9) so the fold is order-independent; the damping
update is single-multiply + single-add, re-rounded each iteration.
Identical inputs → identical bits in both engines, no shuffle-order
noise — proven by the value-hash gate.

Scale: each iteration is one groupBy(dst) shuffle of (dst, 9-decimal
contribution) pairs — map-side combinable, state is the rank vector
itself (a DataFrame, never driver-side). 3 fixed iterations keep the
lineage shallow; a convergence-driven variant would checkpoint every
~5 rounds exactly like `operators/graph.connected_components`.
Dangling mass (customers have no out-edges) is deliberately NOT
redistributed — both sides implement the same simplified update, so
ranks stay comparable; the docstring, not the oracle, carries the
caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

DAMPING = 0.85
N_ITER = 3

PAGERANK_ORACLE = f"""
WITH edges AS (
  SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), outdeg AS (
  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
), n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
pr0 AS (
  SELECT node, ROUND(1.0 / (SELECT n_nodes FROM n), 9) AS pr FROM nodes
),
pr1 AS (
  SELECT nd.node,
         ROUND((1 - {DAMPING}) / (SELECT n_nodes FROM n)
               + {DAMPING} * COALESCE(CAST(s.acc AS DOUBLE), 0), 9) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(ROUND(p.pr / d.deg, 9) AS DECIMAL(20,9))) AS acc
    FROM edges e JOIN pr0 p ON e.src = p.node JOIN outdeg d ON e.src = d.src
    GROUP BY e.dst) s ON nd.node = s.node
),
pr2 AS (
  SELECT nd.node,
         ROUND((1 - {DAMPING}) / (SELECT n_nodes FROM n)
               + {DAMPING} * COALESCE(CAST(s.acc AS DOUBLE), 0), 9) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(ROUND(p.pr / d.deg, 9) AS DECIMAL(20,9))) AS acc
    FROM edges e JOIN pr1 p ON e.src = p.node JOIN outdeg d ON e.src = d.src
    GROUP BY e.dst) s ON nd.node = s.node
),
pr3 AS (
  SELECT nd.node,
         ROUND((1 - {DAMPING}) / (SELECT n_nodes FROM n)
               + {DAMPING} * COALESCE(CAST(s.acc AS DOUBLE), 0), 9) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(ROUND(p.pr / d.deg, 9) AS DECIMAL(20,9))) AS acc
    FROM edges e JOIN pr2 p ON e.src = p.node JOIN outdeg d ON e.src = d.src
    GROUP BY e.dst) s ON nd.node = s.node
)
SELECT node, pr AS pagerank FROM pr3
"""


@register("q_pagerank", PAGERANK_ORACLE,
          "3-iteration PageRank over the supplier->customer graph — "
          "iterative propagation with an unrolled-CTE oracle, "
          "order-independent decimal contribution sums")
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (li.join(o, li.l_orderkey == o.o_orderkey)
             .select(F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
                     F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"))
             .distinct()
             .cache())  # reused 1 + N_ITER times; edge list ≪ fact table
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select("dst")).distinct().cache())
    outdeg = (edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
              .cache())   # reused every iteration — one aggregation, not N
    n_nodes = nodes.count()  # driver scalar, like the oracle's (SELECT n)

    pr = nodes.select("node", F.round(F.lit(1.0) / n_nodes, 9).alias("pr"))
    base = (1.0 - DAMPING) / n_nodes
    for _ in range(N_ITER):
        # one broadcast join per iteration, not two (r16): the
        # per-source emission rate pr/deg is a |sources|-row frame —
        # join rank to outdeg first (tiny ⋈ tiny), broadcast the
        # result onto the cached edge list. Same per-edge value, one
        # fewer join stage per round.
        rate = (outdeg.join(pr, outdeg.src == pr.node)
                .select("src", F.round(F.col("pr") / F.col("deg"), 9)
                        .cast("decimal(20,9)").alias("c")))
        contrib = (edges.join(F.broadcast(rate), "src")
                   .select(F.col("dst").alias("node"), "c"))
        acc = contrib.groupBy("node").agg(F.sum("c").alias("acc"))
        pr = (nodes.join(acc, "node", "left")
              .select("node",
                      F.round(F.lit(base) + DAMPING
                              * F.coalesce(F.col("acc").cast("double"),
                                           F.lit(0.0)), 9).alias("pr"))
              # cut the unrolled lineage each round (the
              # connected-components / q_shortest_paths idiom): local
              # timings are noise-level either way at 3 iterations,
              # but at real scale a deep iterative lineage is a
              # replan/stack-depth hazard that grows with rounds
              .localCheckpoint(eager=False))
    return pr.select("node", F.col("pr").alias("pagerank"))


# ---------------------------------------------------------------------------
# Triangle count + global clustering coefficient over the LSH near-dup
# graph (nodes = documents, edges = q_minhash_lsh_pairs candidates) —
# the standard cohesion diagnostic for dedup clusters: triangle-dense
# components are genuine duplicate families, triangle-free stars are
# usually banding accidents.
#
# Scale shape (node-iterator++): edges are ORIENTED low→high by the
# total order (degree, id) before the wedge join, so every wedge is
# generated at its lowest-degree apex — the O(m^1.5) bound that keeps
# hub nodes from exploding the intermediate. The oracle counts the
# same triangles declaratively from id-ordered edges; orientation
# changes only the join cost, never the count.
# ---------------------------------------------------------------------------

TRIANGLES_ORACLE = """
WITH pairs AS ({lsh_pairs}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs),
deg AS (
  SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY n
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT n_triangles FROM tri) AS n_triangles,
       CASE WHEN (SELECT SUM(d * (d - 1) / 2) FROM deg) = 0 THEN 0.0
            ELSE ROUND(3.0 * (SELECT n_triangles FROM tri)
                       / (SELECT SUM(d * (d - 1) / 2) FROM deg), 6)
       END AS clustering
"""


def _triangles_oracle() -> str:
    from .lsh import LSH_PAIRS_ORACLE
    return TRIANGLES_ORACLE.format(lsh_pairs=LSH_PAIRS_ORACLE)


@register("q_triangle_count", None,  # oracle installed below (CTE reuse)
          "triangle count + clustering coefficient of the LSH dup "
          "graph: degree-ordered edge orientation, wedge join bounded "
          "O(m^1.5); oracle = declarative id-ordered triple join")
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (lsh_bands, lsh_candidate_pairs,
                                   minhash_signatures, shingles)
    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(shingles(d, "doc_id", "text", 3), "doc_id", 16)
    pairs = lsh_candidate_pairs(lsh_bands(sig, "doc_id", 4), "doc_id")

    # the LSH pipeline (shingle → minhash → band join) feeds SIX plan
    # branches below (deg twice, orientation join, both wedge sides,
    # the closing semi join); cut it once — the edge list is tiny
    edges = (pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
             .localCheckpoint(eager=False))
    deg = (edges.select(F.col("u").alias("n"))
           .unionAll(edges.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d")))

    # orient each edge low→high by the total order (deg, id): wedges
    # form at the lower-degree endpoint, bounding the join fan-out
    withdeg = (edges
               .join(deg.select(F.col("n").alias("u"),
                                F.col("d").alias("du")), "u")
               .join(deg.select(F.col("n").alias("v"),
                                F.col("d").alias("dv")), "v"))
    ru = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    rv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = withdeg.select(
        F.when(ru < rv, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(ru < rv, rv).otherwise(ru).alias("hi_r"),
        F.when(ru < rv, F.col("v")).otherwise(F.col("u")).alias("hi")) \
        .localCheckpoint(eager=False)

    e1 = oriented.select("lo", F.col("hi").alias("w1"),
                         F.col("hi_r").alias("r1"))
    e2 = oriented.select("lo", F.col("hi").alias("w2"),
                         F.col("hi_r").alias("r2"))
    # wedge (w1, w2) at apex lo, ordered by rank so the closing edge's
    # own orientation (lower-rank endpoint first) matches lo=w1, hi=w2
    wedges = (e1.join(e2, "lo")
              .filter(F.col("r1") < F.col("r2"))
              .select(F.col("w1").alias("lo"), F.col("w2").alias("hi")))
    tri = wedges.join(oriented.select("lo", "hi"), ["lo", "hi"], "left_semi")

    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    wsum = deg.agg(F.sum(F.floor(F.col("d") * (F.col("d") - 1) / 2))
                   .alias("wedges"))
    out = (n_nodes.crossJoin(n_edges).crossJoin(n_tri).crossJoin(wsum))
    return out.select(
        "n_nodes", "n_edges", "n_triangles",
        F.when(F.col("wedges") == 0, F.lit(0.0))
         .otherwise(F.round(F.lit(3.0) * F.col("n_triangles")
                            / F.col("wedges"), 6)).alias("clustering"))


def _install_triangles_oracle() -> None:
    from .catalog import CATALOG, Query
    q = CATALOG["q_triangle_count"]
    CATALOG["q_triangle_count"] = Query(name=q.name, fn=q.fn,
                                        oracle=_triangles_oracle(), doc=q.doc)


_install_triangles_oracle()


# ---------------------------------------------------------------------------
# Min-plus shortest paths (Bellman-Ford, 3 relaxation rounds) over
# the undirected supplier↔customer shipment graph — the OTHER
# iterative-graph family next to PageRank's sum-propagation: each
# round is one edges⋈distances join + a groupBy(node) MIN, and MIN is
# order-insensitive, so unlike float sums the rounds need no rounding
# discipline at all: edge weights live as DECIMAL(12,2) (cast of the
# 2-rounded price — value-deterministic) and path sums stay exact
# decimals end-to-end. Sources: suppliers 1-3 at distance 0. The
# oracle unrolls the identical three rounds as chained CTEs.
#
# Scale: per round one shuffle keyed on node; the distance vector is
# a DataFrame (never driver state); fixed rounds keep lineage
# shallow, exactly like the PageRank note above.
# ---------------------------------------------------------------------------

SSSP_ROUNDS = 3

SSSP_ORACLE = """
WITH e1 AS (
  SELECT 's' || l_suppkey AS src, 'c' || o_custkey AS dst,
         MIN(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(12,2))) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT src, dst, w FROM e1
  UNION ALL
  SELECT dst, src, w FROM e1
),
d0 AS (
  SELECT DISTINCT src AS node, CAST(0 AS DECIMAL(18,2)) AS d
  FROM edges WHERE src IN ('s1', 's2', 's3')
),
d1 AS (
  SELECT node, MIN(d) AS d FROM (
    SELECT node, d FROM d0
    UNION ALL
    SELECT e.dst AS node, CAST(x.d + e.w AS DECIMAL(18,2)) AS d
    FROM d0 x JOIN edges e ON e.src = x.node
  ) GROUP BY node
),
d2 AS (
  SELECT node, MIN(d) AS d FROM (
    SELECT node, d FROM d1
    UNION ALL
    SELECT e.dst, CAST(x.d + e.w AS DECIMAL(18,2))
    FROM d1 x JOIN edges e ON e.src = x.node
  ) GROUP BY node
),
d3 AS (
  SELECT node, MIN(d) AS d FROM (
    SELECT node, d FROM d2
    UNION ALL
    SELECT e.dst, CAST(x.d + e.w AS DECIMAL(18,2))
    FROM d2 x JOIN edges e ON e.src = x.node
  ) GROUP BY node
)
SELECT node, CAST(d AS DOUBLE) AS dist FROM d3
"""


@register("q_shortest_paths", SSSP_ORACLE,
          "Bellman-Ford min-plus shortest paths, 3 relaxation rounds "
          "over the undirected shipment graph: exact decimal path "
          "sums, order-insensitive MIN per round; unrolled-CTE oracle")
def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    e1 = (li.join(o, li.l_orderkey == o.o_orderkey)
          .groupBy(F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
                   F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"))
          .agg(F.min(F.round("l_extendedprice", 2).cast("decimal(12,2)"))
               .alias("w")))
    edges = (e1.unionAll(e1.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"), "w"))
             .localCheckpoint(eager=False))  # reused every round

    dist = (edges.filter(F.col("src").isin("s1", "s2", "s3"))
            .select(F.col("src").alias("node")).distinct()
            .withColumn("d", F.lit(0).cast("decimal(18,2)")))
    for _ in range(SSSP_ROUNDS):
        relaxed = (dist.join(edges, dist.node == edges.src)
                   .select(F.col("dst").alias("node"),
                           (F.col("d") + F.col("w"))
                           .cast("decimal(18,2)").alias("d")))
        dist = (dist.unionAll(relaxed)
                .groupBy("node").agg(F.min("d").alias("d"))
                .localCheckpoint(eager=False))
    return dist.select("node", F.col("d").cast("double").alias("dist"))
