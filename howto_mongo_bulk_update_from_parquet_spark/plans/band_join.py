"""ε-band self-join via neighbor-bin candidates — the scale rewrite of
the inequality (theta) join `|a.v − b.v| ≤ ε`.

A naive theta join is a cross product with a filter (Spark plans
BroadcastNestedLoopJoin — O(n²) compares). Binning rewrites it as an
EQUI-join: every row lands in bin ⌊v/ε⌋; a qualifying pair's bins
differ by at most 1, so probing bins {b−1, b, b+1} (a 3-element
explode on one side) finds every candidate, and the exact |Δ| ≤ ε
filter keeps the result identical to the theta join — which is what
the oracle states declaratively (DuckDB plans it as an IEJoin).

At 100 TB: the equi-join shuffles on the bin key, candidates per row
are bounded by the 3-bin neighborhood's occupancy (data density × ε),
and a hot bin is an ordinary skew problem the repo's salting/AQE
machinery already handles — none of which exists for a nested-loop
theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import oracle_davg
from ..sources.parquet import load_table
from .catalog import register

EPS = 2.0  # dollars of o_totalprice

# Oracle shape note: the single theta join would carry THREE
# inequalities (two band bounds + the key tie-break), which defeats
# DuckDB's IEJoin (exactly-two-inequality fast path) and degenerates
# to a 277-second nested loop at sf0.1. The same pair set splits into
# an IEJoin-friendly strict-value-order join (two inequalities) plus
# an equal-value hash join with the key tie-break — still declarative,
# no binning. The ENGINE-side pairing rule is key-ordered while the
# oracle's is value-ordered; the aggregate is over the UNORDERED pair
# in both (gap and the status pair are symmetric: status columns are
# sorted below), so the results agree exactly.
BAND_JOIN_ORACLE = f"""
WITH pairs AS (
  SELECT LEAST(a.o_orderstatus, b.o_orderstatus) AS status_a,
         GREATEST(a.o_orderstatus, b.o_orderstatus) AS status_b,
         b.o_totalprice - a.o_totalprice AS gap
  FROM orders a JOIN orders b
    ON b.o_totalprice > a.o_totalprice
   AND b.o_totalprice <= a.o_totalprice + {EPS}
  UNION ALL
  SELECT LEAST(a.o_orderstatus, b.o_orderstatus),
         GREATEST(a.o_orderstatus, b.o_orderstatus),
         0.0
  FROM orders a JOIN orders b
    ON a.o_totalprice = b.o_totalprice
   AND a.o_orderkey < b.o_orderkey
)
SELECT status_a, status_b, COUNT(*) AS n_pairs,
       ROUND({oracle_davg('gap', 18, 9)}, 6) AS avg_gap
FROM pairs GROUP BY status_a, status_b
"""


def band_self_join(df: DataFrame, key: str, val: str,
                   eps: float) -> DataFrame:
    """All (a, b) row pairs with |a.val − b.val| ≤ eps, a.key < b.key,
    via the 3-bin equi-join rewrite. Columns come back suffixed _a/_b
    plus `gap`. Result is EXACTLY the theta join's."""
    binned = df.withColumn("bin", F.floor(F.col(val) / eps))
    others = [c for c in df.columns if c != key]
    probe = binned.select(
        F.col(key).alias("key_a"),
        *[F.col(c).alias(f"{c}_a") for c in others],
        F.explode(F.array(F.col("bin") - 1, F.col("bin"),
                          F.col("bin") + 1)).alias("bin"))
    build = binned.select(
        F.col(key).alias("key_b"),
        *[F.col(c).alias(f"{c}_b") for c in others], "bin")
    gap = F.abs(F.col(f"{val}_a") - F.col(f"{val}_b"))
    return (probe.join(build, "bin")
            .filter((F.col("key_a") < F.col("key_b")) & (gap <= eps))
            .withColumn("gap", gap)
            .drop("bin"))


@register("q_band_join_binned", BAND_JOIN_ORACLE,
          "|Δprice| <= eps self-join rewritten as a binned equi-join "
          "(3-bin probe + exact filter) — identical result to the "
          "theta join the oracle states; no nested loop anywhere")
def q_band_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    # canonical (sorted) status pair, matching the oracle's
    # LEAST/GREATEST — the engine pairs by key order, the oracle by
    # value order, and only the unordered pair is common to both
    pairs = (band_self_join(o, "o_orderkey", "o_totalprice", EPS)
             .withColumn("status_a", F.least("o_orderstatus_a",
                                             "o_orderstatus_b"))
             .withColumn("status_b", F.greatest("o_orderstatus_a",
                                                "o_orderstatus_b")))
    gap = F.col("gap")
    return (pairs.groupBy("status_a", "status_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.round(F.sum(gap.cast("decimal(18,9)")).cast("double")
                         / F.count(F.lit(1)), 6).alias("avg_gap")))


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (A-priori level 2): part pairs bought in
# the same order, support-thresholded. The pair space explodes per
# BASKET, not per table — a basket of s items yields s·(s−1)/2 pairs,
# generated array-locally from the basket's sorted part set (r16; was
# an l_orderkey-keyed self-join — same bounded fan-out, one fewer
# shuffle); the support filter prunes the long tail before the result
# materializes. At 100 TB the one watch-item is a pathological
# mega-basket, which is the same hot-key story as any skewed
# aggregation (salt or cap basket size upstream).
# ---------------------------------------------------------------------------

COOCCUR_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS support
FROM pairs GROUP BY part_a, part_b
HAVING COUNT(*) >= 3
"""


def _basket_pairs(parts_col: str):
    """All ordered pairs (a < b) from one basket's SORTED distinct
    part array, as an array<struct<part_a,part_b>> — the s·(s−1)/2
    fan-out happens array-locally in codegen, so the per-basket pair
    expansion needs NO self-join: one shuffle on the basket key (with
    map-side collect_set), one on the pair (r16; the self-join form
    planned the distinct subtree twice and shuffled items twice —
    guide §2.4). Sortedness makes position order = value order, so
    slicing past the current element yields exactly the a < b pairs."""
    arr = F.col(parts_col)
    return F.flatten(F.transform(
        arr,
        lambda x, i: F.transform(
            F.slice(arr, i + F.lit(2), F.size(arr)),
            lambda y: F.struct(x.alias("part_a"), y.alias("part_b")))))


@register("q_cooccur_pairs", COOCCUR_ORACLE,
          "market-basket co-occurrence: basket-local pair expansion "
          "(fan-out bounded by basket size, no self-join), "
          "support >= 3; A-priori L2")
def q_cooccur_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (li.groupBy("l_orderkey")
               .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps")))
    return (baskets.select(F.explode(_basket_pairs("ps")).alias("pr"))
            .select("pr.part_a", "pr.part_b")
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= 3))


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over each user's event stream:
# (from_type → to_type) counts and row-normalized probabilities. The
# sequencing window is PARTITIONED BY user_id (key-local sort inside a
# hash partition — the sanctioned window shape); the normalizing
# per-from totals come back via a tiny broadcast join, not a second
# window. Probability = one integer→double divide, identical in both
# engines; ROUND(…,6) for the hash gate.
# ---------------------------------------------------------------------------

MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
totals AS (
  SELECT from_type, SUM(n) AS tot FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type, t.n,
       ROUND(CAST(t.n AS DOUBLE) / tot.tot, 6) AS p
FROM trans t JOIN totals tot ON t.from_type = tot.from_type
"""


@register("q_markov_transitions", MARKOV_ORACLE,
          "first-order Markov transition matrix over per-user event "
          "streams: key-partitioned LEAD window, broadcast-joined "
          "row normalization")
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(F.col("event_type").alias("from_type"),
                   F.lead("event_type").over(w).alias("to_type"))
    trans = (seq.filter(F.col("to_type").isNotNull())
             .groupBy("from_type", "to_type")
             .agg(F.count(F.lit(1)).alias("n")))
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (trans.join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type", "n",
                    F.round(F.col("n").cast("double") / F.col("tot"), 6)
                     .alias("p")))


# ---------------------------------------------------------------------------
# User journey paths: each user's event sequence folded into an
# ordered ENTRY-path string (first 3 steps; full paths are near-
# unique, prefixes are where journeys cluster), then counted — the
# product-analytics "top paths" view.
# The ordered fold is collect_list(struct(ts, id, type))
# → array_sort → join: ORDER-DETERMINISTIC because the sort key is the
# full (ts, event_id) tuple, matching the oracle's string_agg ORDER BY
# exactly. One shuffle on user_id (the fold), one on path (the count);
# path length is bounded per user, so the array state is too.
# ---------------------------------------------------------------------------

USER_PATHS_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 3 GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM paths GROUP BY path HAVING COUNT(*) >= 2
"""


@register("q_user_paths", USER_PATHS_ORACLE,
          "top user journey entry paths (first 3 steps): ordered fold "
          "(collect_list struct -> array_sort -> join) per user, "
          "then path counts; support >= 2")
def q_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W
    e = load_table(spark, sf_dir, "events")
    # rank-filter BEFORE the fold (the oracle's shape): the collect
    # state is then <= 3 structs per user instead of the user's whole
    # history — the difference between bounded and unbounded agg state
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    top3 = (e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3))
    step = F.struct(F.col("rn"), F.col("event_type"))
    paths = (top3.groupBy("user_id")
             .agg(F.array_join(
                 F.transform(F.array_sort(F.collect_list(step)),
                             lambda s: s["event_type"]),
                 ">").alias("path")))
    return (paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
            .filter(F.col("n_users") >= 2))


# ---------------------------------------------------------------------------
# Nested-document round trip — the reference's actual payload shape
# (mongo upserts nest line items under the order; reference
# src/func/mongo.py builds one document per key). Build the nested
# doc with an ordered collect, then prove the flatten inverts it. The
# nested column itself can't cross the value-hash gate (engines
# stringify structs differently), so the output is the hash-safe
# flattened view: per-order item count and the ordered item-key csv.
# ---------------------------------------------------------------------------

NEST_ROUNDTRIP_ORACLE = """
WITH docs AS (
  SELECT o.o_orderkey,
         list(struct_pack(pk := l.l_partkey, ln := l.l_linenumber)
              ORDER BY l.l_linenumber, l.l_partkey) AS items
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey
),
flat AS (
  SELECT o_orderkey, unnest(items, recursive := true)
  FROM docs
)
SELECT o_orderkey, COUNT(*) AS n_items,
       string_agg(CAST(pk AS VARCHAR), ',' ORDER BY ln, pk) AS item_keys
FROM flat GROUP BY o_orderkey
"""


@register("q_nest_roundtrip", NEST_ROUNDTRIP_ORACLE,
          "nested-document build (ordered items array per order, the "
          "mongo upsert payload shape; cf reference src/func/mongo.py "
          "update construction) + flatten round-trip, hash-safe output")
def q_nest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    item = F.struct(F.col("l_linenumber").alias("ln"),
                    F.col("l_partkey").alias("pk"))
    docs = (o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.array_sort(F.collect_list(item)).alias("items")))
    flat = docs.select("o_orderkey", F.explode("items").alias("it"))
    return (flat.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.array_join(F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("it.ln"), F.col("it.pk")))),
                     lambda s: s["pk"].cast("string")), ",")
                  .alias("item_keys")))


# ---------------------------------------------------------------------------
# 2-D proximity self-join (the spatial-join shape): all point pairs
# within Euclidean eps, via GRID CELLS — floor(x/eps), floor(y/eps) —
# and a 3x3 neighbor-cell probe, then the exact dist² ≤ eps² filter.
# The 1-D band join's rewrite lifted one dimension up: candidates per
# point are bounded by the 9-cell neighborhood's occupancy, the join
# is an equi-join on the cell key, and no nested loop exists anywhere.
# Coordinates derive deterministically from c_custkey by INTEGER
# arithmetic (modular lattice / 10.0), so both engines start from
# identical doubles and the boundary comparisons agree bit-for-bit.
# The oracle uses the same IEJoin-friendly split as the 1-D oracle:
# strict-x-order band join (two inequalities) + equal-x hash join.
# ---------------------------------------------------------------------------

GEO_EPS = 0.5

GEO_NEIGHBORS_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS k,
         ((c_custkey * 37) % 1000) / 10.0 AS x,
         ((c_custkey * 91) % 1000) / 10.0 AS y
  FROM customer
),
pairs AS (
  SELECT LEAST(a.k, b.k) AS key_a, GREATEST(a.k, b.k) AS key_b,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM pts a JOIN pts b
    ON b.x > a.x AND b.x <= a.x + {GEO_EPS}
  WHERE ABS(a.y - b.y) <= {GEO_EPS}
    AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= {GEO_EPS} * {GEO_EPS}
  UNION ALL
  SELECT a.k, b.k,
         (a.y - b.y) * (a.y - b.y)
  FROM pts a JOIN pts b
    ON a.x = b.x AND a.k < b.k
  WHERE ABS(a.y - b.y) <= {GEO_EPS}
)
SELECT key_a, key_b, ROUND(d2, 6) AS dist2 FROM pairs
"""


@register("q_geo_neighbors", GEO_NEIGHBORS_ORACLE,
          "2-D proximity self-join: grid cells + 3x3 neighbor probe + "
          "exact dist² filter — the spatial join as an equi-join, "
          "no nested loop; derived lattice coordinates")
def q_geo_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") * 37 % 1000) / 10.0).alias("x"),
        ((F.col("c_custkey") * 91 % 1000) / 10.0).alias("y"))
    cells = pts.select(
        "k", "x", "y",
        F.floor(F.col("x") / GEO_EPS).alias("cx"),
        F.floor(F.col("y") / GEO_EPS).alias("cy"))
    probe = cells.select(
        F.col("k").alias("key_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(F.array(*[F.struct(
            (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("c")) \
        .select("key_a", "xa", "ya", "c.cx", "c.cy")
    build = cells.select(
        F.col("k").alias("key_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"), "cx", "cy")
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    return (probe.join(build, ["cx", "cy"])
            .filter((F.col("key_a") < F.col("key_b"))
                    & (d2 <= GEO_EPS * GEO_EPS))
            .select("key_a", "key_b", F.round(d2, 6).alias("dist2")))


# ---------------------------------------------------------------------------
# Association rules (A-priori L2 → rules): for every supported part
# pair, directed confidence P(B|A) = supp(AB)/supp(A) and lift
# P(AB)/(P(A)·P(B)). Item supports come back to the pair table as a
# tiny broadcast (the frequent-item list is support-thresholded, so
# it shrinks as the corpus grows); the probability arithmetic is
# integer counts through fixed IEEE division — bit-identical across
# engines. Both rule directions emit from one pair row (no second
# join).
# ---------------------------------------------------------------------------

ASSOC_RULES_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items),
item_supp AS (
  SELECT l_partkey, COUNT(*) AS supp FROM items GROUP BY l_partkey
),
pair_supp AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS supp_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 3
),
rules AS (
  SELECT part_a AS antecedent, part_b AS consequent,
         supp_ab, sa.supp AS supp_a, sb.supp AS supp_b, n.n_baskets
  FROM pair_supp
  JOIN item_supp sa ON sa.l_partkey = part_a
  JOIN item_supp sb ON sb.l_partkey = part_b
  CROSS JOIN n
  UNION ALL
  SELECT part_b, part_a, supp_ab, sb.supp, sa.supp, n.n_baskets
  FROM pair_supp
  JOIN item_supp sa ON sa.l_partkey = part_a
  JOIN item_supp sb ON sb.l_partkey = part_b
  CROSS JOIN n
)
SELECT antecedent, consequent, supp_ab,
       ROUND(CAST(supp_ab AS DOUBLE) / supp_a, 6) AS confidence,
       ROUND(CAST(supp_ab AS DOUBLE) * n_baskets
             / (CAST(supp_a AS DOUBLE) * supp_b), 6) AS lift
FROM rules
"""


@register("q_assoc_rules", ASSOC_RULES_ORACLE,
          "association rules from supported pairs: directed "
          "confidence + lift via broadcast item supports; both "
          "directions from one pair row")
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one shuffle builds the per-basket sorted part sets; baskets,
    # supports and pairs all derive from it (r16: replaces the
    # distinct + self-join form — see _basket_pairs)
    baskets = (li.groupBy("l_orderkey")
               .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
               .localCheckpoint(eager=False))
    n_baskets = baskets.count()
    item_supp = (baskets.select(F.explode("ps").alias("l_partkey"))
                 .groupBy("l_partkey").agg(F.count(F.lit(1)).alias("supp")))
    pair_supp = (baskets.select(F.explode(_basket_pairs("ps")).alias("pr"))
                 .select("pr.part_a", "pr.part_b")
                 .groupBy("part_a", "part_b")
                 .agg(F.count(F.lit(1)).alias("supp_ab"))
                 .filter(F.col("supp_ab") >= 3))
    sa = item_supp.select(F.col("l_partkey").alias("part_a"),
                          F.col("supp").alias("supp_a"))
    sb = item_supp.select(F.col("l_partkey").alias("part_b"),
                          F.col("supp").alias("supp_b"))
    joined = (pair_supp.join(F.broadcast(sa), "part_a")
              .join(F.broadcast(sb), "part_b"))
    # both rule directions from ONE pair row (r16: the fwd/rev
    # union planned the whole pair-join subtree twice — 24 Exchanges
    # in the before-plan; an inline 2-struct array keeps it one pass)
    rules = joined.select(F.inline(F.array(
        F.struct(F.col("part_a").alias("antecedent"),
                 F.col("part_b").alias("consequent"),
                 F.col("supp_ab"),
                 F.col("supp_a").alias("s_ante"),
                 F.col("supp_b").alias("s_cons")),
        F.struct(F.col("part_b").alias("antecedent"),
                 F.col("part_a").alias("consequent"),
                 F.col("supp_ab"),
                 F.col("supp_b").alias("s_ante"),
                 F.col("supp_a").alias("s_cons")))))
    return rules.select(
        "antecedent", "consequent", "supp_ab",
        F.round(F.col("supp_ab").cast("double") / F.col("s_ante"), 6)
         .alias("confidence"),
        F.round(F.col("supp_ab").cast("double") * n_baskets
                / (F.col("s_ante").cast("double") * F.col("s_cons")), 6)
         .alias("lift"))
