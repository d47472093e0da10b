"""Mergeable distinct-count sketches: Apache DataSketches HLL via
Spark's built-in `hll_sketch_agg` / `hll_union_agg` (JVM-side,
map-side combinable — the 100 TB answer to COUNT(DISTINCT) when the
exact shuffle is not worth it, and the ONLY answer when per-segment
sketches must be stored and re-unioned later without re-scanning).

No DuckDB oracle: DuckDB's approx_count_distinct is a different
algorithm with different estimates, so this is one of the catalog's
genuinely non-SQL-expressible entries (rows-only driver check). The
accuracy contract is pytest-pinned instead (tests/test_sketches.py):
lgK=14 → relative error ≤ ~1.6% at 3 sigma vs the exact count, and
the per-segment sketches UNION to the same estimate as one pass over
the union — the mergeability property that makes sketches composable
across partitions, days, and tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

LG_K = 14


@register("q_hll_distinct", None,
          "HLL distinct-user sketches per event_type + their union "
          "(DataSketches, lgK=14): mergeable approximate "
          "COUNT(DISTINCT); accuracy + merge law pytest-pinned")
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per = (e.groupBy("event_type")
           .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk")))
    per_est = per.select(
        F.col("event_type").alias("scope"),
        F.hll_sketch_estimate("sk").alias("approx_users"))
    # union of the per-segment sketches — NOT a rescan of events
    total = (per.agg(F.hll_union_agg("sk").alias("sk"))
             .select(F.lit("__all__").alias("scope"),
                     F.hll_sketch_estimate("sk").alias("approx_users")))
    return per_est.unionAll(total)


@register("q_pca_project", None,
          "PCA: one-pass Arrow-batch Gram partials, driver eigh over "
          "the 64x64 covariance (KB state), shuffle-free projection "
          "to 4 components; numpy-parity pinned in tests/test_pca.py")
def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import pca_fit, pca_project
    emb = load_table(spark, sf_dir, "embeddings")
    mu, comps, _ = pca_fit(emb, k=4)
    proj = pca_project(emb, mu, comps)
    return proj.select("vec_id", "label",
                       *[F.round(f"pc{i}", 6).alias(f"pc{i}")
                         for i in range(1, 5)])


# ---------------------------------------------------------------------------
# Declarative constraint audit over orders (operators/constraints.py):
# five row-local checks share ONE aggregation pass (sum(case) columns
# in a single agg — one scan however many constraints), uniqueness is
# count minus distinct in the same pass, and the referential check is
# one broadcast anti-join. The oracle states each constraint as a
# scalar subquery over the same predicates.
# ---------------------------------------------------------------------------

CONSTRAINT_ORACLE = """
SELECT 'not_null(o_custkey)' AS "constraint",
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
         AS n_violations
UNION ALL
SELECT 'accepted(o_orderstatus)',
       (SELECT COUNT(*) FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P')
           OR o_orderstatus IS NULL)
UNION ALL
SELECT 'range(o_totalprice)',
       (SELECT COUNT(*) FROM orders
        WHERE o_totalprice < 0 OR o_totalprice > 300000
           OR o_totalprice IS NULL)
UNION ALL
SELECT 'unique(o_orderkey)',
       (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
UNION ALL
SELECT 'fk(o_custkey)',
       (SELECT COUNT(*) FROM orders
        WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer))
"""

CONSTRAINT_ORACLE = ('SELECT "constraint", n_violations, '
                     "n_violations = 0 AS passed FROM (" +
                     CONSTRAINT_ORACLE + ")")


@register("q_constraint_audit", CONSTRAINT_ORACLE,
          "Deequ-style declarative audit: 4 row-local constraints in "
          "ONE aggregation pass + broadcast-anti-join FK check; "
          "report = (constraint, n_violations, passed)")
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import constraints as C
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return C.audit(o, [
        C.not_null("o_custkey"),
        C.accepted_values("o_orderstatus", ["O", "F", "P"]),
        C.in_range("o_totalprice", 0, 300000),
        C.unique("o_orderkey"),
        C.foreign_key("o_custkey", cust, "c_custkey"),
    ])
