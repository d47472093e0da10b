"""Cross-system reconciliation checksum and z-order layout clustering
— the operational pair for a 100 TB bulk-load pipeline: prove the sink
holds exactly the source rows, and lay files out so both query
dimensions prune.

- `q_table_checksum`: order-independent per-group content checksum.
  This is the missing verification step of the reference's pipeline
  (parquet → transform → Mongo bulk upsert, reference
  `src/func/mongo.py:272-301` writes and never re-reads): run the
  same checksum over the source parquet and over a sink export, and
  equal (n_rows, sum, xor) per group proves set equality without
  moving or sorting either side. Commutative aggregates (SUM over
  DECIMAL(38,0), BIT_XOR) make the result partition- and
  order-invariant, so the two sides can be computed on different
  engines with different parallelism.
- `q_zorder_layout`: Morton/z-order interleaving of two key
  dimensions, then per-z-range min/max extents — the layout audit
  that shows each z-bucket covers a bounded rectangle in (x, y), which
  is exactly why writing files in z order lets parquet min/max
  statistics prune BOTH dimensions (a single-column sort prunes one).
  The bit-interleave is pure integer expression work (JVM codegen,
  identical semantics in the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import portable_hash64
from ..sources.parquet import load_table
from .catalog import register


# ---------------------------------------------------------------------------
# Order-independent table checksum (sink reconciliation)
# ---------------------------------------------------------------------------

CHECKSUM_ORACLE = """
WITH canon AS (
  SELECT l_returnflag,
         CAST(('0x' || substr(md5(concat_ws('|',
              l_orderkey, l_linenumber,
              CAST(l_quantity AS DECIMAL(18,2)),
              CAST(l_extendedprice AS DECIMAL(18,2)),
              CAST(l_discount AS DECIMAL(18,2)),
              l_returnflag, l_linestatus,
              strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'))), 1, 15)) AS BIGINT) AS h
  FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS checksum_sum,
       BIT_XOR(h) AS checksum_xor
FROM canon GROUP BY l_returnflag
"""


def row_canonical(cols: list[Column]) -> Column:
    """Canonical '|'-joined row rendering: every numeric pinned to a
    decimal rendering both engines print identically (doubles are NOT
    canonical across engines; DECIMAL(18,2) is)."""
    return F.concat_ws("|", *cols)


@register("q_table_checksum", CHECKSUM_ORACLE,
          "order-independent per-group content checksum (md5-derived "
          "60-bit row hash, SUM + BIT_XOR) for source<->sink reconciliation")
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation checksum over lineitem, grouped by returnflag.

    Scale: one scan, map-side-combinable commutative aggregates, a
    3-key shuffle of 24-byte partials — the cheapest possible proof
    that a 100 TB copy holds the same multiset of rows as its source.
    SUM runs over DECIMAL(38,0) (60-bit hash × row count overflows
    int64 at ~16 M rows; decimal does not), XOR is the independent
    second witness (a SUM collision and an XOR collision would have
    to coincide). Grouping by a low-cardinality column localizes a
    mismatch to a group before any row-level diff (`operators/diff.py`
    is the row-level follow-up).
    """
    li = load_table(spark, sf_dir, "lineitem")
    canon = row_canonical([
        F.col("l_orderkey"), F.col("l_linenumber"),
        F.col("l_quantity").cast("decimal(18,2)"),
        F.col("l_extendedprice").cast("decimal(18,2)"),
        F.col("l_discount").cast("decimal(18,2)"),
        F.col("l_returnflag"), F.col("l_linestatus"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss"),
    ])
    h = portable_hash64(canon)
    return (li.select("l_returnflag", h.alias("h"))
              .groupBy("l_returnflag")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum(F.col("h").cast("decimal(38,0)"))
                    .cast("string").alias("checksum_sum"),
                   F.bit_xor("h").alias("checksum_xor")))


# ---------------------------------------------------------------------------
# Z-order (Morton) layout clustering
# ---------------------------------------------------------------------------

_SPREAD_MASKS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                 (2, 0x33333333), (1, 0x55555555))


def spread16(c: Column) -> Column:
    """Spread a 16-bit value's bits into the even positions of a
    32-bit lane (Morton encoding half, the standard mask cascade)."""
    c = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_MASKS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def zorder2(x: Column, y: Column) -> Column:
    """32-bit Morton code of two 16-bit dimensions (x in even bits)."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def _spread16_sql(expr: str) -> str:
    e = f"({expr} & 65535)"
    for shift, mask in _SPREAD_MASKS:
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


def _zorder2_sql(x: str, y: str) -> str:
    return f"({_spread16_sql(x)} | ({_spread16_sql(y)} << 1))"


ZORDER_BUCKET_SHIFT = 24  # 32-bit z >> 24 → 256 layout buckets

ZORDER_ORACLE = f"""
WITH src AS (
  SELECT o_custkey AS xr,
         CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS yr
  FROM orders
), b AS (
  SELECT MIN(xr) AS xmin, MAX(xr) AS xmax,
         MIN(yr) AS ymin, MAX(yr) AS ymax
  FROM src
), s AS (
  SELECT ((xr - xmin) * 65536) // (xmax - xmin + 1) AS x,
         ((yr - ymin) * 65536) // (ymax - ymin + 1) AS y
  FROM src, b
), z AS (
  SELECT x, y, {_zorder2_sql('x', 'y')} >> {ZORDER_BUCKET_SHIFT} AS zbucket
  FROM s
)
SELECT zbucket, COUNT(*) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM z GROUP BY zbucket
"""


@register("q_zorder_layout", ZORDER_ORACLE,
          "Morton/z-order interleave of (custkey, order day) + per-z-range "
          "extents: the 2-D layout audit behind multi-column file pruning")
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit over orders.

    `zorder2` is the write-side clustering key: at 100 TB you
    `repartitionByRange(z).sortWithinPartitions(z)` before the parquet
    write so each file's (x, y) min/max footer stats cover a bounded
    rectangle, and point/range predicates on EITHER dimension prune
    files (see `q_dpp_partition_pruned_join` for the partition-level
    variant; this is the intra-file/row-group level). The query itself
    reports per-z-bucket extents — the audit a table-maintenance job
    emits to prove the clustering holds (Delta OPTIMIZE ZORDER BY
    publishes the same shape). All integer bit work, whole-stage
    codegen, one 256-key map-side-combined aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    src = o.select(
        F.col("o_custkey").alias("xr"),
        (F.col("o_orderdate").cast("long") / 86400).cast("long").alias("yr"))
    # Min-max scale each dimension onto the full 16-bit Morton input
    # range (a 4-value broadcast, the same scalar-bounds shape as the
    # generator contract) so the interleave's high bits discriminate
    # at ANY key cardinality — unscaled low-cardinality keys would
    # leave the top bits constant and every row in one z-bucket.
    b = F.broadcast(src.agg(F.min("xr").alias("xmin"), F.max("xr").alias("xmax"),
                            F.min("yr").alias("ymin"), F.max("yr").alias("ymax")))
    # `div`, not `/`-then-cast: the quotient must be EXACT integer
    # floor division (the oracle's `//`); a double-precision divide
    # can land an integer-valued ratio at x.99999… and truncate low.
    s = (src.crossJoin(b)
         .select(F.expr("((xr - xmin) * 65536) div (xmax - xmin + 1)").alias("x"),
                 F.expr("((yr - ymin) * 65536) div (ymax - ymin + 1)").alias("y")))
    z = s.withColumn(
        "zbucket", F.shiftright(zorder2(F.col("x"), F.col("y")),
                                ZORDER_BUCKET_SHIFT))
    return (z.groupBy("zbucket")
             .agg(F.count(F.lit(1)).alias("n_rows"),
                  F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                  F.min("y").alias("y_min"), F.max("y").alias("y_max")))
