"""Reference-core capabilities as oracle-checked queries: the keyed
bulk-upsert (the reference's entire reason to exist —
/root/reference/src/func/mongo.py:28-163) and the synthetic data
generator (/root/reference/src/cli/generate_data.py:55-68).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..operators.merge import keyed_upsert
from ..sources.generate import generate_pipeline_data
from ..sources.parquet import load_table

from .catalog import register

# Target = current customer "collection"; source = per-customer order
# rollup with (a) NULL payload fields on every 3rd key (exercises the
# null-skip rule, reference mongo.py:62), (b) an injected NULL-key row
# (dropped, reference mongo.py:50-53), (c) keys the target doesn't have
# are impossible here (o_custkey ⊆ c_custkey) so insert-path coverage
# comes from target rows absent in source (pass-through) + unit tests.
MERGE_ORACLE = """
WITH src AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal,
         CASE WHEN o_custkey % 3 = 0 THEN NULL ELSE 'UPDATED' END AS segment
  FROM orders GROUP BY o_custkey
), tgt AS (
  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal, c_mktsegment AS segment
  FROM customer
)
SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
       COALESCE(s.bal, t.bal) AS bal,
       COALESCE(s.segment, t.segment) AS segment
FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
"""


@register("q_merge_upsert", MERGE_ORACLE,
          "keyed bulk-upsert with null-skip + null-key-drop semantics "
          "(reference U1-U3) as full-outer-join + coalesce MERGE")
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    target = customer.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("bal"),
        F.col("c_mktsegment").alias("segment"))

    source = (orders.groupBy(F.col("o_custkey").alias("c_custkey"))
              .agg(F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("bal"))
              .withColumn("segment",
                          F.when(F.col("c_custkey") % 3 == 0, None)
                           .otherwise(F.lit("UPDATED"))))
    # inject a NULL-key row — the operator must drop it (reference note 3)
    null_row = spark.range(1).select(
        F.lit(None).cast("long").alias("c_custkey"),
        F.lit(9.99).alias("bal"),
        F.lit("GHOST").alias("segment"))
    source = source.unionByName(null_row)

    return keyed_upsert(target, source, key="c_custkey",
                        payload=["bal", "segment"], updated_at_col=None)


# The generator itself can't value-match a DuckDB oracle (Spark's
# seeded rand() stream is engine-specific), so the oracle checks the
# *contract*, every flag computed from the REAL generated data:
# deterministic id sequence (value-matched against range()), id
# uniqueness, every feature/score in [0,1), non-null score, and each
# nullable column's observed NULL count inside the binomial
# acceptance interval of the requested null_fraction (a generator
# wired to the wrong fraction — 0.5 vs 0.1 is ~22σ — fails the hash;
# the seeded-mutation pytest proves the flags discriminate).
GEN_ORACLE = """
SELECT printf('id-%012d', g) AS _id,
       TRUE AS features_in_range,
       TRUE AS score_in_range,
       TRUE AS score_not_null,
       TRUE AS ids_unique,
       TRUE AS null_counts_ok
FROM range(0, 2000) t(g)
"""


@register("q_generate", GEN_ORACLE,
          "distributed synthetic generator (reference G1): deterministic "
          "ids, bounded uniform features, seeded, null-fraction attested")
def q_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.generate import generation_contract
    df = generate_pipeline_data(spark, 2000, seed=42, null_fraction=0.1)
    feat_cols = [f"feature_{i}" for i in range(1, 5)]
    feat_ok = None
    for name in feat_cols:
        c = F.col(name).isNull() | ((F.col(name) >= 0) & (F.col(name) < 1))
        feat_ok = c if feat_ok is None else (feat_ok & c)
    checked = generation_contract(df, 2000, null_fraction=0.1,
                                  nullable_cols=feat_cols)
    return checked.select(
        "_id",
        feat_ok.alias("features_in_range"),
        ((F.col("score") >= 0) & (F.col("score") < 1)).alias("score_in_range"),
        F.col("score").isNotNull().alias("score_not_null"),
        "ids_unique", "null_counts_ok")


# ---------------------------------------------------------------------------
# JSONL corpus ingest: the interchange format LLM training corpora
# actually arrive in. The documents table is staged as JSONL once per
# fixture generation (mtime-keyed dir, like the DPP/bucketed copies)
# plus one deliberately corrupt file; the read is schema-explicit
# (no inference pass over millions of files) in PERMISSIVE mode with
# a _corrupt_record capture column, so malformed lines are COUNTED,
# never silently dropped and never fatal — the only sane posture when
# ingesting a crawl at scale.
# ---------------------------------------------------------------------------

JSONL_ORACLE = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
UNION ALL
SELECT '__corrupt__', 3, 0
"""


def _jsonl_stage_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_jsonl_{key}")


@register("q_jsonl_ingest", JSONL_ORACLE,
          "JSONL corpus ingest: schema-explicit PERMISSIVE read with "
          "corrupt-line capture — malformed lines counted, not fatal")
def q_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import types as T

    from ..sources.parquet import load_table
    path = _jsonl_stage_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (load_table(spark, sf_dir, "documents")
         .write.mode("overwrite").json(path))
        # three malformed lines in their own part file: json-write
        # escapes newlines inside strings, so every legit line is one
        # valid JSON object and exactly these three are corrupt
        with open(os.path.join(path, "zz_corrupt.json"), "w") as fh:
            fh.write("this is not json\n{truncated: \n,,,\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    df = (spark.read.schema(schema).option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path))
    # one pass, one groupBy: corrupt lines fold into their own label
    # (Spark refuses plans whose only referenced column is the
    # internal corrupt-record column, so the label derivation also
    # keeps the scan legal)
    label = (F.when(F.col("_corrupt_record").isNotNull(), "__corrupt__")
             .otherwise(F.col("lang")))
    return (df.groupBy(label.alias("lang"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.coalesce(F.sum("n_chars"), F.lit(0))
                  .cast("long").alias("total_chars")))


# ---------------------------------------------------------------------------
# CSV ingest, same posture as JSONL: schema-explicit (no inference),
# PERMISSIVE with corrupt-line capture. CSV quoting round-trips
# embedded delimiters/newlines; the deliberately broken part file
# carries rows whose arity/typing can't parse.
# ---------------------------------------------------------------------------

CSV_ORACLE = """
SELECT source, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM (SELECT c_mktsegment AS source, c_acctbal FROM customer)
GROUP BY source
UNION ALL
SELECT '__corrupt__', 2, 0
"""


def _csv_stage_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile
    src = os.path.join(sf_dir, "customer.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_csv_{key}")


@register("q_csv_ingest", CSV_ORACLE,
          "CSV ingest: schema-explicit PERMISSIVE read, quoted "
          "round-trip, corrupt rows counted into their own group")
def q_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import types as T

    from ..functions.numeric import dec
    from ..sources.parquet import load_table
    path = _csv_stage_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (load_table(spark, sf_dir, "customer")
         .select("c_custkey", "c_mktsegment", "c_acctbal")
         .write.mode("overwrite").option("header", "false").csv(path))
        # under-arity rows are the one malformation univocity flags
        # at the TOKENIZER level (probed on this Spark: bad casts null
        # the field and over-long rows silently drop the surplus)
        with open(os.path.join(path, "zz_corrupt.csv"), "w") as fh:
            fh.write("only_one_token\n")
            fh.write("12345,SHORT\n")
    schema = T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    # CSV corruption is judged against the columns the parser actually
    # parses: with parser column pruning on (default), a downstream
    # projection that drops c_custkey would also skip its failing cast
    # and silently UN-corrupt the row — pin full-row parsing so the
    # corrupt count doesn't depend on which columns the query touches
    from ..sources.parquet import _set_if_differs
    _set_if_differs(spark, "spark.sql.csv.parser.columnPruning.enabled",
                    "false")
    df = (spark.read.schema(schema).option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(path))
    label = (F.when(F.col("_corrupt_record").isNotNull(), "__corrupt__")
             .otherwise(F.col("c_mktsegment")))
    return (df.groupBy(label.alias("source"))
            .agg(F.count(F.lit(1)).alias("n_custs"),
                 F.coalesce(F.sum(dec("c_acctbal", 12, 2)).cast("double"),
                            F.lit(0.0)).alias("total_bal")))


# ---------------------------------------------------------------------------
# Schema evolution: a long-lived lake accumulates files written under
# different schema generations. Stage two generations of the customer
# table (gen-1 lacks the later `tier` column), then read the whole
# directory with mergeSchema — the union schema comes back with nulls
# for pre-evolution rows, which fold into a '__legacy__' bucket. At
# 100 TB this is the difference between migrating years of files and
# just reading them.
# ---------------------------------------------------------------------------

EVOLUTION_ORACLE = """
WITH g AS (
  SELECT c_custkey, c_acctbal, NULL AS tier
  FROM customer WHERE c_custkey % 2 = 0
  UNION ALL
  SELECT c_custkey, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 2 = 1
)
SELECT COALESCE(tier, '__legacy__') AS tier,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM g GROUP BY 1
"""


def _evolution_stage_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile
    src = os.path.join(sf_dir, "customer.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_evo_{key}")


@register("q_schema_evolution_read", EVOLUTION_ORACLE,
          "mergeSchema over two parquet schema generations: pre-"
          "evolution rows surface with null in the added column")
def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..functions.numeric import dec
    from ..sources.parquet import load_table
    path = _evolution_stage_path(sf_dir)
    done = os.path.join(path, "_STAGED")
    if not os.path.exists(done):
        c = load_table(spark, sf_dir, "customer")
        (c.filter(F.col("c_custkey") % 2 == 0)
         .select("c_custkey", "c_acctbal")
         .write.mode("overwrite").parquet(os.path.join(path, "gen1")))
        (c.filter(F.col("c_custkey") % 2 == 1)
         .select("c_custkey", "c_acctbal",
                 F.col("c_mktsegment").alias("tier"))
         .write.mode("overwrite").parquet(os.path.join(path, "gen2")))
        open(done, "w").close()
    df = (spark.read.option("mergeSchema", "true")
          .parquet(os.path.join(path, "gen1"), os.path.join(path, "gen2")))
    return (df.groupBy(F.coalesce(F.col("tier"), F.lit("__legacy__"))
                       .alias("tier"))
            .agg(F.count(F.lit(1)).alias("n_custs"),
                 F.sum(dec("c_acctbal", 12, 2)).cast("double")
                  .alias("total_bal")))


# ---------------------------------------------------------------------------
# XML ingest (Spark 4 built-in XML source), same posture as JSONL/CSV:
# schema-explicit, PERMISSIVE, corrupt rows counted into their own
# group. The corrupt part file is WELL-FORMED XML whose rows fail
# typing (like the CSV arity/type breakage) — a malformed document
# would abort the whole-file StAX parse rather than degrade per row.
# ---------------------------------------------------------------------------

XML_ORACLE = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
UNION ALL
SELECT '__corrupt__', 2, 0
"""


def _xml_stage_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_xml_{key}")


@register("q_xml_ingest", XML_ORACLE,
          "XML corpus ingest (Spark 4 built-in source): schema-explicit "
          "PERMISSIVE read, type-invalid rows counted, not fatal")
def q_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import types as T

    from ..sources.parquet import load_table
    path = _xml_stage_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (load_table(spark, sf_dir, "documents")
         .write.format("xml")
         .option("rootTag", "docs").option("rowTag", "doc")
         .mode("overwrite").save(path))
        with open(os.path.join(path, "zz_corrupt.xml"), "w") as fh:
            fh.write("<docs>"
                     "<doc><doc_id>6</doc_id><lang>xx</lang>"
                     "<n_chars>not a number</n_chars></doc>"
                     "<doc><doc_id>7</doc_id><lang>xx</lang>"
                     "<n_chars>also bad</n_chars></doc>"
                     "</docs>")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    df = (spark.read.format("xml").schema(schema)
          .option("rowTag", "doc")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .load(path))
    label = (F.when(F.col("_corrupt_record").isNotNull(), "__corrupt__")
             .otherwise(F.col("lang")))
    return (df.groupBy(label.alias("lang"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.coalesce(F.sum(F.when(F.col("_corrupt_record").isNull(),
                                         F.col("n_chars"))), F.lit(0))
                  .cast("long").alias("total_chars")))


# ---------------------------------------------------------------------------
# Fixed-width ingest through the custom Python DataSource
# (sources/fixedwidth.py) — the connector-development surface: real
# BatchScan node, one partition per file, filter pushdown applied
# inside the per-line parse. Spark trusts filters the reader accepts
# (no residual Filter node), so the oracle applying the same
# predicate checks the pushdown's correctness, not just the parse.
# ---------------------------------------------------------------------------

FIXEDWIDTH_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > 0
GROUP BY c_mktsegment
"""


def _fixedwidth_stage_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile
    src = os.path.join(sf_dir, "customer.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_fw_{key}")


@register("q_fixedwidth_ingest", FIXEDWIDTH_ORACLE,
          "fixed-width ingest via a custom Python DataSource: "
          "per-file partitions + parse-time filter pushdown")
def q_fixedwidth_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.fixedwidth import register_fixedwidth, write_fixedwidth
    from ..sources.parquet import load_table
    register_fixedwidth(spark)
    path = _fixedwidth_stage_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_fixedwidth(
            load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment", "c_acctbal"),
            path, [12, 12, 12])
    fw = (spark.read.format("fixedwidth")
          .schema("c_custkey long, c_mktsegment string, c_acctbal double")
          .option("widths", "12,12,12").load(path))
    return (fw.filter(F.col("c_acctbal") > 0)   # pushed into the parse
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_custs"),
                 F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
                  .cast("double").alias("total_bal")))


# MERGE with a DELETE branch — the op-typed changefeed shape (CDC
# consumers emit upserts AND deletes in one batch): rows flagged 'D'
# remove their key, rows flagged 'U' upsert with the null-skip rule.
# The keyed-table sinks carry the physical forms (versioned anti-join
# rewrite / LSM tombstones, tests/test_keyed_delete.py); this query
# proves the LOGICAL semantics against a SQL oracle. Delete wins over
# any same-batch upsert of the same key (tombstone-newest semantics).
MERGE_DELETE_ORACLE = """
WITH src AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal,
         CASE WHEN o_custkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders GROUP BY o_custkey
), tgt AS (
  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal, c_mktsegment AS segment
  FROM customer
), ups AS (
  SELECT c_custkey, bal,
         CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE 'UPDATED' END AS segment
  FROM src WHERE op = 'U'
), dels AS (
  SELECT c_custkey FROM src WHERE op = 'D'
)
SELECT m.c_custkey, m.bal, m.segment
FROM (
  SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
         COALESCE(s.bal, t.bal) AS bal,
         COALESCE(s.segment, t.segment) AS segment
  FROM tgt t FULL OUTER JOIN ups s ON t.c_custkey = s.c_custkey
) m
WHERE m.c_custkey NOT IN (SELECT c_custkey FROM dels)
"""


@register("q_merge_upsert_delete", MERGE_DELETE_ORACLE,
          "op-typed changefeed MERGE: one batch of 'U' upserts "
          "(null-skip) and 'D' deletes applied together — deletes "
          "anti-join after the upsert merge, so a same-batch delete "
          "wins over its own key's upsert")
def q_merge_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    target = customer.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("bal"),
        F.col("c_mktsegment").alias("segment"))
    src = (orders.groupBy(F.col("o_custkey").alias("c_custkey"))
           .agg(F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("bal"))
           .withColumn("op", F.when(F.col("c_custkey") % 7 == 0, "D")
                              .otherwise(F.lit("U"))))
    ups = (src.filter(F.col("op") == "U")
           .select("c_custkey", "bal",
                   F.when(F.col("c_custkey") % 3 == 0, None)
                    .otherwise(F.lit("UPDATED")).alias("segment")))
    dels = src.filter(F.col("op") == "D").select("c_custkey")
    merged = keyed_upsert(target, ups, key="c_custkey",
                          payload=["bal", "segment"], updated_at_col=None)
    # no broadcast hint: the delete set scales with the data (1/7 of
    # keys) — AQE broadcasts while it fits and degrades past that
    return merged.join(dels, "c_custkey", "left_anti")
