"""Delta Lake / Iceberg MERGE sinks — gated behind import/classpath
checks (the jars are not in this environment; SURVEY §2.1 U1 maps the
reference's upsert to their MERGE INTO).

When the jars are present these give the production-grade version of
sinks/keyed_table: ACID MERGE, snapshot isolation, compaction — the
null-skip semantics carry over via explicit coalesce SET clauses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _has_class(spark: SparkSession, cls: str) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


def delta_available(spark: SparkSession) -> bool:
    return _has_class(spark, "org.apache.spark.sql.delta.DeltaLog")


def iceberg_available(spark: SparkSession) -> bool:
    return _has_class(spark, "org.apache.iceberg.spark.SparkCatalog")


def merge_into_delta(spark: SparkSession, source: DataFrame, *,
                     table_path: str, key: str,
                     payload: list[str] | None = None) -> None:
    """Delta MERGE with the reference's null-skip semantics: every SET
    clause is coalesce(source, target) so a NULL source field never
    clobbers (a bare `UPDATE SET *` would)."""
    if not delta_available(spark):
        raise NotImplementedError(
            "Delta Lake jars not on the classpath; use "
            "sinks.keyed_table.upsert_into_keyed_table (same semantics) "
            "or submit with --packages io.delta:delta-spark_2.13:<ver>")
    payload = payload or [c for c in source.columns if c != key]
    source.createOrReplaceTempView("__merge_source")
    sets = ", ".join(f"t.{c} = coalesce(s.{c}, t.{c})" for c in payload)
    inserts = ", ".join([key, *payload])
    values = ", ".join([f"s.{key}", *[f"s.{c}" for c in payload]])
    spark.sql(f"""
        MERGE INTO delta.`{table_path}` t
        USING __merge_source s ON t.{key} = s.{key}
        WHEN MATCHED THEN UPDATE SET {sets},
                                     t.updatedAt = current_timestamp()
        WHEN NOT MATCHED THEN INSERT ({inserts}, updatedAt)
                              VALUES ({values}, current_timestamp())
    """)
