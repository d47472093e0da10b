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


def build_merge_sql(target: str, key: str, payload: list[str],
                    source_view: str = "__merge_source") -> str:
    """The MERGE statement both table formats share — reference upsert
    semantics (/root/reference/src/func/mongo.py:59-66): match on the
    key, SET every payload column through coalesce(source, target) so a
    NULL source field never clobbers an existing value (a bare
    `UPDATE SET *` would), and stamp updatedAt on every write."""
    sets = ", ".join(f"t.{c} = coalesce(s.{c}, t.{c})" for c in payload)
    inserts = ", ".join([key, *payload])
    values = ", ".join([f"s.{key}", *[f"s.{c}" for c in payload]])
    return f"""
        MERGE INTO {target} t
        USING {source_view} s ON t.{key} = s.{key}
        WHEN MATCHED THEN UPDATE SET {sets},
                                     t.updatedAt = current_timestamp()
        WHEN NOT MATCHED THEN INSERT ({inserts}, updatedAt)
                              VALUES ({values}, current_timestamp())
    """


def merge_into_delta(spark: SparkSession, source: DataFrame, *,
                     table_path: str, key: str,
                     payload: list[str] | None = None) -> None:
    """Delta MERGE with the reference's null-skip semantics (see
    build_merge_sql)."""
    if not delta_available(spark):
        raise NotImplementedError(
            "Delta Lake jars not on the classpath; use "
            "sinks.keyed_table.upsert_into_keyed_table (same semantics) "
            "or submit with --packages io.delta:delta-spark_2.13:<ver>")
    payload = payload or [c for c in source.columns if c != key]
    source.createOrReplaceTempView("__merge_source")
    spark.sql(build_merge_sql(f"delta.`{table_path}`", key, payload))


def merge_into_iceberg(spark: SparkSession, source: DataFrame, *,
                       table: str, key: str,
                       payload: list[str] | None = None) -> None:
    """Iceberg MERGE with the reference's null-skip semantics (see
    build_merge_sql). `table` is a catalog-qualified name
    (e.g. `my_catalog.db.events`) — Iceberg merges address catalog
    tables, not raw paths."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg jars not on the classpath; use "
            "sinks.keyed_table.upsert_into_keyed_table (same semantics) "
            "or submit with --packages "
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>")
    payload = payload or [c for c in source.columns if c != key]
    source.createOrReplaceTempView("__merge_source")
    spark.sql(build_merge_sql(table, key, payload))
