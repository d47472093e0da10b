"""schema.mode=strict (Delta schema enforcement): write batches
introducing unknown columns are refused before commit; merge (the
default) keeps today's widening behavior. Inherited like constraints;
explicit merge on one round evolves the schema.
"""

import pytest
from pyspark.sql import Row

from howto_mongo_bulk_update_from_parquet_spark.sinks import fs as hfs
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
    SchemaViolation, append_delete_delta, append_delta, read_merged,
    table_meta, upsert_into_keyed_table)


def _mk(spark, tmp_path, mode="strict"):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([Row(k=1, v=1.0), Row(k=2, v=2.0)])
    upsert_into_keyed_table(spark, df, path=path, key="k",
                            updated_at_col=None, schema_mode=mode)
    return path


def test_strict_blocks_new_columns_everywhere(spark, tmp_path):
    path = _mk(spark, tmp_path)
    assert table_meta(spark, path)["schema.mode"] == "strict"
    wide = spark.createDataFrame([Row(k=3, v=3.0, extra="x")])
    with pytest.raises(SchemaViolation, match="extra"):
        append_delta(spark, wide, path=path, key="k")
    assert not hfs.exists(spark, hfs.join(path, "delta_00001"))
    with pytest.raises(SchemaViolation, match="extra"):
        upsert_into_keyed_table(spark, wide, path=path, key="k",
                                updated_at_col=None)
    # known-column batches still flow
    append_delta(spark, spark.createDataFrame([Row(k=3, v=3.0)]),
                 path=path, key="k")
    # tombstones carry the engine marker, never "new"
    append_delete_delta(spark, spark.createDataFrame([Row(k=1)]),
                        path=path, key="k")
    assert read_merged(spark, path, "k").count() == 2


def test_merge_round_evolves_without_dropping_pin(spark, tmp_path):
    """ADVICE r13: one explicit schema_mode='merge' round is a BATCH
    override (Delta posture — mergeSchema doesn't disable table-level
    enforcement); the recorded strict pin survives with no re-pin
    round required."""
    path = _mk(spark, tmp_path)
    wide = spark.createDataFrame([Row(k=3, v=3.0, extra="x")])
    upsert_into_keyed_table(spark, wide, path=path, key="k",
                            updated_at_col=None, schema_mode="merge")
    assert table_meta(spark, path)["schema.mode"] == "strict"
    # `extra` is now part of the schema — strict admits it
    append_delta(spark, spark.createDataFrame([Row(k=5, v=5.0, extra="y")]),
                 path=path, key="k")
    # ...but a genuinely new column is refused with NO re-pin round
    with pytest.raises(SchemaViolation, match="more"):
        append_delta(spark,
                     spark.createDataFrame([Row(k=6, v=6.0, more=1)]),
                     path=path, key="k")


def test_unpin_removes_enforcement_persistently(spark, tmp_path):
    path = _mk(spark, tmp_path)
    upsert_into_keyed_table(
        spark, spark.createDataFrame([Row(k=3, v=3.0, extra="x")]),
        path=path, key="k", updated_at_col=None, schema_mode="unpin")
    assert "schema.mode" not in table_meta(spark, path)
    # widening now flows with no explicit mode at all
    append_delta(spark,
                 spark.createDataFrame([Row(k=6, v=6.0, more=1)]),
                 path=path, key="k")


def test_default_stays_merge(spark, tmp_path):
    path = _mk(spark, tmp_path, mode="merge")
    assert "schema.mode" not in table_meta(spark, path)
    append_delta(spark,
                 spark.createDataFrame([Row(k=3, v=3.0, extra="x")]),
                 path=path, key="k")
    out = read_merged(spark, path, "k")
    assert "extra" in out.columns and out.count() == 3


def test_updated_at_col_is_never_new(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([Row(k=1, v=1.0)])
    upsert_into_keyed_table(spark, df, path=path, key="k",
                            schema_mode="strict")   # updatedAt default
    upsert_into_keyed_table(spark, spark.createDataFrame([Row(k=2, v=2.0)]),
                            path=path, key="k")


def test_bad_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="schema_mode"):
        upsert_into_keyed_table(
            spark, spark.createDataFrame([Row(k=1, v=1.0)]),
            path=str(tmp_path / "t"), key="k", updated_at_col=None,
            schema_mode="nope")


def test_cli_gate(spark, tmp_path, capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    rc = main(["upsert", "--path", str(tmp_path), "--table",
               str(tmp_path / "t"), "--lsm", "--schema-mode", "strict"])
    assert rc == 2
    assert "schema-mode" in capsys.readouterr().err
