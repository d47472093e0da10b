"""Write-time CHECK constraints on the keyed table (Delta constraint
posture): enforced on every write batch BEFORE anything commits, SQL
CHECK semantics (NULL passes — demand non-null explicitly), recorded
in the manifest and inherited until dropped.
"""

import pytest
from pyspark.sql import Row

from howto_mongo_bulk_update_from_parquet_spark.sinks import fs as hfs
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
    ConstraintViolation, append_delta, compact, current_base_version,
    read_merged, table_meta, upsert_into_keyed_table)


def _mk(spark, tmp_path, **kw):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=i, val=float(i + 1), tag=f"t{i}") for i in range(5)])
    upsert_into_keyed_table(spark, df, path=path, key="k",
                            updated_at_col=None,
                            checks={"pos_val": "val > 0"}, **kw)
    return path


def test_violating_first_write_creates_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    bad = spark.createDataFrame([Row(k=1, val=-1.0, tag="x")])
    with pytest.raises(ConstraintViolation, match="pos_val"):
        upsert_into_keyed_table(spark, bad, path=path, key="k",
                                updated_at_col=None,
                                checks={"pos_val": "val > 0"})
    assert current_base_version(spark, path) == 0


def test_appends_enforce_inherited_checks(spark, tmp_path):
    path = _mk(spark, tmp_path)
    assert table_meta(spark, path)["check.pos_val"] == "val > 0"
    with pytest.raises(ConstraintViolation, match="pos_val"):
        append_delta(spark,
                     spark.createDataFrame([Row(k=9, val=-5.0, tag="x")]),
                     path=path, key="k")
    assert not hfs.exists(spark, hfs.join(path, "delta_00001"))
    append_delta(spark,
                 spark.createDataFrame([Row(k=9, val=5.0, tag="x")]),
                 path=path, key="k")
    assert read_merged(spark, path, "k").count() == 6


def test_null_passes_unless_demanded(spark, tmp_path):
    path = _mk(spark, tmp_path)
    # SQL CHECK: NULL result passes — the null-skip partial update
    # (val NULL = keep old value) must not be rejected by val > 0
    append_delta(spark,
                 spark.createDataFrame([Row(k=1, val=None, tag="u")],
                                       "k bigint, val double, tag string"),
                 path=path, key="k")
    # explicit NOT NULL rejects
    upsert_into_keyed_table(
        spark, spark.createDataFrame([Row(k=2, val=2.0, tag="y")]),
        path=path, key="k", updated_at_col=None,
        checks={"tag_set": "tag IS NOT NULL"})
    with pytest.raises(ConstraintViolation, match="tag_set"):
        append_delta(spark,
                     spark.createDataFrame([Row(k=3, val=3.0, tag=None)],
                                           "k bigint, val double, "
                                           "tag string"),
                     path=path, key="k")


def test_inherit_drop_one_and_all(spark, tmp_path):
    path = _mk(spark, tmp_path)
    good = spark.createDataFrame([Row(k=7, val=7.0, tag="z")])
    upsert_into_keyed_table(spark, good, path=path, key="k",
                            updated_at_col=None,
                            checks={"tag_set": "tag IS NOT NULL"})
    meta = table_meta(spark, path)
    assert meta["check.pos_val"] == "val > 0"       # inherited
    assert meta["check.tag_set"] == "tag IS NOT NULL"
    upsert_into_keyed_table(spark, good, path=path, key="k",
                            updated_at_col=None,
                            checks={"pos_val": ""})  # drop one
    meta = table_meta(spark, path)
    assert "check.pos_val" not in meta
    assert meta["check.tag_set"] == "tag IS NOT NULL"
    # negative val now allowed
    append_delta(spark,
                 spark.createDataFrame([Row(k=8, val=-8.0, tag="n")]),
                 path=path, key="k")
    compact(spark, path, "k")
    # the fold carries the remaining constraint forward
    assert table_meta(spark, path)["check.tag_set"] == "tag IS NOT NULL"


def test_violation_message_names_example_row(spark, tmp_path):
    path = _mk(spark, tmp_path)
    with pytest.raises(ConstraintViolation, match="'k': 9"):
        append_delta(spark,
                     spark.createDataFrame([Row(k=9, val=-1.0, tag="x")]),
                     path=path, key="k")


def test_cli_check_gates_and_set(spark, tmp_path, capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    # --check on --lsm appends: constraints are SET on table rounds
    rc = main(["upsert", "--path", str(tmp_path), "--table",
               str(tmp_path / "t"), "--lsm", "--check", "c=val > 0"])
    assert rc == 2
    assert "constraint" in capsys.readouterr().err


def test_cli_delete_where_predicate(spark, tmp_path, capsys):
    """Predicate delete: --where derives victims through the
    data-skipping scan, then deletes by key (tombstone or rewrite)."""
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    path = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id").alias("_id"), (F.col("id") % 10).alias("bucket"),
        F.rand(3).alias("v"))
    upsert_into_keyed_table(spark, df, path=path, key="_id",
                            updated_at_col=None, range_files=4,
                            stats_cols=["bucket"])
    rc = main(["delete", "--table", path, "--key", "_id",
               "--where", "bucket:7:7"])
    assert rc == 0
    assert "deleted 20 row(s)" in capsys.readouterr().out
    assert read_merged(spark, path, "_id").count() == 180
    # exactly-one-source gate
    rc = main(["delete", "--table", path, "--key", "_id",
               "--keys", "1", "--where", "bucket:1:1"])
    assert rc == 2
    assert "exactly one" in capsys.readouterr().err
    # tombstone form composes
    rc = main(["delete", "--table", path, "--key", "_id",
               "--where", "bucket:8:8", "--tombstone"])
    assert rc == 0
    assert read_merged(spark, path, "_id").count() == 160
