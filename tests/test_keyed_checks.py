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


def test_partial_payload_omitting_checked_column_passes(spark, tmp_path):
    """ADVICE r13 (medium): a null-skip partial batch may OMIT a
    column a CHECK references — absent == NULL == passes, same as the
    explicit-NULL row; it must not crash with an unresolved-column
    AnalysisException."""
    path = _mk(spark, tmp_path)                 # check: val > 0
    append_delta(spark,
                 spark.createDataFrame([Row(k=1, tag="patched")],
                                       "k bigint, tag string"),
                 path=path, key="k")
    merged = {r["k"]: r for r in read_merged(spark, path, "k").collect()}
    assert merged[1]["tag"] == "patched" and merged[1]["val"] == 2.0
    # upsert path too
    upsert_into_keyed_table(
        spark, spark.createDataFrame([Row(k=2, tag="up")],
                                     "k bigint, tag string"),
        path=path, key="k", updated_at_col=None)
    # ...and an omitted column under IS NOT NULL behaves like the
    # explicit NULL it stands for: refused
    upsert_into_keyed_table(
        spark, spark.createDataFrame([Row(k=3, val=3.0, tag="t")]),
        path=path, key="k", updated_at_col=None,
        checks={"tag_set": "tag IS NOT NULL"})
    with pytest.raises(ConstraintViolation, match="tag_set"):
        append_delta(spark,
                     spark.createDataFrame([Row(k=4, val=4.0)],
                                           "k bigint, val double"),
                     path=path, key="k")


def test_empty_dict_drops_all_checks(spark, tmp_path):
    """ADVICE r13: checks={} is the documented drop-all form."""
    path = _mk(spark, tmp_path)
    upsert_into_keyed_table(
        spark, spark.createDataFrame([Row(k=7, val=7.0, tag="z")]),
        path=path, key="k", updated_at_col=None, checks={})
    assert not [k for k in table_meta(spark, path) if k.startswith("check.")]
    append_delta(spark,
                 spark.createDataFrame([Row(k=8, val=-8.0, tag="n")]),
                 path=path, key="k")            # negative now fine


def test_new_check_validates_existing_rows(spark, tmp_path):
    """ADVICE r13: introducing a CHECK on a table whose HISTORY
    violates it is refused (Delta ADD CONSTRAINT validates existing
    data) — the batch alone passing is not enough."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([Row(k=1, val=-1.0), Row(k=2, val=2.0)])
    upsert_into_keyed_table(spark, df, path=path, key="k",
                            updated_at_col=None)
    good = spark.createDataFrame([Row(k=3, val=3.0)])
    with pytest.raises(ConstraintViolation, match="existing table state"):
        upsert_into_keyed_table(spark, good, path=path, key="k",
                                updated_at_col=None,
                                checks={"pos_val": "val > 0"})
    # nothing committed — the violating constraint is not recorded
    assert "check.pos_val" not in table_meta(spark, path)
    # an update round that FIXES the history lands with the check
    fix = spark.createDataFrame([Row(k=1, val=1.0), Row(k=3, val=3.0)])
    upsert_into_keyed_table(spark, fix, path=path, key="k",
                            updated_at_col=None,
                            checks={"pos_val": "val > 0"})
    assert table_meta(spark, path)["check.pos_val"] == "val > 0"


def test_cli_check_requires_eq(spark, tmp_path, capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    rc = main(["upsert", "--path", str(tmp_path), "--table",
               str(tmp_path / "t"), "--check", "no_equals_here"])
    assert rc == 2
    assert "NAME=EXPR" in capsys.readouterr().err


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


def test_in_write_enforcement_leaves_no_debris(spark, tmp_path):
    """r16: the violation scan rides the write job and refuses before
    the commit point — a violating delta leaves neither a delta dir
    nor a .stage-* staging dir; a violating rewrite on an existing
    table leaves the manifest on the old version and deletes the
    unpublished base."""
    path = _mk(spark, tmp_path)
    v0 = current_base_version(spark, path)
    with pytest.raises(ConstraintViolation, match="pos_val"):
        append_delta(spark,
                     spark.createDataFrame([Row(k=9, val=-5.0, tag="x")]),
                     path=path, key="k")
    children = hfs.listdir(spark, path)
    assert not any(c.startswith("delta_") for c in children)
    assert not any(c.startswith(".stage-") for c in children)
    with pytest.raises(ConstraintViolation, match="pos_val"):
        upsert_into_keyed_table(
            spark,
            spark.createDataFrame([Row(k=9, val=-5.0, tag="x")]),
            path=path, key="k", updated_at_col=None)
    assert current_base_version(spark, path) == v0
    children = hfs.listdir(spark, path)
    assert not any(c == f"base_v{v0 + 1:05d}" for c in children)
    assert not any(c.startswith(".stage-") for c in children)
    # the table still works after both refusals
    append_delta(spark,
                 spark.createDataFrame([Row(k=9, val=5.0, tag="x")]),
                 path=path, key="k")
    assert read_merged(spark, path, "k").count() == 6
