"""Constraint-audit operator: violation semantics on crafted rows
(nulls count against accepted/range, duplicates counted as extras,
FK null-tolerant) and the one-scan plan contract for row-local checks."""

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.operators import constraints as C


def _report(spark, rows):
    df = spark.createDataFrame(rows, "k long, status string, price double")
    dim = spark.createDataFrame([(1,), (2,)], "d long")
    rep = C.audit(df, [
        C.not_null("status"),
        C.accepted_values("status", ["A", "B"]),
        C.in_range("price", 0.0, 10.0),
        C.unique("k"),
        C.foreign_key("k", dim, "d"),
    ])
    return {r["constraint"]: (r.n_violations, r.passed) for r in rep.collect()}


def test_violation_semantics(spark):
    rows = [
        (1, "A", 5.0),      # clean
        (1, "B", 11.0),     # dup k, price high
        (2, None, -1.0),    # null status (not_null AND accepted), price low
        (3, "C", None),     # bad status, null price, orphan k=3
    ]
    got = _report(spark, rows)
    assert got["not_null(status)"] == (1, False)
    assert got["accepted(status)"] == (2, False)   # None and 'C'
    assert got["range(price)"] == (3, False)       # 11.0, -1.0, None
    assert got["unique(k)"] == (1, False)          # one extra copy of k=1
    assert got["fk(k)"] == (1, False)              # k=3 orphaned


def test_all_pass_and_fk_ignores_null_keys(spark):
    df = spark.createDataFrame([(1, "A", 1.0), (2, "B", 2.0),
                                (None, "A", 3.0)],
                               "k long, status string, price double")
    dim = spark.createDataFrame([(1,), (2,)], "d long")
    rep = C.audit(df, [C.accepted_values("status", ["A", "B"]),
                       C.foreign_key("k", dim, "d")])
    got = {r["constraint"]: r.passed for r in rep.collect()}
    assert got == {"accepted(status)": True, "fk(k)": True}


def test_row_local_checks_share_one_scan(spark, tmp_path):
    spark.range(100).select(F.col("id").alias("k"),
                            F.lit("A").alias("status"),
                            F.rand(7).alias("price")) \
        .write.mode("overwrite").parquet(f"{tmp_path}/t")
    df = spark.read.parquet(f"{tmp_path}/t")
    rep = C.audit(df, [C.not_null("status"),
                       C.accepted_values("status", ["A"]),
                       C.in_range("price", 0.0, 1.0),
                       C.unique("k")])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # 4 row-local constraints → ONE FileScan, one aggregation pass
    assert plan.count("FileScan") == 1, plan


def test_unique_ignores_null_keys(spark):
    """A null key is not_null's violation, never unique's: one null
    row among distinct keys must NOT read as a duplicate."""
    df = spark.createDataFrame([(1, "A", 1.0), (2, "A", 1.0),
                                (None, "A", 1.0)],
                               "k long, status string, price double")
    rep = {r["constraint"]: r.n_violations
           for r in C.audit(df, [C.unique("k")]).collect()}
    assert rep["unique(k)"] == 0
    # but a genuine duplicate still counts
    df2 = spark.createDataFrame([(1, "A", 1.0), (1, "A", 1.0),
                                 (None, "A", 1.0)],
                                "k long, status string, price double")
    rep2 = {r["constraint"]: r.n_violations
            for r in C.audit(df2, [C.unique("k")]).collect()}
    assert rep2["unique(k)"] == 1


def test_fk_only_audit_produces_report(spark):
    """audit() with ONLY fk constraints used to die star-expanding an
    empty struct array (reachable from `cli audit --fk ...` alone) —
    it must produce the fk rows on an empty seed report instead."""
    from howto_mongo_bulk_update_from_parquet_spark.operators import constraints as C
    fact = spark.createDataFrame([(1,), (2,), (9,)], "k int")
    dim = spark.createDataFrame([(1,), (2,)], "d int")
    rep = C.audit(fact, [C.foreign_key("k", dim, "d")]).collect()
    assert len(rep) == 1
    assert rep[0].constraint == "fk(k)"
    assert rep[0].n_violations == 1 and not rep[0].passed
