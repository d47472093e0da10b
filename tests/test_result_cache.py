"""Result cache: hit serves without recompute (proven by deleting the
source underneath), input mutation invalidates structurally, and
logically-identical phrasings share one entry."""

import os
import shutil
import time

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.operators.result_cache import (
    cached, plan_fingerprint)


def _write(spark, path, n=100, mult=2):
    spark.range(n).select(F.col("id"), (F.col("id") * mult).alias("v")) \
        .write.mode("overwrite").parquet(path)


def test_miss_then_hit_without_recompute(spark, tmp_path):
    src, cdir = f"{tmp_path}/src", f"{tmp_path}/cache"
    _write(spark, src)
    q = spark.read.parquet(src).groupBy((F.col("id") % 10).alias("b")) \
        .agg(F.sum("v").alias("s"))
    key = plan_fingerprint(q)
    r1, hit1 = cached(q, cdir)
    assert not hit1
    want = sorted((r.b, r.s) for r in r1.collect())
    # delete the source: serving from the cache slot must still answer
    # — proof the hit path never touches the inputs
    shutil.rmtree(src)
    r2 = spark.read.parquet(os.path.join(cdir, key))
    assert sorted((r.b, r.s) for r in r2.collect()) == want


def test_input_mutation_changes_key(spark, tmp_path):
    src, cdir = f"{tmp_path}/src", f"{tmp_path}/cache"
    _write(spark, src, mult=2)
    q = spark.read.parquet(src).agg(F.sum("v").alias("s"))
    k1 = plan_fingerprint(q)
    r1, hit1 = cached(q, cdir)
    assert not hit1 and r1.collect()[0].s == sum(2 * i for i in range(100))
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse clocks
    _write(spark, src, mult=3)
    q2 = spark.read.parquet(src).agg(F.sum("v").alias("s"))
    k2 = plan_fingerprint(q2)
    assert k1 != k2
    r2, hit2 = cached(q2, cdir)
    assert not hit2 and r2.collect()[0].s == sum(3 * i for i in range(100))
    # the stale entry still exists under its own key; the fresh one too
    assert len([d for d in os.listdir(cdir) if not d.endswith("_tmp")]) == 2


def test_equivalent_phrasings_share_one_entry(spark, tmp_path):
    src, cdir = f"{tmp_path}/src", f"{tmp_path}/cache"
    _write(spark, src)
    a = spark.read.parquet(src).filter(F.col("id") < 50).select("v")
    # different construction order, same optimized plan after pushdown
    b = spark.read.parquet(src).select("v", "id") \
        .filter(F.col("id") < 50).drop("id")
    _, hit_a = cached(a, cdir)
    _, hit_b = cached(b, cdir)
    assert not hit_a and hit_b, (plan_fingerprint(a), plan_fingerprint(b))


def test_second_identical_query_hits(spark, tmp_path):
    src, cdir = f"{tmp_path}/src", f"{tmp_path}/cache"
    _write(spark, src)
    mk = lambda: spark.read.parquet(src).groupBy((F.col("id") % 7).alias("b")) \
        .agg(F.count(F.lit(1)).alias("n"))  # noqa: E731
    _, h1 = cached(mk(), cdir)
    r, h2 = cached(mk(), cdir)
    assert (h1, h2) == (False, True)
    assert sum(x.n for x in r.collect()) == 100


def test_cli_query_cache_miss_then_hit(spark, tmp_path, capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    cdir = f"{tmp_path}/cache"
    argv = ["query", "--name", "q_filter_project",
            "--sf-dir", "/root/testdata/sf0.001",
            "--cache-dir", cdir, "--limit", "1"]
    assert main(argv) == 0
    assert "result cache: MISS" in capsys.readouterr().out
    assert main(argv) == 0
    assert "result cache: HIT" in capsys.readouterr().out


def test_distinct_literals_get_distinct_keys(spark, tmp_path):
    """Literals containing '#<digits>' must survive into the key: a
    regex that strips exprId-style tokens wholesale would fingerprint
    filters on 'tag#1' and 'tag#2' identically and serve the wrong
    cached result (the r6 advice finding)."""
    src = f"{tmp_path}/src"
    spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("tag#"), (F.col("id") % 3).cast("string"))
         .alias("tag")).write.mode("overwrite").parquet(src)
    q1 = spark.read.parquet(src).filter(F.col("tag") == "tag#1")
    q2 = spark.read.parquet(src).filter(F.col("tag") == "tag#2")
    assert plan_fingerprint(q1) != plan_fingerprint(q2)
    cdir = f"{tmp_path}/cache"
    r1, _ = cached(q1, cdir)
    r2, _ = cached(q2, cdir)
    assert {r.tag for r in r1.collect()} == {"tag#1"}
    assert {r.tag for r in r2.collect()} == {"tag#2"}


def test_remote_scheme_is_rejected(spark, tmp_path):
    """Non-local inputs can't be versioned via os.stat — the cache
    must refuse them loudly instead of keying on the bare path (which
    would never invalidate)."""
    import pytest
    src = f"{tmp_path}/src"
    _write(spark, src)
    q = spark.read.parquet(src).agg(F.sum("v").alias("s"))
    with pytest.raises(ValueError, match="local filesystems only"):
        cached(q, "s3a://bucket/cache")


def test_alias_only_difference_gets_distinct_keys(spark, tmp_path):
    """Canonicalization drops Alias names; the key must not (ADVICE
    r7): `select v AS a` and `select v AS b` differ only in output
    labels, and with swapped aliases a shared slot would serve
    wrongly-labeled data."""
    import pyspark.sql.functions as F
    src = str(tmp_path / "src")
    spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("v")) \
        .write.parquet(src)
    base = spark.read.parquet(src)
    a = base.select(F.col("v").alias("a"))
    b = base.select(F.col("v").alias("b"))
    assert plan_fingerprint(a) != plan_fingerprint(b)

    swapped1 = base.select(F.col("v").alias("b"), F.col("id").alias("a"))
    swapped2 = base.select(F.col("v").alias("a"), F.col("id").alias("b"))
    assert plan_fingerprint(swapped1) != plan_fingerprint(swapped2)

    cache = str(tmp_path / "cache")
    got_a, hit_a = cached(a, cache)
    got_b, hit_b = cached(b, cache)
    assert not hit_a and not hit_b
    assert got_a.columns == ["a"] and got_b.columns == ["b"]
