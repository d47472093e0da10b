"""Tests for the round-6 additions: blocked edit-distance near-dup,
Misra-Gries heavy hitters, reconciliation checksum, z-order layout."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.plans.blocking import (
    MG_CAPACITY, _misra_gries, q_edit_distance_pairs, q_heavy_hitters)
from howto_mongo_bulk_update_from_parquet_spark.plans.reconcile import (
    ZORDER_BUCKET_SHIFT, q_table_checksum, q_zorder_layout, zorder2)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# edit-distance blocking
# ---------------------------------------------------------------------------

def test_edit_distance_plan_is_equijoin_not_cartesian(spark):
    phys = (q_edit_distance_pairs(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_edit_distance_finds_mutated_copy(spark):
    """A doc and a near-copy (one substituted word, same first token,
    same length bucket) must surface as a candidate pair with the
    exact Levenshtein distance."""
    rows = [(1, "alpha beta gamma delta epsilon zeta", 35),
            (2, "alpha beta gamma delta epsilon zebu", 35),
            (3, "omega psi chi phi upsilon tau sigma", 35)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {(r.doc_a, r.doc_b): r.edit_dist
           for r in q_edit_distance_pairs(spark, d).collect()}
    # zeta -> zebu = 2 substitutions; doc 3 starts with a different
    # token so it never becomes a candidate
    assert out == {(1, 2): 2}


def test_edit_distance_exactness_vs_python(spark):
    """Spark's levenshtein on a sampled candidate pair agrees with a
    reference python DP implementation."""
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]
    rows = q_edit_distance_pairs(spark, SF).limit(5).collect()
    if not rows:
        pytest.skip("no candidate pairs at sf0.001")
    docs = {r.doc_id: r.text
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    for r in rows:
        assert r.edit_dist == lev(docs[r.doc_a], docs[r.doc_b])


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def test_misra_gries_superset_guarantee():
    """Any item with frequency > n/capacity must survive the sketch —
    exercised with a stream engineered to evict aggressively."""
    heavy = ["h1"] * 500 + ["h2"] * 300
    light = [f"t{i}" for i in range(2000)]  # 2000 singletons
    stream = []
    hv = iter(heavy)
    for i, t in enumerate(light):
        stream.append(t)
        if i % 3 == 0:
            stream.append(next(hv, "h1"))
    stream.extend(hv)
    n = len(stream)
    batches = [pd.DataFrame({"tok": stream[i:i + 700]})
               for i in range(0, n, 700)]
    out = next(_misra_gries(iter(batches), capacity=64))
    survivors = set(out["tok"])
    for item, freq in [("h1", 500), ("h2", 300)]:
        assert freq > n / 64
        assert item in survivors
    assert len(survivors) <= 64


def test_heavy_hitters_matches_exact_topk(spark):
    got = [(r.tok, r.n) for r in q_heavy_hitters(spark, SF).collect()]
    toks = (spark.read.parquet(f"{SF}/documents.parquet")
            .select(F.explode(F.split("text", " ")).alias("tok")))
    want = [(r.tok, r.n) for r in
            toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), "tok").limit(10).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# reconciliation checksum
# ---------------------------------------------------------------------------

def test_checksum_is_partition_and_order_invariant(spark):
    base = q_table_checksum(spark, SF)
    rows = {r.l_returnflag: (r.n_rows, r.checksum_sum, r.checksum_xor)
            for r in base.collect()}
    # same rows, shuffled into a different layout -> identical checksums
    import tempfile, os
    d = tempfile.mkdtemp()
    (spark.read.parquet(f"{SF}/lineitem.parquet")
     .repartition(7).sortWithinPartitions("l_partkey")
     .write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet")))
    rows2 = {r.l_returnflag: (r.n_rows, r.checksum_sum, r.checksum_xor)
             for r in q_table_checksum(spark, d).collect()}
    assert rows == rows2


def test_checksum_detects_single_changed_row(spark):
    import tempfile, os
    d = tempfile.mkdtemp()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    first = li.first()
    # (orderkey, linenumber) is NOT unique in the synthetic fixture, so
    # the tamper may touch several rows; track which groups it touched
    hit = (F.col("l_orderkey") == first.l_orderkey) \
        & (F.col("l_linenumber") == first.l_linenumber)
    touched = {r.l_returnflag for r in li.filter(hit).collect()}
    tampered = li.withColumn(
        "l_quantity",
        F.when(hit, F.col("l_quantity") + 1).otherwise(F.col("l_quantity")))
    tampered.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    base = {r.l_returnflag: (r.checksum_sum, r.checksum_xor)
            for r in q_table_checksum(spark, SF).collect()}
    tamp = {r.l_returnflag: (r.checksum_sum, r.checksum_xor)
            for r in q_table_checksum(spark, d).collect()}
    for flag in base:
        if flag in touched:
            assert base[flag] != tamp[flag]
        else:
            assert base[flag] == tamp[flag]


# ---------------------------------------------------------------------------
# z-order layout
# ---------------------------------------------------------------------------

def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder2_matches_bitwise_reference(spark):
    samples = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
               (255, 256), (32768, 1)]
    df = spark.createDataFrame(samples, "x long, y long")
    got = [r.z for r in
           df.select(zorder2(F.col("x"), F.col("y")).alias("z"))
             .collect()]
    assert got == [_morton_ref(x, y) for x, y in samples]


def test_zorder_buckets_cover_bounded_rectangles(spark):
    """Keeping the top 8 Morton bits (4 per dimension) means every
    bucket's extent spans < 2^12 in each scaled dimension — the
    property that makes min/max file stats prune both columns."""
    span = 1 << (16 - (32 - ZORDER_BUCKET_SHIFT) // 2)  # 4096
    rows = q_zorder_layout(spark, SF).collect()
    assert len(rows) > 1
    for r in rows:
        assert r.x_max - r.x_min < span
        assert r.y_max - r.y_min < span


# ---------------------------------------------------------------------------
# reconcile operators: checksum diff against the keyed-table sink
# ---------------------------------------------------------------------------

def test_checksum_diff_clean_after_keyed_table_roundtrip(spark, tmp_path):
    """The verification step the reference pipeline lacks: after a bulk
    upsert into the keyed table, a checksum diff of source vs sink
    (ignoring the sink's audit column) is empty; a tampered sink shows
    exactly the tampered group."""
    import os
    from howto_mongo_bulk_update_from_parquet_spark.operators.reconcile import checksum_diff
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        read_keyed_table, upsert_into_keyed_table)
    path = os.path.join(str(tmp_path), "keyed")
    src = spark.createDataFrame(
        [(f"k{i}", f"g{i % 3}", float(i)) for i in range(60)],
        "_id string, grp string, v double")
    upsert_into_keyed_table(spark, src, path=path, key="_id")
    sink = read_keyed_table(spark, path)  # has extra updatedAt column
    assert checksum_diff(src, sink, ["grp"], cols=["_id", "v"]).count() == 0
    tampered = sink.withColumn(
        "v", F.when(F.col("_id") == "k3", F.col("v") + 0.5)
              .otherwise(F.col("v")))
    bad = checksum_diff(src, tampered, ["grp"], cols=["_id", "v"]).collect()
    assert [r.grp for r in bad] == ["g0"]  # k3 -> grp g0; others clean
    assert bad[0].left_n_rows == bad[0].right_n_rows == 20


def test_checksum_diff_reports_one_sided_groups(spark):
    from howto_mongo_bulk_update_from_parquet_spark.operators.reconcile import checksum_diff
    a = spark.createDataFrame([("g1", 1), ("g2", 2)], "grp string, v int")
    b = spark.createDataFrame([("g1", 1), ("g3", 3)], "grp string, v int")
    rows = {r.grp: r for r in checksum_diff(a, b, ["grp"]).collect()}
    assert set(rows) == {"g2", "g3"}
    assert rows["g2"].right_n_rows is None
    assert rows["g3"].left_n_rows is None


def test_canonical_row_null_vs_empty_distinct(spark):
    """(NULL,'x') must not collide with ('x',NULL) or ('',  'x')."""
    from howto_mongo_bulk_update_from_parquet_spark.operators.reconcile import canonical_row
    df = spark.createDataFrame(
        [(None, "x"), ("x", None), ("", "x"), ("x", "")],
        "a string, b string")
    vals = [r.c for r in df.select(canonical_row(df).alias("c")).collect()]
    assert len(set(vals)) == 4


def test_heavy_hitters_plan_aggregates_candidates_only(spark):
    """The full-vocabulary groupBy must not exist: the only count
    aggregation sits above a LeftSemi broadcast of the Misra-Gries
    candidates, and the sketch pass itself is shuffle-free (no
    Exchange between scan and MapInPandas)."""
    phys = (q_heavy_hitters(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in phys and "LeftSemi" in phys
    scan_to_mg = phys.split("MapInPandas")[-1]
    assert "Exchange" not in scan_to_mg  # sketch reads the scan directly


def test_table_checksum_single_exchange(spark):
    phys = (q_table_checksum(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert phys.count("Exchange") == 1  # partial agg -> one shuffle
