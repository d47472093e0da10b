"""Incremental cross-batch near-dup classification on a tiny corpus
with known duplicate structure (plans/incremental_dedup.py)."""

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.operators.dedup import (
    lsh_bands, minhash_signatures, shingles)
from howto_mongo_bulk_update_from_parquet_spark.plans.incremental_dedup import (
    incremental_near_dup_flags)

BASE = "the quick brown fox jumps over the lazy dog again and again"
DIFF = "completely unrelated words about spark shuffles and parquet files"
OTHER = "entirely different content concerning warehouse bucket layouts here"


def _index_bands(spark, rows):
    hist = spark.createDataFrame(rows, "doc_id long, text string")
    return (lsh_bands(minhash_signatures(
        shingles(hist, "doc_id", "text", 3), "doc_id", 16), "doc_id", 4)
        .select("band", "band_sig").distinct())


def _flags(spark, new_rows, hist_rows):
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    out = incremental_near_dup_flags(new, _index_bands(spark, hist_rows),
                                     "doc_id")
    return {r.doc_id: (r.hits_index, r.verdict) for r in out.collect()}

def test_verdicts_cover_all_three_classes(spark):
    flags = _flags(
        spark,
        new_rows=[(10, BASE),      # exact dup of an indexed doc
                  (20, DIFF),      # new content, duplicated in-batch
                  (30, DIFF),      # larger id: the in-batch dup
                  (40, OTHER)],    # genuinely new
        hist_rows=[(1, BASE)])
    assert flags[10] == (4, "dup_vs_index")   # all 4 bands collide
    assert flags[20] == (0, "unique")         # bucket-min survivor
    assert flags[30] == (0, "dup_in_batch")
    assert flags[40] == (0, "unique")


def test_index_hit_takes_precedence_over_batch_dup(spark):
    flags = _flags(spark,
                   new_rows=[(10, BASE), (20, BASE)],
                   hist_rows=[(1, BASE)])
    # both collide with history AND each other; index verdict wins
    assert flags[10] == (4, "dup_vs_index")
    assert flags[20] == (4, "dup_vs_index")


def test_short_doc_classified_unique(spark):
    # < 3 tokens → no shingles → no bands; still present in the output
    flags = _flags(spark, new_rows=[(10, "tiny doc")], hist_rows=[(1, BASE)])
    assert flags[10] == (0, "unique")


def test_arrival_loop_maintains_index_through_keyed_table(spark, tmp_path):
    """The production loop: batch 1 seeds the persisted index, each
    later batch is probed against it and only the SURVIVORS' signature
    rows are upserted back — history is never re-signed."""
    from howto_mongo_bulk_update_from_parquet_spark.plans.incremental_dedup import (
        signature_index_rows)
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        read_keyed_table, upsert_into_keyed_table)

    path = str(tmp_path / "sig_index")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def probe(new_rows):
        idx = read_keyed_table(spark, path).select("band", "band_sig")
        flags = incremental_near_dup_flags(docs(new_rows), idx, "doc_id")
        return {r.doc_id: r.verdict for r in flags.collect()}

    # batch 1 seeds the index
    upsert_into_keyed_table(
        spark, signature_index_rows(docs([(1, BASE), (2, OTHER)]), "doc_id"),
        path=path, key="bucket_key", updated_at_col=None)

    # batch 2: 11 duplicates indexed history, 10 is new
    verdicts2 = probe([(10, DIFF), (11, BASE)])
    assert verdicts2 == {10: "unique", 11: "dup_vs_index"}

    # append ONLY the survivor's signature rows
    upsert_into_keyed_table(
        spark, signature_index_rows(docs([(10, DIFF)]), "doc_id"),
        path=path, key="bucket_key", updated_at_col=None)

    # batch 3: 20 duplicates the batch-2 SURVIVOR (index caught up),
    # 21 is genuinely new
    verdicts3 = probe(
        [(20, DIFF),
         (21, "fresh sentences resembling nothing indexed before today")])
    assert verdicts3 == {20: "dup_vs_index", 21: "unique"}

    # the index holds distinct buckets keyed for upsert: 4 bands per
    # doc, three distinct docs, no bucket double-counted
    idx = read_keyed_table(spark, path)
    assert idx.select("bucket_key").distinct().count() == idx.count()
    assert idx.count() <= 12


def test_output_schema_and_batch_frame(spark):
    new = spark.createDataFrame([(10, BASE), (40, OTHER)],
                                "doc_id long, text string")
    out = incremental_near_dup_flags(new, _index_bands(spark, [(1, BASE)]),
                                     "doc_id")
    assert out.columns == ["doc_id", "hits_index", "verdict"]
    assert dict(out.dtypes)["hits_index"] == "bigint"
    # one row per new doc, never per bucket collision
    assert out.count() == 2


def test_bucket_key_index_probe_is_exchange_free(spark, tmp_path):
    """r11: when the index carries its store merge key (bucket_key),
    the probe joins on that single key — a bucket_key-bucketed index
    table feeds the join with NO Exchange on the index side (1 total,
    the batch side). Verdicts are identical to the (band, band_sig)
    join, bucket_key being a bijection of the pair."""
    from howto_mongo_bulk_update_from_parquet_spark.plans.incremental_dedup import (
        signature_index_rows)
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        read_keyed_table, upsert_into_keyed_table)
    path = str(tmp_path / "bkt_sig_index")
    pins = {"spark.sql.shuffle.partitions": "8",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}
    prev = {k: spark.conf.get(k, None) for k in pins}
    for k, v in pins.items():
        spark.conf.set(k, v)
    try:
        hist = spark.createDataFrame([(1, BASE), (2, OTHER)],
                                     "doc_id long, text string")
        upsert_into_keyed_table(spark, signature_index_rows(hist, "doc_id"),
                                path=path, key="bucket_key",
                                updated_at_col=None, buckets=8)
        new = spark.createDataFrame([(10, BASE), (20, DIFF), (30, DIFF)],
                                    "doc_id long, text string")
        idx = read_keyed_table(spark, path, honor_buckets=True)
        out = incremental_near_dup_flags(new, idx, "doc_id")
        got = {r.doc_id: (r.hits_index, r.verdict) for r in out.collect()}
        assert got == {10: (4, "dup_vs_index"), 20: (0, "unique"),
                       30: (0, "dup_in_batch")}
        # plan pin: the index-side probe join consumes the bucketed
        # scan's partitioning — the only Exchanges in the whole plan
        # belong to the batch-derived subtrees (shingle/minhash aggs),
        # none re-partitions the index scan. The bucketed scan itself
        # must appear and be actually bucketed.
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        lines = plan.splitlines()
        scan_i = next(i for i, ln in enumerate(lines)
                      if "Bucketed: true" in ln)
        # walk UP from the bucketed scan: the nearest enclosing join
        # must arrive with no Exchange between it and the scan
        depth = len(lines[scan_i]) - len(lines[scan_i].lstrip(" :+-"))
        for ln in reversed(lines[:scan_i]):
            d = len(ln) - len(ln.lstrip(" :+-"))
            if d < depth:
                if "Join" in ln:
                    break
                assert "Exchange" not in ln
                depth = d
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
