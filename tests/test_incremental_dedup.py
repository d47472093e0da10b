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


def test_output_schema_and_batch_frame(spark):
    new = spark.createDataFrame([(10, BASE), (40, OTHER)],
                                "doc_id long, text string")
    out = incremental_near_dup_flags(new, _index_bands(spark, [(1, BASE)]),
                                     "doc_id")
    assert out.columns == ["doc_id", "hits_index", "verdict"]
    assert dict(out.dtypes)["hits_index"] == "bigint"
    # one row per new doc, never per bucket collision
    assert out.count() == 2
