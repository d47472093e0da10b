"""Streaming incremental dedup: arriving document files drain through
the probe → verdict → fold-survivors cycle; the second sweep sees the
first as history; a drained stream re-run is a no-op; replays are
verdict-stable thanks to rep_id self-exclusion."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import read_keyed_table
from howto_mongo_bulk_update_from_parquet_spark.streaming.dedup_stream import (
    dedup_batch_verdicts, stream_dedup_parquet)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

TEXTS = {
    1: "the quick brown fox jumps over the lazy dog tonight",
    2: "pack my box with five dozen liquor jugs right now",
    3: "sphinx of black quartz judge my vow they said loudly",
}


def _write_batch(spark, landing, name, rows):
    (spark.createDataFrame(rows, SCHEMA).coalesce(1)
     .write.parquet(os.path.join(landing, name)))


def _run(spark, tmp, **kw):
    stream_dedup_parquet(
        spark, os.path.join(str(tmp), "landing", "*"),
        schema=SCHEMA,
        index_path=os.path.join(str(tmp), "index"),
        verdicts_dir=os.path.join(str(tmp), "verdicts"),
        checkpoint=os.path.join(str(tmp), "ckpt"), **kw)


def test_stream_near_two_sweeps(spark, tmp_path):
    landing = os.path.join(str(tmp_path), "landing")
    os.makedirs(landing)
    _write_batch(spark, landing, "b1",
                 [(1, TEXTS[1]), (2, TEXTS[2]), (3, TEXTS[1])])
    _run(spark, tmp_path, mode="near", buckets=4)
    verdicts = spark.read.parquet(os.path.join(str(tmp_path), "verdicts"))
    v1 = {r["doc_id"]: r["verdict"] for r in verdicts.collect()}
    # within the first sweep: 3 duplicates 1 (bucket-min keeps 1)
    assert v1 == {1: "unique", 2: "unique", 3: "dup_in_batch"}
    # survivors only in the index
    idx = read_keyed_table(spark, os.path.join(str(tmp_path), "index"))
    assert set(idx.columns) >= {"bucket_key", "band", "band_sig", "rep_id"}
    assert set(r["rep_id"] for r in idx.collect()) == {1, 2}

    # second arrival: doc 11 repeats doc 1's text (vs index), doc 12 new
    _write_batch(spark, landing, "b2",
                 [(11, TEXTS[1]), (12, TEXTS[3])])
    _run(spark, tmp_path, mode="near", buckets=4)
    verdicts = spark.read.parquet(os.path.join(str(tmp_path), "verdicts"))
    v2 = {r["doc_id"]: r["verdict"] for r in verdicts.collect()}
    assert v2[11] == "dup_vs_index" and v2[12] == "unique"
    # epoch partitioning: both sweeps readable as one table
    assert set(v2) == {1, 2, 3, 11, 12}
    idx2 = read_keyed_table(spark, os.path.join(str(tmp_path), "index"))
    assert set(r["rep_id"] for r in idx2.collect()) == {1, 2, 12}

    # drained re-run: checkpoint empty → nothing changes
    _run(spark, tmp_path, mode="near", buckets=4)
    v3 = {r["doc_id"]: r["verdict"] for r in spark.read.parquet(
        os.path.join(str(tmp_path), "verdicts")).collect()}
    assert v3 == v2


def test_stream_spans_mode(spark, tmp_path):
    landing = os.path.join(str(tmp_path), "landing")
    os.makedirs(landing)
    _write_batch(spark, landing, "b1", [(1, TEXTS[1])])
    _run(spark, tmp_path, mode="spans")
    # batch 2 embeds doc 1's text inside fresh prose → a history span
    _write_batch(spark, landing, "b2",
                 [(21, "totally original opening words then "
                       + TEXTS[1] + " and an original ending here")])
    _run(spark, tmp_path, mode="spans")
    spans = (spark.read.parquet(os.path.join(str(tmp_path), "verdicts"))
             .filter(F.col("doc_id") == 21).collect())
    assert len(spans) == 1
    assert spans[0]["idx_windows"] > 0            # history-attributed
    assert spans[0]["span_tokens"] >= 10          # the embedded sentence


def test_replay_verdicts_stable_after_fold(spark):
    """The foreachBatch retry case: the same batch probed AGAIN after
    its survivors were folded in keeps the unique/dup partition —
    rep_id self-exclusion stops survivors matching themselves. A
    dup's attribution may upgrade to dup_vs_index (its keeper is now
    genuinely history)."""
    docs = spark.createDataFrame(
        [(1, TEXTS[1]), (2, TEXTS[2]), (3, TEXTS[1])], SCHEMA)
    out1, rows1, key1 = dedup_batch_verdicts(docs, None, "near")
    v1 = {r["doc_id"]: r["verdict"] for r in out1.collect()}
    assert v1 == {1: "unique", 2: "unique", 3: "dup_in_batch"}
    # fold, then replay the same batch against the updated index
    out2, _, _ = dedup_batch_verdicts(docs, rows1, "near")
    v2 = {r["doc_id"]: r["verdict"] for r in out2.collect()}
    assert v2 == {1: "unique", 2: "unique", 3: "dup_vs_index"}
    assert ({k for k, v in v1.items() if v == "unique"}
            == {k for k, v in v2.items() if v == "unique"})

    sdocs = spark.createDataFrame([(1, TEXTS[1])], SCHEMA)
    sout1, srows1, _ = dedup_batch_verdicts(sdocs, None, "spans")
    sout2, _, _ = dedup_batch_verdicts(sdocs, srows1, "spans")
    assert sout1.count() == sout2.count() == 0    # no self-spans on replay


def test_cli_dedup_stream(spark, tmp_path):
    """The dedup-stream verb end to end: two invocations drain two
    arrival waves with the index carried between them."""
    import os

    from howto_mongo_bulk_update_from_parquet_spark import cli

    landing = os.path.join(str(tmp_path), "landing")
    os.makedirs(landing)
    _write_batch(spark, landing, "b1", [(1, TEXTS[1]), (2, TEXTS[2])])
    argv = ["dedup-stream", "--mode", "near",
            "--source", os.path.join(landing, "*"),
            "--index", os.path.join(str(tmp_path), "idx"),
            "--out", os.path.join(str(tmp_path), "out"),
            "--checkpoint", os.path.join(str(tmp_path), "ck"),
            "--buckets", "4"]
    assert cli.main(argv) == 0
    _write_batch(spark, landing, "b2", [(11, TEXTS[1])])
    assert cli.main(argv) == 0
    v = {r["doc_id"]: r["verdict"] for r in spark.read.parquet(
        os.path.join(str(tmp_path), "out")).collect()}
    assert v == {1: "unique", 2: "unique", 11: "dup_vs_index"}
