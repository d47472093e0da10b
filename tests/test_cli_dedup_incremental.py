"""CLI surface for the cross-batch dedup arrival loop (r10 verdict #2):
`dedup-incremental` drives plans/incremental_dedup.py /
plans/incremental_spans.py against an on-disk keyed index table."""

import os

from howto_mongo_bulk_update_from_parquet_spark.cli import main

BASE = "the quick brown fox jumps over the lazy dog again and again"
DIFF = "completely unrelated words about spark shuffles and parquet files"
OTHER = "entirely different content concerning warehouse bucket layouts here"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(path)


def test_near_mode_two_arrivals_maintain_index(spark, tmp_path, capsys):
    idx = str(tmp_path / "sig_index")
    b1 = str(tmp_path / "batch1")
    b2 = str(tmp_path / "batch2")
    out1 = str(tmp_path / "verdicts1")
    out2 = str(tmp_path / "verdicts2")
    _write_batch(spark, b1, [(1, BASE), (2, OTHER)])
    # batch 2: 11 duplicates batch-1 history; 10 is new; 12 duplicates
    # 10 within the batch (bucket-min loser)
    _write_batch(spark, b2, [(10, DIFF), (11, BASE), (12, DIFF)])

    # first arrival seeds the index (it does not exist yet)
    assert main(["dedup-incremental", "--mode", "near", "--index", idx,
                 "--source", b1, "--out", out1, "--update-index"]) == 0
    assert "index " + idx + " seeded" in capsys.readouterr().out
    v1 = {r.doc_id: r.verdict
          for r in spark.read.parquet(out1).collect()}
    assert v1 == {1: "unique", 2: "unique"}

    # second arrival probes the persisted index and folds survivors in
    assert main(["dedup-incremental", "--mode", "near", "--index", idx,
                 "--source", b2, "--out", out2, "--update-index"]) == 0
    msg = capsys.readouterr().out
    assert "unique=1" in msg and "dup_vs_index=1" in msg \
        and "dup_in_batch=1" in msg and "updated" in msg
    v2 = {r.doc_id: r.verdict
          for r in spark.read.parquet(out2).collect()}
    assert v2 == {10: "unique", 11: "dup_vs_index", 12: "dup_in_batch"}

    # the index grew by the SURVIVOR only: a third batch repeating
    # batch-2's unique doc now hits the index
    b3 = str(tmp_path / "batch3")
    out3 = str(tmp_path / "verdicts3")
    _write_batch(spark, b3, [(20, DIFF)])
    assert main(["dedup-incremental", "--mode", "near", "--index", idx,
                 "--source", b3, "--out", out3]) == 0        # probe only
    v3 = {r.doc_id: r.verdict
          for r in spark.read.parquet(out3).collect()}
    assert v3 == {20: "dup_vs_index"}
    # probe-only run left the index untouched
    assert "unchanged" in capsys.readouterr().out


def test_spans_mode_emits_spans_and_indexes_whole_batch(spark, tmp_path,
                                                        capsys):
    idx = str(tmp_path / "gram_index")
    b1 = str(tmp_path / "s_batch1")
    b2 = str(tmp_path / "s_batch2")
    out2 = str(tmp_path / "spans2")
    _write_batch(spark, b1, [(1, "a b c d e f g h i j k l m n o p q r s "
                                 "t u v w x y z a1 b1 c1 d1")])
    assert main(["dedup-incremental", "--mode", "spans", "--index", idx,
                 "--source", b1, "--update-index"]) == 0
    capsys.readouterr()
    # batch 2 embeds a long run from batch 1 plus fresh tail tokens
    _write_batch(spark, b2, [(10, "a b c d e f g h i j k l m n o p q r s "
                                  "t u v w x FRESH1 FRESH2 FRESH3 FRESH4 "
                                  "FRESH5 FRESH6 FRESH7 FRESH8")])
    assert main(["dedup-incremental", "--mode", "spans", "--index", idx,
                 "--source", b2, "--out", out2, "--update-index"]) == 0
    msg = capsys.readouterr().out
    rows = spark.read.parquet(out2).collect()
    assert len(rows) == 1
    span = rows[0]
    assert span.doc_id == 10 and span.span_start == 0
    assert span.idx_windows == span.n_windows      # purely history-caused
    assert "docs_affected=1" in msg

    # spans mode indexes the WHOLE batch: a third batch repeating
    # batch-2's FRESH run is now an index hit
    b3 = str(tmp_path / "s_batch3")
    out3 = str(tmp_path / "spans3")
    _write_batch(spark, b3, [(30, "FRESH1 FRESH2 FRESH3 FRESH4 FRESH5 "
                                  "FRESH6 FRESH7 FRESH8 zz1 zz2 zz3 zz4 "
                                  "zz5 zz6 zz7 zz8 zz9 zz10 zz11 zz12")])
    assert main(["dedup-incremental", "--mode", "spans", "--index", idx,
                 "--source", b3, "--out", out3]) == 0
    rows3 = spark.read.parquet(out3).collect()
    assert [r.doc_id for r in rows3] == [30]
    assert rows3[0].idx_windows == rows3[0].n_windows


def test_near_mode_lsm_index_appends_and_probes_tail(spark, tmp_path,
                                                     capsys):
    """--index-lsm: arrivals append O(batch) deltas instead of
    rewriting the index base; the probe reads base + pending tail, so
    a doc duplicating a TAIL-only survivor is still caught; the
    threshold fold restores the clean bucketed base."""
    import os

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        folded_through, read_merged)

    idx = str(tmp_path / "lsm_index")
    b1, b2, b3, b4 = (str(tmp_path / f"l_batch{i}") for i in (1, 2, 3, 4))
    _write_batch(spark, b1, [(1, BASE)])
    _write_batch(spark, b2, [(10, DIFF)])
    _write_batch(spark, b3, [(20, DIFF), (21, OTHER)])  # 20 dups the TAIL
    _write_batch(spark, b4, [(30, OTHER)])

    # arrival 1 seeds the base (LSM needs a base to append against)
    assert main(["dedup-incremental", "--mode", "near", "--index", idx,
                 "--source", b1, "--update-index", "--buckets", "4",
                 "--index-lsm"]) == 0
    assert "seeded" in capsys.readouterr().out
    # arrival 2 appends a delta — the base is untouched
    assert main(["dedup-incremental", "--mode", "near", "--index", idx,
                 "--source", b2, "--update-index", "--index-lsm"]) == 0
    assert "appended (LSM)" in capsys.readouterr().out
    assert [d for d in os.listdir(idx) if d.startswith("delta_")] \
        == ["delta_00001"]
    # arrival 3: doc 20 duplicates doc 10, whose signatures live ONLY
    # in the pending tail — the tail probe must catch it
    out3 = str(tmp_path / "l_out3")
    assert main(["dedup-incremental", "--mode", "near", "--index", idx,
                 "--source", b3, "--out", out3, "--update-index",
                 "--index-lsm", "--compact-pending", "2"]) == 0
    msg = capsys.readouterr().out
    v3 = {r.doc_id: r.verdict for r in spark.read.parquet(out3).collect()}
    assert v3 == {20: "dup_vs_index", 21: "unique"}
    assert "folded (2 pending)" in msg
    assert folded_through(spark, idx) == 2
    # post-fold: the merged index carries every survivor exactly once
    reps = {r.rep_id for r in read_merged(spark, idx, "bucket_key")
            .select("rep_id").distinct().collect()}
    assert reps == {1, 10, 21}
    # arrival 4 probes the folded base (no tail) and still sees all
    out4 = str(tmp_path / "l_out4")
    assert main(["dedup-incremental", "--mode", "near", "--index", idx,
                 "--source", b4, "--out", out4]) == 0
    v4 = {r.doc_id: r.verdict for r in spark.read.parquet(out4).collect()}
    assert v4 == {30: "dup_vs_index"}


def test_spans_mode_lsm_tail_probe(spark, tmp_path, capsys):
    idx = str(tmp_path / "lsm_gram")
    b1 = str(tmp_path / "g_batch1")
    b2 = str(tmp_path / "g_batch2")
    b3 = str(tmp_path / "g_batch3")
    _write_batch(spark, b1, [(1, "a b c d e f g h i j k l m n o p q r s "
                                 "t u v w x y z a1 b1 c1 d1")])
    assert main(["dedup-incremental", "--mode", "spans", "--index", idx,
                 "--source", b1, "--update-index", "--index-lsm"]) == 0
    capsys.readouterr()
    _write_batch(spark, b2, [(10, "FRESH1 FRESH2 FRESH3 FRESH4 FRESH5 "
                                  "FRESH6 FRESH7 FRESH8 FRESH9 FRESH10 "
                                  "FRESH11 FRESH12 FRESH13 FRESH14")])
    # arrival 2 appends its grams as a delta (spans mode indexes the
    # whole batch)
    assert main(["dedup-incremental", "--mode", "spans", "--index", idx,
                 "--source", b2, "--update-index", "--index-lsm"]) == 0
    assert "appended (LSM)" in capsys.readouterr().out
    # arrival 3 repeats batch-2's run, which lives only in the tail
    out3 = str(tmp_path / "g_out3")
    _write_batch(spark, b3, [(30, "FRESH1 FRESH2 FRESH3 FRESH4 FRESH5 "
                                  "FRESH6 FRESH7 FRESH8 FRESH9 FRESH10 "
                                  "FRESH11 FRESH12 zz1 zz2 zz3 zz4 zz5 "
                                  "zz6 zz7 zz8")])
    assert main(["dedup-incremental", "--mode", "spans", "--index", idx,
                 "--source", b3, "--out", out3]) == 0
    rows = spark.read.parquet(out3).collect()
    assert len(rows) == 1 and rows[0].doc_id == 30
    assert rows[0].span_start == 0 and rows[0].idx_windows > 0


def test_cli_rejects_missing_columns_and_bad_source(tmp_path, spark, capsys):
    b = str(tmp_path / "badcols")
    spark.createDataFrame([(1, "x")], "id long, body string") \
        .write.parquet(b)
    assert main(["dedup-incremental", "--index", str(tmp_path / "i"),
                 "--source", b]) == 2
    assert "no id column 'doc_id'" in capsys.readouterr().err
    assert main(["dedup-incremental", "--index", str(tmp_path / "i"),
                 "--source", str(tmp_path / "nope")]) == 2
    assert "cannot read batch source" in capsys.readouterr().err


def test_vec_mode_two_arrivals_maintain_both_stores(spark, tmp_path, capsys):
    """--mode vec: arrivals probed against the RHP bucket index and
    exact-cosine verified against the keyed vector store; survivors
    fold into BOTH stores."""
    import math
    import random

    def vec(seed):
        rng = random.Random(seed)
        v = [rng.gauss(0.0, 1.0) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in v))
        return [round(x / n, 6) for x in v]

    def write(path, rows):
        spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>") \
            .coalesce(1).write.parquet(path)

    idx = str(tmp_path / "v_idx")
    store = str(tmp_path / "v_store")
    b1, b2, b3 = (str(tmp_path / f"v_batch{i}") for i in (1, 2, 3))
    write(b1, [(1, vec(5)), (2, vec(60))])
    write(b2, [(10, vec(200)), (11, vec(5))])   # 11 duplicates history 1
    write(b3, [(20, vec(200))])                 # duplicates b2's survivor

    # missing --vectors is a usage error
    assert main(["dedup-incremental", "--mode", "vec", "--id-col", "vec_id", "--index", idx,
                 "--source", b1]) == 2
    assert "--vectors" in capsys.readouterr().err

    assert main(["dedup-incremental", "--mode", "vec", "--id-col", "vec_id", "--index", idx,
                 "--vectors", store, "--source", b1,
                 "--update-index"]) == 0
    assert "dup_vs_index=0" in capsys.readouterr().out

    out2 = str(tmp_path / "v_out2")
    assert main(["dedup-incremental", "--mode", "vec", "--id-col", "vec_id", "--index", idx,
                 "--vectors", store, "--source", b2, "--out", out2,
                 "--update-index"]) == 0
    assert "dup_vs_index=1" in capsys.readouterr().out
    rows = {r.vec_id: (r.n_dups, r.match_id, r.cos_sim)
            for r in spark.read.parquet(out2).collect()}
    assert rows == {11: (1, 1, 1.0)}

    out3 = str(tmp_path / "v_out3")
    assert main(["dedup-incremental", "--mode", "vec", "--id-col", "vec_id", "--index", idx,
                 "--vectors", store, "--source", b3, "--out", out3]) == 0
    rows3 = {r.vec_id: r.match_id
             for r in spark.read.parquet(out3).collect()}
    assert rows3 == {20: 10}          # the batch-2 survivor is history now
    # probe-only run left the stores unchanged
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import read_keyed_table
    assert read_keyed_table(spark, store).count() == 3


def test_vec_mode_rejects_inconsistent_store_pair(spark, tmp_path, capsys):
    """code-review r11: a mistyped --vectors path must be a hard error
    when the index exists — one shared except would silently replace
    the REAL index with an empty one (every dup reported unique)."""
    import math
    import random

    def vec(seed):
        rng = random.Random(seed)
        v = [rng.gauss(0.0, 1.0) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in v))
        return [round(x / n, 6) for x in v]

    idx = str(tmp_path / "i_idx")
    store = str(tmp_path / "i_store")
    b1 = str(tmp_path / "i_batch1")
    spark.createDataFrame([(1, vec(5))],
                          "vec_id long, embedding array<float>") \
        .write.parquet(b1)
    assert main(["dedup-incremental", "--mode", "vec", "--id-col", "vec_id",
                 "--index", idx, "--vectors", store, "--source", b1,
                 "--update-index"]) == 0
    capsys.readouterr()
    # index exists, --vectors mistyped → usage error, nothing probed
    assert main(["dedup-incremental", "--mode", "vec", "--id-col", "vec_id",
                 "--index", idx, "--vectors", str(tmp_path / "typo"),
                 "--source", b1]) == 2
    assert "inconsistent vec stores" in capsys.readouterr().err
    # and the mirror case: --index mistyped while the store exists
    assert main(["dedup-incremental", "--mode", "vec", "--id-col", "vec_id",
                 "--index", str(tmp_path / "typo2"), "--vectors", store,
                 "--source", b1]) == 2
    assert "inconsistent vec stores" in capsys.readouterr().err


def test_vec_mode_batch_dups_index_one_copy(spark, tmp_path, capsys):
    """k identical vectors arriving in ONE batch must index exactly
    one copy (code-review follow-up: vec mode previously folded every
    batch-internal duplicate into the stores)."""
    import math
    import random

    def vec(seed):
        rng = random.Random(seed)
        v = [rng.gauss(0.0, 1.0) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in v))
        return [round(x / n, 6) for x in v]

    idx = str(tmp_path / "bd_idx")
    store = str(tmp_path / "bd_store")
    b1 = str(tmp_path / "bd_batch1")
    spark.createDataFrame(
        [(10, [float(x) for x in vec(3)]),
         (11, [float(x) for x in vec(3)]),     # identical sibling
         (12, [float(x) for x in vec(88)])],
        "vec_id long, embedding array<float>") \
        .coalesce(1).write.parquet(b1)
    assert main(["dedup-incremental", "--mode", "vec", "--id-col", "vec_id",
                 "--index", idx, "--vectors", store, "--source", b1,
                 "--update-index"]) == 0
    assert "dup_in_batch=1" in capsys.readouterr().out
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import read_keyed_table
    stored = {r.member_id for r in read_keyed_table(spark, store).collect()}
    assert stored == {10, 12}                 # 11 never reached the stores
    # a later arrival matching the duplicate still hits history via 10
    b2 = str(tmp_path / "bd_batch2")
    out2 = str(tmp_path / "bd_out2")
    spark.createDataFrame([(20, [float(x) for x in vec(3)])],
                          "vec_id long, embedding array<float>") \
        .write.parquet(b2)
    assert main(["dedup-incremental", "--mode", "vec", "--id-col", "vec_id",
                 "--index", idx, "--vectors", store, "--source", b2,
                 "--out", out2]) == 0
    rows = {r.vec_id: r.match_id for r in spark.read.parquet(out2).collect()}
    assert rows == {20: 10}
