"""`cli.py curate` — the end-to-end corpus-curation pipeline (r10
verdict #3): exact dedup → substring trim → quality gate → split →
pack, with per-stage accounting in manifest.json."""

import json
import os

from howto_mongo_bulk_update_from_parquet_spark.cli import main

DOCS = [
    (1, "z1 z2 z3 z4 z5 z6"),            # survives whole
    (2, "z1 z2 z3 z4 z5 z6"),            # exact dup of 1 → dropped
    (10, "a b c d e p1 p2 p3 p4 p5"),    # "a b c d e" duplicated vs 11
    (11, "q1 q2 q3 q4 a b c d e"),       # → trimmed from BOTH copies
    (20, "s1 s2 s3"),                    # short → quality-dropped
    (30, "c1 c2 c3 c4 c5 c6"),           # clean survivor
]


def test_curate_end_to_end_counts_and_manifest(spark, tmp_path, capsys):
    src = str(tmp_path / "raw")
    out = str(tmp_path / "curated")
    spark.createDataFrame(DOCS, "doc_id long, text string") \
        .coalesce(1).write.parquet(src)

    assert main(["curate", "--source", src, "--out", out,
                 "--k", "3", "--min-tokens", "4", "--pack-budget", "5",
                 "--splits", "100,0,0"]) == 0
    msg = capsys.readouterr().out
    assert "curated 4/6 docs" in msg

    with open(os.path.join(out, "manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest["stages"] == {
        "input_docs": 6,
        "after_exact_dedup": 5,          # doc 2 collapsed into 1
        "after_substring_trim": 5,       # nobody trimmed to zero
        "after_quality_gate": 4,         # doc 20 too short
    }
    # --splits 100,0,0 routes everything to train
    assert list(manifest["splits"]) == ["train"]
    tr = manifest["splits"]["train"]
    # kept tokens: doc1=6, doc10=5 (span cut), doc11=4 (span cut), doc30=6
    assert (tr["n_docs"], tr["total_tokens"]) == (4, 21)
    # greedy packing at budget 5, doc_id order: offsets 0,6,11,15 →
    # four distinct sequences
    assert tr["n_sequences"] == 4
    card = manifest["corpus_card"]
    assert card["n_docs"] == 4 and card["n_exact_dups"] == 0
    assert card["top_lang"] == "unknown" and card["n_langs"] == 1

    rows = {r.doc_id: r for r in
            spark.read.parquet(os.path.join(out, "corpus")).collect()}
    assert set(rows) == {1, 10, 11, 30}
    # the corpus-duplicated run was cut from BOTH holders
    assert rows[10].text == "p1 p2 p3 p4 p5"
    assert rows[11].text == "q1 q2 q3 q4"
    assert rows[1].text == "z1 z2 z3 z4 z5 z6"
    assert all(r.split == "train" for r in rows.values())
    assert sorted(r.seq_id for r in rows.values()) == [0, 1, 2, 3]


def test_curate_counts_match_composed_catalog_queries(spark, tmp_path):
    """Reconciliation against the attested catalog stages: the CLI's
    quality-gate survivor count over the fixture documents table must
    equal q_training_pipeline's n_docs total for the same gate, with
    the trim stage disabled by a window longer than any document."""
    import glob

    from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "cur_sf")
    # k=1000 > every doc: the trim stage passes texts through
    # untouched, so the pipeline reduces to q_training_pipeline's
    # dedup → quality(>=20) → split stages
    assert main(["curate", "--source", os.path.join(sf, "documents.parquet"),
                 "--out", out, "--k", "1000", "--min-tokens", "20"]) == 0
    with open(os.path.join(out, "manifest.json")) as fh:
        manifest = json.load(fh)
    qtp = all_queries()["q_training_pipeline"](spark, sf).collect()
    assert manifest["stages"]["after_quality_gate"] == \
        sum(r.n_docs for r in qtp)
    per_split = {r.split: (r.n_docs, r.total_tokens) for r in qtp}
    got = {s: (v["n_docs"], v["total_tokens"])
           for s, v in manifest["splits"].items()}
    assert got == per_split
    # corpus card n_docs agrees with the written corpus
    n_files = spark.read.parquet(os.path.join(out, "corpus")).count()
    assert manifest["corpus_card"]["n_docs"] == n_files


def test_curate_rejects_bad_splits_and_columns(spark, tmp_path, capsys):
    src = str(tmp_path / "raw2")
    spark.createDataFrame([(1, "x y z")], "doc_id long, text string") \
        .write.parquet(src)
    assert main(["curate", "--source", src, "--out", str(tmp_path / "o"),
                 "--splits", "50,50,50"]) == 2
    assert "summing to 100" in capsys.readouterr().err
    assert main(["curate", "--source", src, "--out", str(tmp_path / "o"),
                 "--text-col", "body"]) == 2
    assert "no text column 'body'" in capsys.readouterr().err


def test_curate_near_dup_stage_drops_bucket_losers(spark, tmp_path):
    """--near-dup adds the MinHash-LSH keep-one pass after exact
    dedup: a lightly-reworded copy (same shingle buckets, different
    md5) is dropped; the smaller-id original survives."""
    src = str(tmp_path / "raw_nd")
    out = str(tmp_path / "cur_nd")
    base = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 "
            "w17 w18 w19 w20")
    near = base + " tail"                       # shares every base shingle
    other = ("x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16 "
             "x17 x18 x19 x20")
    spark.createDataFrame([(1, base), (2, near), (3, other)],
                          "doc_id long, text string") \
        .coalesce(1).write.parquet(src)
    assert main(["curate", "--source", src, "--out", out, "--near-dup",
                 "--k", "1000", "--min-tokens", "5",
                 "--splits", "100,0,0"]) == 0
    with open(os.path.join(out, "manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest["stages"]["after_dedup"] == 2        # doc 2 dropped
    assert manifest["stages"]["after_quality_gate"] == 2
    kept = {r.doc_id for r in
            spark.read.parquet(os.path.join(out, "corpus")).collect()}
    assert kept == {1, 3}


def test_curate_rejects_out_of_range_split_components(spark, tmp_path,
                                                      capsys):
    """code-review r11: components summing to 100 can still be
    degenerate (120,-10,-10 routes everything to train) — each must be
    in 0..100."""
    src = str(tmp_path / "raw3")
    spark.createDataFrame([(1, "x y z")], "doc_id long, text string") \
        .write.parquet(src)
    assert main(["curate", "--source", src, "--out", str(tmp_path / "o3"),
                 "--splits", "120,-10,-10"]) == 2
    assert "0..100" in capsys.readouterr().err
