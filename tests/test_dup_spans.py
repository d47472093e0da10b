"""Substring-level dedup semantics on a tiny corpus with known span
structure (plans/dup_spans.py, k-gram re-expression of Lee et al.
2022 exact dedup)."""

from howto_mongo_bulk_update_from_parquet_spark.plans.dup_spans import (
    dup_spans_frame, trim_dup_spans)

# k=3 windows. Docs 1 and 2 share the 5-token run "a b c d e"
# (three duplicated 3-gram windows 0,1,2 in doc 1 / 2,3,4 in doc 2);
# doc 3 repeats its own 3-gram "x y z" at positions 0 and 4
# (within-doc duplication counts, per the paper); doc 4 is clean;
# doc 5 is shorter than k.
DOCS = [
    (1, "a b c d e p q r"),
    (2, "m n a b c d e"),
    (3, "x y z w x y z"),
    (4, "entirely fresh tokens only here"),
    (5, "too short"),
]


def _spans(spark, docs=DOCS, k=3):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans, _ = dup_spans_frame(df, k=k)
    return {(r.doc_id, r.span_start): r for r in spans.collect()}


def test_overlapping_windows_merge_to_maximal_span(spark):
    spans = _spans(spark)
    s1 = spans[(1, 0)]
    assert (s1.span_end, s1.span_tokens, s1.n_windows) == (4, 5, 3)
    s2 = spans[(2, 2)]
    assert (s2.span_end, s2.span_tokens, s2.n_windows) == (6, 5, 3)


def test_within_doc_repeat_is_duplicated_and_gap_splits_spans(spark):
    spans = _spans(spark)
    # "x y z" at 0 and 4: gap of 4 > k=3 → two separate spans
    assert (spans[(3, 0)].span_end, spans[(3, 0)].span_tokens) == (2, 3)
    assert (spans[(3, 4)].span_end, spans[(3, 4)].span_tokens) == (6, 3)


def test_clean_and_short_docs_emit_no_spans(spark):
    spans = _spans(spark)
    docs_with_spans = {d for d, _ in spans}
    assert 4 not in docs_with_spans
    assert 5 not in docs_with_spans


def test_touching_but_distinct_grams_stay_one_island(spark):
    # two duplicated runs adjacent within k: start gap == k is NOT a
    # break (spans touch end-to-end), so they merge into one island —
    # the maximal-span contract is "no two spans within k of each
    # other survive unmerged".
    docs = [(1, "a b c z z z d e f"),
            (2, "a b c q q q d e f"),
            (3, "a b c"), (4, "d e f")]
    spans = _spans(spark, docs=docs)
    # doc 1: "a b c" at 0 and "d e f" at 6 — gap 6 > k → two spans
    assert (1, 0) in spans and (1, 6) in spans
    assert spans[(1, 0)].span_tokens == 3 and spans[(1, 6)].span_tokens == 3


def test_trim_cuts_spans_and_preserves_order(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r.doc_id: (r.kept_tokens, r.trimmed_text)
           for r in trim_dup_spans(df, k=3).collect()}
    assert out[1] == (3, "p q r")
    assert out[2] == (2, "m n")
    assert out[3] == (1, "w")          # both x-y-z copies cut, gap kept
    assert out[4] == (5, "entirely fresh tokens only here")
    assert out[5] == (2, "too short")  # sub-k doc untouched


def test_fully_duplicated_doc_drops_out(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "z z q w")],
        "doc_id long, text string")
    out = {r.doc_id: r.trimmed_text
           for r in trim_dup_spans(df, k=4).collect()}
    assert 1 not in out and 2 not in out
    assert out[3] == "z z q w"


def test_ratio_fold_matches_span_sum(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    spans, toks = dup_spans_frame(df, k=3)
    from pyspark.sql import functions as F
    per_doc = {r.doc_id: r.dup for r in
               spans.groupBy("doc_id")
                    .agg(F.sum("span_tokens").alias("dup")).collect()}
    assert per_doc[1] == 5 and per_doc[2] == 5 and per_doc[3] == 6
