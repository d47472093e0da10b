"""Cross-batch substring-dedup semantics on a tiny corpus
(plans/incremental_spans.py) plus the arrival loop that maintains the
k-gram index through the keyed-table sink."""

from howto_mongo_bulk_update_from_parquet_spark.plans.incremental_spans import (
    gram_index_rows, incremental_dup_spans)

# k=3 tests. History doc 1 holds "a b c d e"; batch doc 10 embeds the
# same run at positions 2..6, batch docs 20/21 share a batch-internal
# run "p q r s" nowhere in history, batch doc 30 is clean.
HIST = [(1, "a b c d e x1 y1 z1")]
BATCH = [
    (10, "m n a b c d e"),
    (20, "p q r s t0 u0 v0"),
    (21, "w0 w1 p q r s"),
    (30, "entirely fresh tokens only here"),
]


def _spans(spark, batch=BATCH, hist=HIST, k=3):
    h = spark.createDataFrame(hist, "doc_id long, text string")
    b = spark.createDataFrame(batch, "doc_id long, text string")
    idx = gram_index_rows(h, k=k).select("h")
    out = incremental_dup_spans(b, idx, k=k)
    return {(r.doc_id, r.span_start): r for r in out.collect()}


def test_history_hit_spans_carry_idx_attribution(spark):
    spans = _spans(spark)
    s10 = spans[(10, 2)]
    # "a b c d e" at 2..6: three k=3 windows, every one hits history
    assert (s10.span_end, s10.span_tokens, s10.n_windows,
            s10.idx_windows) == (6, 5, 3, 3)


def test_batch_internal_dup_has_zero_idx_windows(spark):
    spans = _spans(spark)
    s20 = spans[(20, 0)]
    s21 = spans[(21, 2)]
    assert (s20.span_tokens, s20.n_windows, s20.idx_windows) == (4, 2, 0)
    assert (s21.span_tokens, s21.n_windows, s21.idx_windows) == (4, 2, 0)


def test_clean_doc_emits_no_spans_and_history_not_reprobed(spark):
    spans = _spans(spark)
    assert 30 not in {d for d, _ in spans}
    # history docs never appear in the output frame
    assert 1 not in {d for d, _ in spans}


def test_arrival_loop_maintains_gram_index_through_keyed_table(spark, tmp_path):
    """Batch 1 seeds the persisted gram index; each later batch is
    probed against it and contributes its own grams back — history is
    never re-tokenized."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        read_keyed_table, upsert_into_keyed_table)

    path = str(tmp_path / "gram_index")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def probe(new_rows):
        idx = read_keyed_table(spark, path).select("h")
        out = incremental_dup_spans(docs(new_rows), idx, k=3)
        return {(r.doc_id, r.span_start): (r.span_tokens, r.idx_windows)
                for r in out.collect()}

    upsert_into_keyed_table(
        spark, gram_index_rows(docs(HIST), k=3),
        path=path, key="h", updated_at_col=None)

    # batch 2: doc 10 hits history, doc 20 is clean vs index
    spans2 = probe([(10, "m n a b c d e"), (20, "p q r s t0 u0 v0")])
    assert spans2 == {(10, 2): (5, 3)}

    # index catches up with batch 2's grams
    upsert_into_keyed_table(
        spark, gram_index_rows(
            docs([(10, "m n a b c d e"), (20, "p q r s t0 u0 v0")]), k=3),
        path=path, key="h", updated_at_col=None)

    # batch 3: doc 31 repeats batch-2's "p q r s" -> now an INDEX hit
    spans3 = probe([(31, "w0 w1 p q r s")])
    assert spans3 == {(31, 2): (4, 2)}

    # the index is keyed by h: distinct and idempotent under re-upsert
    idx = read_keyed_table(spark, path)
    assert idx.select("h").distinct().count() == idx.count()
