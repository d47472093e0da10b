"""Cross-batch embedding near-dup semantics on tiny vectors
(plans/incremental_vec.py) plus the arrival loop maintaining BOTH
persisted stores — the bucket index and the vector store — through
the keyed-table sink."""

import math

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.plans.incremental_vec import (
    incremental_vec_dup_flags, vec_index_rows)

DIM = 64


def _vec(seed, flip=0):
    """Deterministic pseudo-random unit vector (seeded gaussian —
    sin-progression vectors would all share one 2-D subspace and
    correlate spuriously); `flip` perturbs one coordinate slightly
    (near-dup)."""
    import random
    rng = random.Random(seed)
    v = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
    if flip:
        v[0] += flip
    n = math.sqrt(sum(x * x for x in v))
    return [round(x / n, 6) for x in v]


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def _flags(spark, new_rows, hist_rows, threshold=0.45):
    new = _emb(spark, new_rows)
    hist = _emb(spark, hist_rows)
    idx = vec_index_rows(hist, "vec_id") \
        .select("band", "bucket", "member_id")
    out = incremental_vec_dup_flags(
        new, idx, hist.select(F.col("vec_id").alias("member_id"),
                              "embedding"), "vec_id",
        threshold=threshold)
    return {r.vec_id: (r.n_dups, r.match_id, r.cos_sim)
            for r in out.collect()}


def test_exact_dup_vs_history_detected_and_fresh_vector_silent(spark):
    flags = _flags(
        spark,
        new_rows=[(10, _vec(1)),          # identical to history 1
                  (20, _vec(99))],        # unrelated direction
        hist_rows=[(1, _vec(1)), (2, _vec(50))])
    assert 10 in flags and 20 not in flags
    n_dups, match, cos = flags[10]
    assert (n_dups, match) == (1, 1) and cos == 1.0


def test_near_dup_verified_and_best_match_ranked(spark):
    # history holds the same direction twice (1 exact, 2 slightly
    # perturbed): the new arrival must report BOTH as dups with the
    # exact copy as best match
    flags = _flags(
        spark,
        new_rows=[(30, _vec(7))],
        hist_rows=[(1, _vec(7)), (2, _vec(7, flip=0.05)),
                   (3, _vec(123))])
    n_dups, match, cos = flags[30]
    assert n_dups == 2 and match == 1 and cos == 1.0


def test_collision_without_cosine_fails_verification(spark):
    # threshold 1.01: nothing can verify even when buckets collide —
    # LSH candidates alone never classify a vector as dup
    flags = _flags(spark,
                   new_rows=[(10, _vec(1))],
                   hist_rows=[(1, _vec(1))], threshold=1.01)
    assert flags == {}


def test_arrival_loop_maintains_both_stores(spark, tmp_path):
    """The production loop: batch 1 seeds the bucket index AND the
    vector store; each later batch is probed against the index,
    verified against only the colliding members' vectors, and the
    SURVIVORS' rows upsert back. History is never re-signed."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        read_keyed_table, upsert_into_keyed_table)

    idx_path = str(tmp_path / "vec_idx")
    store_path = str(tmp_path / "vec_store")

    def persist_batch(emb):
        upsert_into_keyed_table(spark, vec_index_rows(emb, "vec_id"),
                                path=idx_path, key="idx_key",
                                updated_at_col=None)
        upsert_into_keyed_table(
            spark, emb.select(F.col("vec_id").alias("member_id"),
                              "embedding"),
            path=store_path, key="member_id", updated_at_col=None)

    def probe(new_rows):
        new = _emb(spark, new_rows)
        idx = read_keyed_table(spark, idx_path) \
            .select("band", "bucket", "member_id")
        store = read_keyed_table(spark, store_path)
        out = incremental_vec_dup_flags(new, idx, store, "vec_id")
        return {r.vec_id: r.match_id for r in out.collect()}

    persist_batch(_emb(spark, [(1, _vec(5)), (2, _vec(60))]))

    # batch 2: 11 duplicates history 1; 10 is new
    assert probe([(10, _vec(200)), (11, _vec(5))]) == {11: 1}
    # survivors only (10) join the stores
    persist_batch(_emb(spark, [(10, _vec(200))]))

    # batch 3: 20 duplicates batch-2's survivor (the index caught up)
    assert probe([(20, _vec(200))]) == {20: 10}
    # stores are keyed: idempotent under re-upsert, one row per member
    # per (band, bucket); vector store one row per member
    idx = read_keyed_table(spark, idx_path)
    assert idx.select("idx_key").distinct().count() == idx.count()
    assert read_keyed_table(spark, store_path).count() == 3


def test_batch_dup_losers_keep_smallest(spark):
    """Within-batch near-dups: every vector verifying against a
    smaller-id batch sibling is a loser; the smallest copy and
    unrelated vectors are not."""
    from howto_mongo_bulk_update_from_parquet_spark.plans.incremental_vec import (
        batch_vec_dup_losers)
    emb = _emb(spark, [(1, _vec(9)), (2, _vec(9)), (3, _vec(9, flip=0.05)),
                       (4, _vec(77))])
    losers = {r.vec_id for r in
              batch_vec_dup_losers(emb, "vec_id").collect()}
    assert losers == {2, 3}
