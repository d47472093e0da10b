"""Blocked all-pairs cosine: multi-block runs must produce exactly the
brute-force pair set (each pair once, no misses at block boundaries)."""

import numpy as np
import pytest

from howto_mongo_bulk_update_from_parquet_spark.operators.vector_blocks import cosine_all_pairs_blocked


def _brute_force_pairs(ids, mat, threshold, digits):
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(m @ m.T, digits)
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= threshold:
                out[(int(ids[i]), int(ids[j]))] = float(sims[i, j])
    return out


@pytest.mark.parametrize("block_size,n_blocks_min", [(16, 4), (1000, 1)])
def test_blocked_pairs_match_bruteforce(spark, block_size, n_blocks_min):
    rng = np.random.default_rng(7)
    n, dim = 60, 8
    # half the vectors are noisy copies of a few prototypes → plenty of
    # similar pairs across (and within) hash blocks
    protos = rng.normal(size=(5, dim))
    mat = np.concatenate([
        protos[rng.integers(0, 5, n // 2)] + 0.05 * rng.normal(size=(n // 2, dim)),
        rng.normal(size=(n - n // 2, dim))])
    ids = np.arange(100, 100 + n)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, mat)],
        "vid long, emb array<double>")

    got = {(r.id_a, r.id_b): r.cos_sim
           for r in cosine_all_pairs_blocked(
               df, "vid", "emb", threshold=0.8,
               block_size=block_size, round_digits=5).collect()}
    want = _brute_force_pairs(ids, mat, 0.8, 5)
    assert got == want
    assert len(want) > 10          # the fixture actually has pairs
    assert -(-n // block_size) >= n_blocks_min


def test_eager_cleanup_releases_cache_and_broadcasts(spark):
    """Repeated multi-block calls in one session must not accumulate
    executor storage: with eager_cleanup (default) the pair set is
    collected to a driver-backed DataFrame — NOTHING stays persisted
    on executors (no localCheckpoint: its partitions would die with
    the executor that computed them, unrecoverable once the broadcasts
    are destroyed) — and the blocked input frame is unpersisted."""
    df = spark.createDataFrame([(i, [1.0, 2.0, 3.0]) for i in range(30)],
                               "vid long, emb array<double>")
    def persistent_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    before = persistent_ids()
    out = cosine_all_pairs_blocked(df, "vid", "emb", threshold=0.99,
                                   block_size=8)
    after = persistent_ids()
    # no new persisted storage at all: the result is driver-backed
    assert after - before == set()
    # the result must survive the broadcast destroy + unpersist
    assert len(out.collect()) == 30 * 29 // 2


def test_blocked_pairs_no_duplicates_across_blocks(spark):
    # identical vectors in every block: every pair qualifies; each must
    # appear exactly once
    n = 24
    df = spark.createDataFrame([(i, [1.0, 2.0, 3.0]) for i in range(n)],
                               "vid long, emb array<double>")
    rows = cosine_all_pairs_blocked(df, "vid", "emb", threshold=0.99,
                                    block_size=5).collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs)) == n * (n - 1) // 2
    assert all(a < b for a, b in pairs)
