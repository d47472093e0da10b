"""Connected components / dedup clustering over pair lists."""

from howto_mongo_bulk_update_from_parquet_spark.operators.graph import (
    connected_components, dedup_representatives)


def test_components_chain_and_islands(spark):
    # 1-2-3 chained, 5-6, 8-9-10 (via 9), singleton edges only
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10)], "id_a long, id_b long")
    got = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8}


def test_components_long_chain_converges(spark):
    # a 12-node path needs multiple propagation rounds
    pairs = spark.createDataFrame([(i, i + 1) for i in range(100, 112)],
                                  "id_a long, id_b long")
    got = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert set(got.values()) == {100}
    assert len(got) == 13


def test_dedup_representatives_keep_flags(spark):
    pairs = spark.createDataFrame([(7, 3), (3, 11)], "id_a long, id_b long")
    rows = {r.node: (r.cluster, r.keep)
            for r in dedup_representatives(pairs).collect()}
    assert rows == {3: (3, True), 7: (3, False), 11: (3, False)}


def test_pointer_jumping_chain_converges_logarithmically(spark):
    """A 64-node chain is the adversarial O(diameter) case for plain
    min-label propagation (~63 rounds); pointer jumping must collapse
    it in O(log n) rounds and still find the single component."""
    from howto_mongo_bulk_update_from_parquet_spark.operators.graph import (
        _components_loop_stats)
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    labels, rounds = _components_loop_stats(pairs, "id_a", "id_b", 100)
    got = {(r["node"], r["cluster"]) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}
    assert rounds <= 14, f"expected O(log n) rounds, got {rounds}"
