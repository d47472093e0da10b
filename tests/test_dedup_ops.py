"""Tests for MinHash-LSH / SimHash operators on tiny corpora with
known duplicate structure."""

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.operators.dedup import (
    hamming64, lsh_bands, lsh_candidate_pairs, minhash_near_dups,
    minhash_signatures, portable_hash64, shingles, simhash)


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    diff = "completely unrelated words about spark shuffles and parquet files"
    return spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, diff)], "doc_id long, text string")


def test_shingles_distinct_and_sized(spark):
    sh = shingles(_corpus(spark), "doc_id", "text", 3)
    rows = sh.filter(F.col("doc_id") == 0).collect()
    # 12 tokens → 10 trigrams, all distinct here
    assert len(rows) == 10
    assert all(len(r.shingle.split(" ")) == 3 for r in rows)


def test_shingles_short_doc_yields_none(spark):
    # < n tokens: zero shingles (not a descending-sequence index error
    # under ANSI mode) — matches the DuckDB oracle's behavior
    df = spark.createDataFrame(
        [(0, "one two"), (1, "solo"), (2, "a b c")], "doc_id long, text string")
    rows = shingles(df, "doc_id", "text", 3).collect()
    assert {r.doc_id for r in rows} == {2}
    assert len(rows) == 1


def test_minhash_identical_docs_share_signature(spark):
    sig = minhash_signatures(shingles(_corpus(spark), "doc_id", "text"), "doc_id", 16)
    pdf = sig.toPandas().pivot(index="seed", columns="doc_id", values="minhash")
    assert (pdf[0] == pdf[1]).all()          # exact dup: identical signature
    assert (pdf[0] == pdf[2]).sum() > 4      # near dup: many collisions
    assert (pdf[0] == pdf[3]).sum() <= 2     # unrelated: few/no collisions


def test_lsh_pipeline_finds_dup_pair_not_unrelated(spark):
    pairs = {(r.id_a, r.id_b) for r in
             minhash_near_dups(_corpus(spark), "doc_id", "text").collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_lsh_bands_shape(spark):
    sig = minhash_signatures(shingles(_corpus(spark), "doc_id", "text"), "doc_id", 16)
    bands = lsh_bands(sig, "doc_id", 4)
    assert bands.groupBy("doc_id").count().toPandas()["count"].eq(4).all()
    assert lsh_candidate_pairs(bands, "doc_id").columns == ["id_a", "id_b"]


def test_simhash_distance_orders_similarity(spark):
    fp = {r.doc_id: r.simhash for r in simhash(_corpus(spark), "doc_id", "text").collect()}
    assert fp[0] == fp[1]
    near = bin(fp[0] ^ fp[2]).count("1")
    far = bin(fp[0] ^ fp[3]).count("1")
    assert near < far


def test_hamming_helper(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(hamming64(F.col("a"), F.col("b")).alias("d")).first().d == 2


def test_portable_hash_matches_duckdb(spark):
    import duckdb
    got = (spark.range(1)
           .select(portable_hash64(F.lit("abc"), F.lit(7)).alias("h")).first().h)
    want = duckdb.sql(
        "SELECT CAST(('0x' || substr(md5('7:abc'), 1, 15)) AS BIGINT)").fetchone()[0]
    assert got == want


def test_portable_hash64_bit_identical_across_engines(spark):
    """portable_hash64 is the semantic backbone of every dedup/LSH/
    sampling oracle — prove the Spark expression and DuckDB's
    md5-prefix arithmetic agree byte-for-byte on adversarial strings
    (unicode, empties, long runs, full printable range), not just on
    fixture text."""
    import random
    import string

    import duckdb
    from pyspark.sql import functions as F
    from howto_mongo_bulk_update_from_parquet_spark.operators.dedup import portable_hash64

    rng = random.Random(5)
    samples = ["", " ", "a b c", "naïve café 東京", "x" * 500] + \
        ["".join(rng.choices(string.printable, k=rng.randint(1, 60)))
         for _ in range(200)]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r[0] for r in
           df.select(portable_hash64(F.col("s"))).collect()]
    con = duckdb.connect()
    want = [con.execute(
        "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)",
        [s]).fetchone()[0] for s in samples]
    assert got == want
    # seeded form: md5('seed:' || s)
    got_seeded = [r[0] for r in
                  df.select(portable_hash64(F.col("s"), F.lit("mix")))
                  .collect()]
    want_seeded = [con.execute(
        "SELECT CAST(('0x' || substr(md5('mix:' || ?), 1, 15)) AS BIGINT)",
        [s]).fetchone()[0] for s in samples]
    assert got_seeded == want_seeded
