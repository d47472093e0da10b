"""Recall check for the IVF search query: trained centroids + nprobe=2
must recover a solid fraction of the brute-force top-3."""

import duckdb

from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries

SF = "/root/testdata/sf0.01"


def test_ivf_recall_at_3(spark):
    ivf = all_queries()["q_ann_ivf_search"](spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
    bf = con.execute("""
      WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id >= 100 AND vec_id < 110),
      c AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS cv FROM embeddings)
      SELECT q_id, n_id FROM (
        SELECT q_id, n_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY list_cosine_similarity(qv, cv) DESC, n_id) AS r
        FROM q JOIN c ON q_id <> n_id) WHERE r <= 3""").fetchdf()
    ivf_pairs = set(zip(ivf.q_id, ivf.n_id))
    bf_pairs = set(zip(bf.q_id, bf.n_id))
    recall = len(ivf_pairs & bf_pairs) / len(bf_pairs)
    # arbitrary centroids + nprobe=1 scored 0.167; trained + nprobe=2
    # must do substantially better on label-clustered embeddings
    assert recall >= 0.5, f"recall@3 = {recall}"
