"""Semantic pins for the corpus-curation battery (plans/curation.py):
mixture sampling, shard assignment, decontamination, SemDeDup.
Cross-engine value-exactness is the oracle gate's job; these tests pin
the SEMANTICS the oracle can't see — determinism, invariants, and the
behavior on adversarial inputs."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _q(spark, name, sf=SF):
    from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries
    return all_queries()[name](spark, sf)


def test_mixture_full_rate_sources_keep_everything(spark):
    rows = _q(spark, "q_mixture_sample").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_kept <= r.n_total
        if r.rate_permille == 1000:
            assert r.n_kept == r.n_total, r.source
        # a downsampled source must actually downsample at fixture size
        if r.rate_permille == 100 and r.n_total >= 20:
            assert r.n_kept < r.n_total, r.source


def test_mixture_is_deterministic(spark):
    a = sorted(map(tuple, _q(spark, "q_mixture_sample").collect()))
    b = sorted(map(tuple, _q(spark, "q_mixture_sample").collect()))
    assert a == b


def test_shard_assign_positions_are_contiguous_per_shard(spark):
    pdf = _q(spark, "q_shard_assign").toPandas()
    from howto_mongo_bulk_update_from_parquet_spark.plans.curation import N_SHARDS
    assert set(pdf["shard"]) <= set(range(N_SHARDS))
    assert len(pdf) == pdf["doc_id"].nunique()
    for _, g in pdf.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))


def test_shard_assign_order_is_not_id_order(spark):
    # the whole point of the shuffle: within-shard order must not be
    # the input id order
    pdf = _q(spark, "q_shard_assign").toPandas()
    g = pdf[pdf["shard"] == pdf["shard"].iloc[0]].sort_values("pos")
    ids = list(g["doc_id"])
    assert ids != sorted(ids)


def test_decontaminate_flags_only_training_docs(spark):
    pdf = _q(spark, "q_decontaminate").toPandas()
    assert len(pdf)                       # fixture duplicates cross the split
    assert (pdf["doc_id"] % 10 != 0).all()
    assert ((pdf["n_shared"] >= 1) & (pdf["n_shared"] <= pdf["n_shingles"])).all()
    assert ((pdf["overlap"] > 0) & (pdf["overlap"] <= 1.0)).all()


def test_decontaminate_exact_eval_copy_has_full_overlap(spark, tmp_path):
    # plant a training doc that is a verbatim copy of an eval doc:
    # overlap must be exactly 1.0
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    eval_doc = docs.filter((F.col("doc_id") % 10 == 0)
                           & (F.size(F.split("text", " ")) >= 3)).limit(1).collect()[0]
    planted = spark.createDataFrame(
        [(999_999_999, eval_doc.text, eval_doc.lang, eval_doc.source,
          eval_doc.n_chars)], schema=docs.schema)
    docs.unionByName(planted).write.parquet(str(tmp_path / "documents.parquet"))
    pdf = _q(spark, "q_decontaminate", str(tmp_path)).toPandas()
    row = pdf[pdf["doc_id"] == 999_999_999]
    assert len(row) == 1 and row["overlap"].iloc[0] == 1.0


def test_semdedup_keeps_cluster_minimum_and_drops_near_dups(spark):
    pdf = _q(spark, "q_semdedup").toPandas()
    assert set(pdf["kept"]) <= {0, 1}
    # the lowest id in every cluster has no lower-id mate → always kept
    for _, g in pdf.groupby("cluster"):
        assert g.loc[g["vec_id"].idxmin(), "kept"] == 1
    # fixture embeds near-duplicate pairs at cosine ~0.5 → some drops
    assert (pdf["kept"] == 0).any()
    assert (pdf["kept"] == 1).sum() + (pdf["kept"] == 0).sum() == len(pdf)


def test_semdedup_dropped_have_nearer_lower_id_mate(spark):
    # every dropped vector must actually have a lower-id cluster-mate
    # with cosine >= 0.45 (recompute independently in pandas)
    import numpy as np
    out = _q(spark, "q_semdedup").toPandas()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    vec = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
           for r in emb.itertuples()}
    by_cluster = out.groupby("cluster")
    for _, g in by_cluster:
        ids = sorted(g["vec_id"])
        dropped = set(g.loc[g["kept"] == 0, "vec_id"])
        for v in dropped:
            mates = [u for u in ids if u < v]
            cos = [float(vec[u] @ vec[v]
                         / (np.linalg.norm(vec[u]) * np.linalg.norm(vec[v])))
                   for u in mates]
            assert any(round(c, 5) >= 0.45 for c in cos), v
