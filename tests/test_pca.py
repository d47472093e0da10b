"""PCA numeric contract (the catalog entry is rows-only at the
driver): distributed fit must match numpy full-data PCA, components
orthonormal, variance sorted, projection reproducible."""

import numpy as np
import pytest

from howto_mongo_bulk_update_from_parquet_spark.operators.pca import (
    gram_partials, pca_fit, pca_project)
from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").repartition(8)


@pytest.fixture(scope="module")
def local_x(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_gram_partials_match_numpy(emb, local_x):
    n, s, g = gram_partials(emb)
    assert n == len(local_x)
    # partials reduce in a different order than one flat numpy sum —
    # agreement is to float accumulation noise, not bit-exact
    np.testing.assert_allclose(s, local_x.sum(axis=0), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(g, local_x.T @ local_x, rtol=1e-9, atol=1e-12)


def test_fit_matches_full_data_pca(emb, local_x):
    mu, comps, var = pca_fit(emb, k=4)
    np.testing.assert_allclose(mu, local_x.mean(axis=0), rtol=1e-9,
                               atol=1e-12)
    cov = np.cov(local_x, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(var, evals[:4], rtol=1e-8)
    # orthonormal rows
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-10)
    # each component is an eigenvector: cov @ w = lambda w
    # cov here is numpy's; the fit used the distributed moments — the
    # residual reflects that perturbation, not eigh error
    for w, lam in zip(comps, var):
        np.testing.assert_allclose(cov @ w, lam * w, atol=1e-7)
    # variance sorted descending, sign convention applied
    assert list(var) == sorted(var, reverse=True)
    assert all(w[np.abs(w).argmax()] > 0 for w in comps)


def test_projection_matches_local_and_is_stable(emb, local_x):
    mu, comps, _ = pca_fit(emb, k=4)
    proj = pca_project(emb, mu, comps).collect()
    proj.sort(key=lambda r: r.vec_id)
    got = np.array([[r.pc1, r.pc2, r.pc3, r.pc4] for r in proj])
    want = (local_x - local_x.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(got, want, atol=1e-10)
    # the projected cloud is centered and decorrelated with the fitted
    # variances on the diagonal
    np.testing.assert_allclose(got.mean(axis=0), 0, atol=1e-9)
