"""Distributed PCA, MLlib-shaped: the data-sized work is ONE pass of
Arrow-batch matmuls (per-batch Gram partials, no row blowup, no
shuffle of exploded entries); the eigendecomposition runs on the
driver over a dim×dim matrix — KB-scale state for any corpus size,
like plans/kmeans.py's centroid step.

  1. MOMENTS: mapInPandas emits one partial (n, Σx, XᵀX) row per Arrow
     batch — a 64-vector and a 64×64 flat Gram each. Collected rows
     number O(#partitions), independent of table size.
  2. FIT (driver): covariance = Gram/n − μμᵀ, `numpy.linalg.eigh`,
     top-k eigenvectors; sign fixed so each component's largest-|entry|
     is positive (eigh's sign is arbitrary; projections must be
     reproducible run-to-run).
  3. PROJECT: one shuffle-free mapInPandas matmul (X − μ) Wᵀ.

No SQL oracle exists for eigh, so the catalog entry is rows-only; the
numeric contract (matches numpy full-data PCA, orthonormal W, variance
sorted descending) is pinned in tests/test_pca.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .vector_kernels import _stack


def gram_partials(vecs: DataFrame, vec_col: str = "embedding",
                  dim: int = 64) -> tuple[int, np.ndarray, np.ndarray]:
    """One data pass → (n, Σx [dim], XᵀX [dim×dim]) reduced on driver."""
    schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("g", T.ArrayType(T.DoubleType())),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = _stack(pdf[vec_col])
            yield pd.DataFrame({"n": [len(x)],
                                "s": [x.sum(axis=0).tolist()],
                                "g": [(x.T @ x).ravel().tolist()]})

    parts = vecs.select(vec_col).mapInPandas(kernel, schema).collect()
    n = sum(r.n for r in parts)
    s = np.sum([np.array(r.s) for r in parts], axis=0)
    g = np.sum([np.array(r.g).reshape(dim, dim) for r in parts], axis=0)
    return n, s, g


def pca_fit(vecs: DataFrame, k: int, vec_col: str = "embedding",
            dim: int = 64) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit → (mean [dim], components [k×dim], explained_var [k])."""
    n, s, g = gram_partials(vecs, vec_col, dim)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                   # k × dim
    # deterministic sign: largest-|entry| of each component positive
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    return mu, comps * flip[:, None], evals[order]


def pca_project(vecs: DataFrame, mean: np.ndarray, comps: np.ndarray,
                id_cols: tuple[str, ...] = ("vec_id", "label"),
                vec_col: str = "embedding") -> DataFrame:
    """Shuffle-free projection: (X − μ) Wᵀ per Arrow batch."""
    k = comps.shape[0]
    fields = [T.StructField(c, T.LongType()) for c in id_cols]
    fields += [T.StructField(f"pc{i + 1}", T.DoubleType())
               for i in range(k)]
    schema = T.StructType(fields)
    mu, w = mean.copy(), comps.copy()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            p = (_stack(pdf[vec_col]) - mu) @ w.T
            out = {c: pdf[c].to_numpy() for c in id_cols}
            out.update({f"pc{i + 1}": p[:, i] for i in range(k)})
            yield pd.DataFrame(out)

    return vecs.select(*id_cols, vec_col).mapInPandas(kernel, schema)
