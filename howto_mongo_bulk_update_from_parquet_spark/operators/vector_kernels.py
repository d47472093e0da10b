"""Arrow-batched exact vector kernels: centroid assignment, cluster
pair-scan, and centroid scoring as numpy matmuls over `mapInPandas` /
`applyInPandas`.

Why these exist: the expression-level forms (posexplode → broadcast
join on pos → decimal aggregation, or per-pair `aggregate`/`zip_with`
folds) are correct and fully declarative, but they pay an N×K×dim
row blowup through a shuffle (assignment) or an interpreted
higher-order fold per candidate pair. The kernels here compute the
IDENTICAL values — including the cross-engine exact-decimal rounding
discipline — as one Arrow batch → one numpy matmul, with no shuffle
at all for assignment (centroids ride the task closure, exactly like
MLlib's KMeans broadcasts its centers each Lloyd's round).

Exactness contract (matches plans/kmeans.py and the DuckDB oracles):
  distance  d2 = Σ_dims ROUND((vd - cd)², 12)  summed as DECIMAL
The kernel reproduces this bit-for-bit in int64: each term is the
HALF_UP 12-decimal rounding of the exact IEEE double (vd-cd)²,
scaled by 1e12 (terms are non-negative and ≤ ~4·10¹², and 64 of
them stay far below 2⁶³, so the integer sum is exact). The scaled
rounding is vectorized; elements whose scaled fraction falls within
a few ulps of the .5 boundary — where float error could flip HALF_UP
— are re-rounded through `decimal.Decimal(double)` (the exact binary
expansion, i.e. precisely the BigDecimal semantics Spark's `round`
uses). Everything else is plain correctly-rounded IEEE arithmetic,
identical in numpy, the JVM, and DuckDB.

Scale notes (100 TB): assignment is embarrassingly parallel — a map
over vector batches with a K×dim closure; no exploded cells, no
join, no shuffle. The pair scan is confined to within-cluster blocks
(the SemDeDup contract: K is chosen so E[|cell|] is bounded — e.g.
K = N/5k — so each group's gram matrix is a small dense matmul).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALE12 = Decimal("1e-12")


def round12_scaled(d: np.ndarray) -> np.ndarray:
    """int64 of ROUND(d, 12)·1e12 with exact HALF_UP semantics for
    NON-NEGATIVE doubles (Spark round / DuckDB ROUND / decimal cast
    all agree on this value)."""
    t = d * 1e12
    n = np.floor(t + 0.5)
    # ambiguity window: |t - (floor(t)+0.5)| within a few ulps of t —
    # only there can multiply error flip HALF_UP. ~0 elements in
    # practice; each goes through the exact Decimal expansion.
    frac = t - np.floor(t)
    eps = np.spacing(np.maximum(np.abs(t), 1.0)) * 8.0
    amb = np.abs(frac - 0.5) <= eps
    if amb.any():
        flat_d = d[amb].ravel()
        exact = [int((Decimal(float(x)).quantize(_SCALE12, ROUND_HALF_UP)
                      * 1_000_000_000_000))
                 for x in flat_d]
        n = n.copy()
        n[amb] = np.array(exact, dtype=np.float64)
    return n.astype(np.int64)


def round_half_up(d: np.ndarray, round_to: int) -> np.ndarray:
    """ROUND(d, round_to) with HALF_UP (away-from-zero) ties — the
    semantics of Spark's F.round (Java BigDecimal HALF_UP) and
    DuckDB's ROUND — for doubles of EITHER sign. np.round is IEEE
    half-to-even, which silently diverges on exactly-representable
    half-boundary values (e.g. 2**-7 = 0.0078125 at round_to=6:
    HALF_UP gives 0.007813, half-even gives 0.007812), breaking the
    cross-engine exactness contract for rounded cosines. Same
    scaled-floor + ulp-ambiguity Decimal-fallback discipline as
    round12_scaled, applied to |d| then sign-restored.
    """
    scale = 10.0 ** round_to           # exact for round_to <= 22
    t = np.abs(d) * scale
    n = np.floor(t + 0.5)
    frac = t - np.floor(t)
    eps = np.spacing(np.maximum(t, 1.0)) * 8.0
    amb = np.abs(frac - 0.5) <= eps
    out = n / scale
    if amb.any():
        q = Decimal(1).scaleb(-round_to)
        exact = [float(Decimal(float(x)).quantize(q, ROUND_HALF_UP))
                 for x in np.abs(d)[amb].ravel()]
        out = out.copy()
        out[amb] = np.array(exact, dtype=np.float64)
    # copysign restores the sign; `+ 0.0` folds -0.0 back to +0.0
    # (BigDecimal has no signed zero, so F.round yields +0.0 there).
    return np.copysign(out, d) + 0.0


def _stack(col: pd.Series) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list<float> column."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def widen_for_kernel(df: DataFrame) -> DataFrame:
    """Give a Python-kernel input the session's parallelism when its
    scan cannot provide it (guide §2.5: one huge unsplittable input —
    e.g. a single-row-group parquet file — caps the whole map stage at
    one task, and the matmul kernels inherit that single core).
    Scale-adaptive, not a local constant: only repartitions when the
    frame's planned partition count is under half the session's
    defaultParallelism — a production multi-file scan already arrives
    wide and skips the exchange entirely. The round-robin repartition
    moves O(rows × dim) vector bytes once; kernel outputs are per-row
    independent, so results are identical under any partitioning."""
    try:
        cur = df.rdd.getNumPartitions()
        width = df.sparkSession.sparkContext.defaultParallelism
    except Exception:
        return df
    if cur * 2 <= width:
        return df.repartition(width)
    return df


ASSIGN_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("cid", T.LongType()),
])

ASSIGN_VEC_SCHEMA = T.StructType(
    ASSIGN_SCHEMA.fields
    + [T.StructField("embedding", T.ArrayType(T.DoubleType()))])


def assign_exact(vecs: DataFrame, centroids: list[tuple[int, list[float]]],
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 carry_vec: bool = False) -> DataFrame:
    """Nearest-centroid assignment by exact-decimal squared L2 — the
    Arrow kernel form of plans/kmeans.py::_assign (bit-identical
    output, proven by tests/test_vector_kernels.py).

    `centroids` is driver state: [(cid, [dim doubles]), ...] sorted
    ascending by cid (ties break to the lowest cid, like the oracle's
    ORDER BY d2, cid). No shuffle: one map over vector batches.
    `carry_vec=True` also emits the vector (as doubles) so a
    downstream per-cluster stage can group without re-joining the
    source — the embeddings cross exactly one exchange either way,
    this just removes the join.
    """
    cents = sorted(centroids)
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([v for _, v in cents], dtype=np.float64)  # (K, dim)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = _stack(pdf[vec_col])                       # (n, dim)
            # exact per-term rounding, then exact integer sums
            diff = V[:, None, :] - C[None, :, :]           # (n, K, dim)
            d2 = round12_scaled(diff * diff).sum(axis=2)   # (n, K) int64
            best = cids[np.argmin(d2, axis=1)]             # first min = lowest cid
            out = {"vec_id": pdf[id_col].to_numpy(), "cid": best}
            if carry_vec:
                out["embedding"] = list(V)
            yield pd.DataFrame(out)

    schema = ASSIGN_VEC_SCHEMA if carry_vec else ASSIGN_SCHEMA
    return widen_for_kernel(
        vecs.select(id_col, vec_col)).mapInPandas(kernel, schema)


def score_centroids(vecs: DataFrame, centroids: list[tuple[int, list[float]]],
                    round_to: int = 6, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(vec_id, c_id, sim): rounded cosine of every vector against
    every centroid — one matmul per Arrow batch instead of K
    interpreted `aggregate` folds per row. Rounding to `round_to`
    absorbs summation-order ulps exactly as the expression form does
    (both engines already fold in different orders)."""
    cents = sorted(centroids)
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([v for _, v in cents], dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))                      # (K,)

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("c_id", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = _stack(pdf[vec_col])
            vn = np.sqrt((V * V).sum(axis=1))
            sim = round_half_up((V @ C.T) / (vn[:, None] * cn[None, :]),
                                round_to)
            n, k = sim.shape
            yield pd.DataFrame({
                "vec_id": np.repeat(pdf[id_col].to_numpy(), k),
                "c_id": np.tile(cids, n),
                "sim": sim.ravel(),
            })

    return widen_for_kernel(
        vecs.select(id_col, vec_col)).mapInPandas(kernel, schema)


def pq_encode(vecs: DataFrame, codebook: list[tuple[int, list[float]]],
              n_blocks: int, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Product-quantization encode: split each vector into `n_blocks`
    contiguous sub-vectors, assign each to its nearest codeword (the
    same exact-decimal squared-L2 contract as assign_exact, per
    block), emit the code tuple + total reconstruction error.

    `codebook` holds FULL seed vectors [(code, dims)]; block b uses
    their [b·w, (b+1)·w) slice — the IVF-PQ training shorthand the
    oracle mirrors. One shuffle-free map; at 100 TB this is the
    standard ANN compression pass (64 floats → n_blocks bytes),
    with codebooks as broadcast driver state."""
    cb = sorted(codebook)
    codes = np.array([c for c, _ in cb], dtype=np.int64)
    C = np.array([v for _, v in cb], dtype=np.float64)     # (K, dim)
    dim = C.shape[1]
    assert dim % n_blocks == 0, "dim must divide evenly into blocks"
    w = dim // n_blocks

    fields = [T.StructField("vec_id", T.LongType())]
    fields += [T.StructField(f"code{b}", T.LongType()) for b in range(n_blocks)]
    fields.append(T.StructField("recon_err", T.DoubleType()))
    schema = T.StructType(fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = _stack(pdf[vec_col])
            out = {"vec_id": pdf[id_col].to_numpy()}
            total = np.zeros(len(pdf), dtype=np.int64)
            for b in range(n_blocks):
                sl = slice(b * w, (b + 1) * w)
                diff = V[:, None, sl] - C[None, :, sl]     # (n, K, w)
                d2 = round12_scaled(diff * diff).sum(axis=2)
                best = np.argmin(d2, axis=1)               # first min = lowest code
                out[f"code{b}"] = codes[best]
                total += d2[np.arange(len(pdf)), best]
            # exact decimal total / 1e12 -> nearest double, identical
            # to the oracle's CAST(SUM(DECIMAL) AS DOUBLE)
            out["recon_err"] = total / 1e12
            yield pd.DataFrame(out)

    return widen_for_kernel(
        vecs.select(id_col, vec_col)).mapInPandas(kernel, schema)


def pq_adc_search(vecs: DataFrame, codebook: list[tuple[int, list[float]]],
                  n_blocks: int, queries: list[tuple[int, list[float]]],
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance PQ search: each query precomputes a
    (n_blocks × K) lookup table of exact block distances to every
    codeword; scanning the corpus then costs n_blocks int64 table
    lookups per (query, vector) instead of a dim-length float dot —
    THE trick that makes exhaustive ANN over compressed codes feasible
    at 100 TB. Distances keep the exact-decimal contract (int64-scaled
    round-12 terms), so ranks are bit-identical in both engines.

    Emits (q_id, n_id, adc_scaled) for every corpus vector except the
    query itself; callers rank/limit. LUTs ride the task closure
    (queries × blocks × K int64s — KBs)."""
    cb = sorted(codebook)
    codes = np.array([c for c, _ in cb], dtype=np.int64)
    code_pos = {c: i for i, c in enumerate(codes)}
    C = np.array([v for _, v in cb], dtype=np.float64)
    dim = C.shape[1]
    w = dim // n_blocks
    q_ids = np.array([q for q, _ in queries], dtype=np.int64)
    Q = np.array([v for _, v in queries], dtype=np.float64)     # (nq, dim)
    # LUT[qi, b, ci] = exact scaled block distance
    lut = np.zeros((len(q_ids), n_blocks, len(codes)), dtype=np.int64)
    for b in range(n_blocks):
        sl = slice(b * w, (b + 1) * w)
        diff = Q[:, None, sl] - C[None, :, sl]
        lut[:, b, :] = round12_scaled(diff * diff).sum(axis=2)

    schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField("n_id", T.LongType()),
        T.StructField("adc_scaled", T.LongType()),
    ])

    encoded = pq_encode(vecs, codebook, n_blocks, id_col, vec_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            ids = pdf["vec_id"].to_numpy()
            adc = np.zeros((len(q_ids), n), dtype=np.int64)
            for b in range(n_blocks):
                ci = np.array([code_pos[c] for c in pdf[f"code{b}"]])
                adc += lut[:, b, :][:, ci]
            out = pd.DataFrame({
                "q_id": np.repeat(q_ids, n),
                "n_id": np.tile(ids, len(q_ids)),
                "adc_scaled": adc.ravel(),
            })
            yield out[out.q_id != out.n_id]

    return encoded.mapInPandas(kernel, schema)


def cluster_neardup_flags(members: DataFrame, threshold: float,
                          round_to: int = 5) -> DataFrame:
    """(vec_id, cluster, kept): within each cluster, drop any vector
    whose cluster holds a LOWER-id vector with rounded cosine ≥
    threshold (the SemDeDup keep-first rule) — one gram matmul per
    cluster via applyInPandas instead of a candidate-pair self-join
    with per-pair folds.

    `members` must have (vec_id, cid, embedding). Cluster blocks are
    bounded by construction (K scales with N), so each group's
    |cell|² gram matrix is small and dense."""
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cluster", T.LongType()),
        T.StructField("kept", T.LongType()),
    ])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        E = _stack(pdf["embedding"])
        nrm = np.sqrt((E * E).sum(axis=1))
        cos = round_half_up((E @ E.T) / np.outer(nrm, nrm), round_to)
        # strictly-lower-id comparisons only (upper triangle, j > i)
        dup = np.triu(cos >= threshold, k=1).any(axis=0)
        return pd.DataFrame({"vec_id": ids,
                             "cluster": pdf["cid"].to_numpy(),
                             "kept": (~dup).astype(np.int64)})

    return (members.groupBy("cid")
            .applyInPandas(kernel, schema))
