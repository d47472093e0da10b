"""Arrow vector kernels vs the expression forms: the mapInPandas
assignment must reproduce the exploded-cells decimal aggregation
bit-for-bit, and the exact-rounding helper must match BigDecimal
HALF_UP on adversarial boundary values."""

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.operators.vector_kernels import (
    assign_exact, cluster_neardup_flags, round12_scaled, round_half_up)
from howto_mongo_bulk_update_from_parquet_spark.plans.kmeans import (
    _assign, _cells, _recompute, K, seed_centroids, _collect_centroids)
from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.01"


def test_round12_scaled_matches_decimal_half_up():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.random(2000) * 4.0,                  # typical squared diffs
        rng.random(100) * 1e-9,                  # tiny
        np.array([0.0, 1.2345678901235e-3]),
        # exact representable .5-boundary neighbourhoods
        np.array([5e-13, 1.5e-12, 2.5e-12, 0.1234567890125]),
    ])
    got = round12_scaled(vals)
    want = np.array([int(Decimal(float(x)).quantize(Decimal("1e-12"),
                                                    ROUND_HALF_UP)
                         * 1_000_000_000_000) for x in vals])
    assert (got == want).all()


def test_round_half_up_matches_decimal_on_boundaries():
    """The cosine-rounding kernel must be HALF_UP (F.round / DuckDB
    ROUND), not numpy's half-to-even — 2**-7 = 0.0078125 is exactly
    representable and rounds differently under the two modes at 6
    decimals (HALF_UP 0.007813, half-even 0.007812)."""
    rng = np.random.default_rng(11)
    for r in (5, 6):
        vals = np.concatenate([
            rng.random(2000) * 2.0 - 1.0,            # cosine range
            np.array([0.0078125, -0.0078125,          # 2**-7 boundaries
                      0.015625, -0.015625,            # 2**-6
                      0.5, -0.5, 1.0, -1.0, 0.0]),
            rng.random(100) * 1e-9 - 5e-10,           # near-zero
        ])
        got = round_half_up(vals, r)
        q = Decimal(1).scaleb(-r)
        want = np.array([
            float(-(Decimal(float(-x)).quantize(q, ROUND_HALF_UP)))
            if x < 0 else
            float(Decimal(float(x)).quantize(q, ROUND_HALF_UP))
            for x in vals])
        assert (got == want).all(), (r, vals[got != want][:5])
    # half-even would get these WRONG — prove the mode actually differs
    assert round_half_up(np.array([0.0078125]), 6)[0] == 0.007813
    assert np.round(np.array([0.0078125]), 6)[0] == 0.007812
    # negative ties round away from zero; -0.0 folds to +0.0
    assert round_half_up(np.array([-0.0078125]), 6)[0] == -0.007813
    import math
    z = round_half_up(np.array([-1e-9]), 6)[0]
    assert z == 0.0 and math.copysign(1.0, z) == 1.0


def test_round_half_up_property_matches_decimal():
    """Property: signed doubles, both common round_to values."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False,
                     allow_infinity=False),
           st.sampled_from([5, 6]))
    def check(x, r):
        got = round_half_up(np.array([x]), r)[0]
        q = Decimal(1).scaleb(-r)
        ax = float(Decimal(float(abs(x))).quantize(q, ROUND_HALF_UP))
        want = -ax if (x < 0 and ax != 0.0) else ax
        assert got == want, (x, r, got, want)

    check()


def test_assign_kernel_matches_expression_form(spark):
    e = load_table(spark, SF, "embeddings")
    vals = _cells(e, "vec_id", "vd")
    cents = (_cells(e.filter(F.col("vec_id") < K), "vec_id", "cd")
             .withColumnRenamed("vec_id", "cid"))
    want = {(r["vec_id"], r["cid"]) for r in _assign(vals, cents).collect()}
    got = {(r["vec_id"], r["cid"])
           for r in assign_exact(e, seed_centroids(e)).collect()}
    assert got == want and len(got) == e.count()


def test_assign_kernel_matches_after_recompute_round(spark):
    """Round-2 centroids (exact decimal means) must also agree."""
    e = load_table(spark, SF, "embeddings")
    vals = _cells(e, "vec_id", "vd")
    a1 = assign_exact(e, seed_centroids(e))
    cents_df = _recompute(vals, a1)
    want = {(r["vec_id"], r["cid"])
            for r in _assign(vals, cents_df.withColumnRenamed("cd", "cd")
                             ).collect()}
    got = {(r["vec_id"], r["cid"])
           for r in assign_exact(e, _collect_centroids(cents_df)).collect()}
    assert got == want


def test_pq_encode_seeds_self_code_and_error_monotone(spark):
    """Codebook seed vectors must encode to their own code with zero
    reconstruction error; non-seed vectors get nonneg error and codes
    within the codebook range."""
    from howto_mongo_bulk_update_from_parquet_spark.operators.vector_kernels import pq_encode
    e = load_table(spark, SF, "embeddings")
    out = pq_encode(e, seed_centroids(e, 16), 4).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == e.count()
    for i in range(16):
        r = by_id[i]
        assert (r["code0"], r["code1"], r["code2"], r["code3"]) == (i, i, i, i)
        assert r["recon_err"] == 0.0
    assert all(0 <= r[f"code{b}"] < 16 for r in out for b in range(4))
    assert all(r["recon_err"] >= 0.0 for r in out)


def test_cluster_neardup_flags_matches_pair_join(spark):
    """The per-cluster gram kernel must flag exactly the vectors the
    pair-join + fold-cosine form drops."""
    from howto_mongo_bulk_update_from_parquet_spark.plans.similarity import (
        _as_double, dot)
    e = load_table(spark, SF, "embeddings")
    members = assign_exact(e, seed_centroids(e), carry_vec=True)
    got = {(r["vec_id"], r["cluster"], r["kept"])
           for r in cluster_neardup_flags(members, 0.45).collect()}

    assign = assign_exact(e, seed_centroids(e))
    vn = (e.select("vec_id", _as_double("embedding").alias("ev"))
           .withColumn("nrm", F.sqrt(dot(F.col("ev"), F.col("ev")))))
    m = vn.join(assign, "vec_id")
    a, b = m.alias("a"), m.alias("b")
    cos = F.round(dot(F.col("a.ev"), F.col("b.ev"))
                  / (F.col("a.nrm") * F.col("b.nrm")), 5)
    dropped = {r["vec_id"] for r in
               a.join(b, (F.col("a.cid") == F.col("b.cid"))
                      & (F.col("a.vec_id") < F.col("b.vec_id")))
                .filter(cos >= 0.45)
                .select(F.col("b.vec_id").alias("vec_id")).distinct().collect()}
    want = {(r["vec_id"], r["cid"], 0 if r["vec_id"] in dropped else 1)
            for r in assign.collect()}
    assert got == want
    assert any(k == 0 for _, _, k in got), "fixture should drop something"


def test_round12_scaled_property_matches_decimal():
    """Property: for any non-negative double, the vectorized scaled
    rounding equals HALF_UP on the exact binary expansion (Spark's
    BigDecimal semantics)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=0.0, max_value=4.5, allow_nan=False,
                     allow_infinity=False))
    def check(x):
        got = int(round12_scaled(np.array([x]))[0])
        want = int(Decimal(x).quantize(Decimal("1e-12"), ROUND_HALF_UP)
                   * 1_000_000_000_000)
        assert got == want, (x, got, want)

    check()
