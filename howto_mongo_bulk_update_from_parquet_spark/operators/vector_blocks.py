"""Blocked all-pairs vector similarity: N×N cosine with O(block)
driver memory — the scale pattern behind embedding near-dup sweeps.

The N×N problem is tiled into B = ceil(N / block_size) blocks by a
deterministic hash of the id. The outer loop runs once per block: that
block alone is collected and broadcast (block_size × dim doubles — the
same budget as a broadcast-join build side), and every row in blocks
≥ b streams through `mapInPandas`, scoring one BLAS matrix multiply
per Arrow batch against the broadcast block. Each unordered pair is
produced exactly once:

- cross-block pair (x ∈ b_i, y ∈ b_j, i < j): emitted only in
  iteration i (iteration j's stream no longer contains b_i);
- within-block pair: emitted in its own iteration under id_a < id_b.

Driver/executor memory is O(block_size · dim) regardless of N; no
cross join, no O(N²) shuffle — candidate emission is bounded by the
threshold's selectivity. Rounding before thresholding keeps BLAS
summation order from flipping a borderline pair vs a sequential-fold
oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cosine_all_pairs_blocked(df: DataFrame, id_col: str, vec_col: str, *,
                             threshold: float, block_size: int = 100_000,
                             round_digits: int = 5,
                             eager_cleanup: bool = True) -> DataFrame:
    """All unordered pairs (id_a < id_b) with rounded cosine similarity
    ≥ `threshold`, tiled over broadcastable blocks.

    Output: (id_a long, id_b long, cos_sim double).

    `eager_cleanup` (default): the call runs the scoring jobs eagerly
    and collects the pair set — small by the threshold's selectivity —
    into a DRIVER-BACKED DataFrame, then unpersists the cached blocked
    frame and destroys every per-block broadcast, so repeated calls in
    a long-lived session don't accumulate executor storage. Driver-
    backed (not localCheckpoint) on purpose: checkpointed partitions
    live only on the executors that computed them, so losing one after
    the broadcasts are destroyed would make the result unrecoverable —
    the collected form survives any executor loss. The collect is
    bounded by the same selectivity argument that makes this operator
    a validation baseline; if the threshold is loose enough that pairs
    don't fit the driver, use the banded LSH path (plans/vector_lsh),
    which needs no driver materialization at all. Pass False to keep
    the result fully lazy (lost-executor recomputation semantics,
    caller owns cleanup — storage is released only when the session's
    context is torn down)."""
    import numpy as np
    import pandas as pd

    from .vector_kernels import round_half_up

    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    n = base.count()
    n_blocks = max(1, -(-n // block_size))
    blocked = base.withColumn(
        "__blk", F.pmod(F.hash("__id"), F.lit(n_blocks)).cast("int"))
    if n_blocks > 1:
        # the outer loop re-reads the blocked set B+1 times (one collect
        # per block + the streamed scans); cache it once
        blocked = blocked.persist()

    schema = "id_a long, id_b long, cos_sim double"

    def make_block_scorer(b: int, bc):
        def block_sim(batches):
            blk_ids, blk = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                q_ids = pdf["__id"].to_numpy()
                q_blk = pdf["__blk"].to_numpy()
                q = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
                q /= np.linalg.norm(q, axis=1, keepdims=True)
                # HALF_UP, matching the oracle's ROUND — np.round is
                # half-to-even and diverges on boundary cosines
                sims = round_half_up(q @ blk.T, round_digits)
                same = q_blk[:, None] == b
                ok = (sims >= threshold) & np.where(
                    same, q_ids[:, None] < blk_ids[None, :], True)
                rows, cols = np.nonzero(ok)
                yield pd.DataFrame({
                    "id_a": np.minimum(q_ids[rows], blk_ids[cols]),
                    "id_b": np.maximum(q_ids[rows], blk_ids[cols]),
                    "cos_sim": sims[rows, cols]})
        return block_sim

    parts: list[DataFrame] = []
    broadcasts = []
    for b in range(n_blocks):
        blk_pdf = (blocked.filter(F.col("__blk") == b)
                   .select("__id", "__vec").toPandas())
        if not len(blk_pdf):
            continue
        blk_ids = blk_pdf["__id"].to_numpy()
        blk = np.stack(blk_pdf["__vec"].to_numpy()).astype(np.float64)
        blk /= np.linalg.norm(blk, axis=1, keepdims=True)
        bc = spark.sparkContext.broadcast((blk_ids, blk))
        broadcasts.append(bc)
        stream = blocked.filter(F.col("__blk") >= b)
        parts.append(stream.mapInPandas(make_block_scorer(b, bc), schema=schema))

    if not parts:
        out = spark.createDataFrame([], schema)
    else:
        out = reduce(lambda a, c: a.unionByName(c), parts)
    if eager_cleanup:
        # Arrow both ways: one batched transfer out, and the local
        # relation ships back as Arrow per action instead of pickled
        # rows (a plain collect()-of-Rows relation re-serializes
        # row-at-a-time on EVERY downstream action)
        pair_pdf = out.toPandas()
        out = spark.createDataFrame(pair_pdf, schema)
        if n_blocks > 1:
            blocked.unpersist()
        for bc in broadcasts:
            bc.destroy()
    return out
