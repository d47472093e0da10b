"""Source↔sink reconciliation: order/partition-invariant content
checksums and a grouped checksum diff.

The reference pipeline writes (parquet → transform → Mongo bulk
upsert, reference `src/func/mongo.py:272-301`) and never verifies the
sink; this operator pair is that missing step, generalized over any
two DataFrames that should hold the same multiset of rows — source
parquet vs sink export, pre- vs post-migration copies, two replicas.

Both sides reduce each row to a 60-bit md5-derived hash, then fold
hashes with COMMUTATIVE aggregates (SUM over DECIMAL(38,0) + BIT_XOR
as an independent second witness), so the result is invariant to row
order, partitioning, and executor count — the two sides can run on
different clusters. A 100 TB comparison costs one scan per side and a
shuffle of per-group 24-byte partials; `checksum_diff` localizes any
mismatch to a group, after which `operators/diff.py` does the
row-level drill-down on just that group's rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64


def canonical_row(df: DataFrame, cols: list[str] | None = None,
                  group_cols: tuple[str, ...] = ()) -> Column:
    """'|'-joined canonical rendering of a row.

    Floats/doubles are pinned to DECIMAL(28,10) before stringifying:
    a raw double→string cast is engine- and locale-shaped (1.0 vs 1,
    scientific notation cutoffs), while a decimal renders one way.
    Timestamps render as 'yyyy-MM-dd HH:mm:ss' in the session zone.
    NULL renders as a sentinel concat_ws would otherwise drop
    (dropping it would make (NULL,'x') collide with ('x',NULL)).
    """
    cols = cols if cols is not None else [
        c for c in df.columns if c not in group_cols]
    rendered = []
    for name in cols:
        dt = df.schema[name].dataType.simpleString()
        c = F.col(name)
        if dt in ("float", "double"):
            c = c.cast("decimal(28,10)")
        elif dt.startswith("timestamp"):
            c = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        rendered.append(F.coalesce(c.cast("string"), F.lit("\x00NULL")))
    return F.concat_ws("|", *rendered)


def table_checksum(df: DataFrame, group_cols: list[str],
                   canon: Column | None = None) -> DataFrame:
    """Per-group (n_rows, checksum_sum, checksum_xor) over `df`.

    checksum_sum is the DECIMAL(38,0) sum of 60-bit row hashes
    rendered as a string (38-digit integers overflow int64 and lose
    precision through float bridges); checksum_xor is the int64 XOR
    fold. Equal triples on both sides prove per-group multiset
    equality up to hash collision; the two independent folds make a
    coincident double collision the only false negative.
    """
    canon = canon if canon is not None else canonical_row(
        df, group_cols=tuple(group_cols))
    h = portable_hash64(canon)
    return (df.select(*group_cols, h.alias("__h"))
              .groupBy(*group_cols)
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum(F.col("__h").cast("decimal(38,0)"))
                    .cast("string").alias("checksum_sum"),
                   F.bit_xor("__h").alias("checksum_xor")))


def checksum_diff(left: DataFrame, right: DataFrame,
                  group_cols: list[str],
                  cols: list[str] | None = None) -> DataFrame:
    """Groups where the two tables' content differs.

    Returns one row per mismatched group with both sides' triples
    (NULL-filled for a group present on only one side). Empty result =
    the tables hold identical multisets per group (up to hash
    collision). Column alignment: compares `cols` (default: the
    non-group columns of `left`, which must exist in `right` — extra
    right-side columns such as audit timestamps are ignored).
    """
    cols = cols if cols is not None else [
        c for c in left.columns if c not in group_cols]
    a = table_checksum(left, group_cols, canonical_row(left, cols))
    b = table_checksum(right, group_cols, canonical_row(right, cols))
    a = a.select(*group_cols,
                 *[F.col(c).alias(f"left_{c}")
                   for c in ("n_rows", "checksum_sum", "checksum_xor")])
    b = b.select(*group_cols,
                 *[F.col(c).alias(f"right_{c}")
                   for c in ("n_rows", "checksum_sum", "checksum_xor")])
    joined = a.join(b, list(group_cols), "full_outer")
    mismatch = (
        ~F.col("left_n_rows").eqNullSafe(F.col("right_n_rows"))
        | ~F.col("left_checksum_sum").eqNullSafe(F.col("right_checksum_sum"))
        | ~F.col("left_checksum_xor").eqNullSafe(F.col("right_checksum_xor")))
    return joined.filter(mismatch)
