"""Declarative data-quality constraint audit (the Deequ/dbt-test
shape): a constraint list compiles into ONE aggregation pass over the
table — every row-local check is a `sum(case)` in the same agg, and
uniqueness folds in as `count(*) - count(distinct keys)` — plus one
anti-join per referential constraint (broadcast when the dimension
fits). The report is a tiny DataFrame: (constraint, n_violations,
passed).

At 100 TB the row-local checks are free riders on a single scan
(map-side combined into one row), not N scans for N constraints —
the property that makes an audit runnable on every load.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    kind: str                      # not_null | accepted | range | unique | fk
    cols: tuple[str, ...]
    params: dict = field(default_factory=dict)


def not_null(col: str) -> Constraint:
    return Constraint(f"not_null({col})", "not_null", (col,))


def accepted_values(col: str, values: list) -> Constraint:
    return Constraint(f"accepted({col})", "accepted", (col,),
                      {"values": tuple(values)})


def in_range(col: str, lo, hi) -> Constraint:
    return Constraint(f"range({col})", "range", (col,), {"lo": lo, "hi": hi})


def unique(*cols: str) -> Constraint:
    return Constraint(f"unique({','.join(cols)})", "unique", cols)


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Constraint:
    return Constraint(f"fk({col})", "fk", (col,),
                      {"dim": dim, "dim_col": dim_col})


def _violation(c: Constraint) -> Column:
    col = F.col(c.cols[0])
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "accepted":
        # NULL is not an accepted value either
        return ~col.isin(*c.params["values"]) | col.isNull()
    if c.kind == "range":
        return (col < c.params["lo"]) | (col > c.params["hi"]) | col.isNull()
    raise ValueError(c.kind)


def audit(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate all constraints; row-local ones share a single pass."""
    aggs, names = [], []
    for c in constraints:
        if c.kind == "unique":
            # extras among FULLY NON-NULL keys only: countDistinct
            # skips rows with any null column, so the minuend must
            # too — otherwise a single null-keyed row reads as a
            # duplicate (null-key presence is not_null's job)
            nn = F.col(c.cols[0]).isNotNull()
            for x in c.cols[1:]:
                nn = nn & F.col(x).isNotNull()
            expr = (F.count(F.when(nn, 1))
                    - F.countDistinct(*[F.col(x) for x in c.cols]))
        elif c.kind == "fk":
            continue  # separate anti-join below
        else:
            expr = F.sum(F.when(_violation(c), 1).otherwise(0))
        aggs.append(expr.cast("long").alias(c.name))
        names.append(c.name)

    if names:
        row = df.agg(*aggs)
        pairs = F.array(*[F.struct(F.lit(n).alias("constraint"),
                                   F.col(n).alias("n_violations"))
                          for n in names])
        report = (row.select(F.explode(pairs).alias("x")).select("x.*"))
    else:
        # fk-only audits: F.array() of zero structs can't star-expand,
        # so seed an empty report with the right schema instead
        report = df.sparkSession.createDataFrame(
            [], "constraint string, n_violations long")

    for c in constraints:
        if c.kind != "fk":
            continue
        dim, dim_col = c.params["dim"], c.params["dim_col"]
        orphans = (df.filter(F.col(c.cols[0]).isNotNull())
                   .join(F.broadcast(dim.select(
                       F.col(dim_col).alias(c.cols[0])).distinct()),
                       c.cols[0], "left_anti")
                   .agg(F.count(F.lit(1)).cast("long")
                        .alias("n_violations"))
                   .select(F.lit(c.name).alias("constraint"),
                           "n_violations"))
        report = report.unionAll(orphans)

    return report.withColumn("passed", F.col("n_violations") == 0)
