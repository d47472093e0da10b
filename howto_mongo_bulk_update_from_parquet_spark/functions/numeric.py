"""Oracle-stable numeric aggregation helpers.

Summing doubles is order-dependent: Spark's partial aggregation and
DuckDB's vectorized sum visit rows in different orders, so raw
``SUM(double)`` differs across engines in the last ulps — enough to
break a value-hash comparison. The fix: cast each value to DECIMAL
first (the double→decimal rounding is value-deterministic and identical
in both engines — exact decimal midpoints are not representable as
binary doubles, so round-to-nearest never ties), sum exactly in
decimal, and cast the final result back to DOUBLE (IEEE round-to-
nearest of an identical exact value → identical bits).

This costs one decimal conversion per row — negligible next to the
scan — and keeps the whole aggregation inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    """Exact, engine-portable sum of a double column → double."""
    return F.sum(dec(col, precision, scale)).cast("double")


def davg(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    """Exact-sum / count average → double (same bits as the oracle's
    ``CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE) / COUNT(x)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, precision, scale)).cast("double") / F.count(c)


def oracle_dsum(expr: str, precision: int = 18, scale: int = 6) -> str:
    """The DuckDB-side SQL text matching `dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, precision: int = 18, scale: int = 6) -> str:
    return f"{oracle_dsum(expr, precision, scale)} / COUNT({expr})"
