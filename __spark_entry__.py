"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``howto_mongo_bulk_update_from_parquet_spark/``; the
query/oracle inventory is the plans catalog.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import howto_mongo_bulk_update_from_parquet_spark as _pkg
from howto_mongo_bulk_update_from_parquet_spark.plans import all_oracles, all_queries
from howto_mongo_bulk_update_from_parquet_spark.session import tune_session

_SHIPPED_SESSIONS: set[int] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the engine package to Python workers via addPyFile.

    The driver process imports this module through sys.path, but the
    Arrow-kernel queries (mapInPandas / mapInArrow / applyInPandas)
    pickle their closures BY REFERENCE to package modules — a Python
    worker spawned by a session whose PYTHONPATH doesn't include the
    repo (e.g. a harness running from another cwd) would die with
    ModuleNotFoundError. A zip of the package on the context's
    pyFiles path makes the contract self-contained. Once per
    SparkContext; no-op cost afterward."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(_pkg.__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"spark_graft_pkg_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    arc = os.path.join(pkg_name,
                                       os.path.relpath(full, pkg_dir))
                    zf.write(full, arc)
    sc.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    tune_session(spark)
    _ensure_workers_can_import(spark)
    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2; each
    callable first makes the package importable on this session's
    Python workers (see _ensure_workers_can_import)."""

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers_can_import(spark)
            return fn(spark, sf_dir)
        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omissions = rows-only checks."""
    return all_oracles()
