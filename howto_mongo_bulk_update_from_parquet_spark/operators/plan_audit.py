"""Mechanical plan-hazard audit — the scale-review checklist this repo
runs over every catalog query (tests/test_plans.py), productized so a
user can point it at THEIR query before shipping it to a cluster.

Four hazard classes, each a pattern that works at test scale and
falls over at 100 TB:

- ``unpartitioned window``: every row lands in ONE WindowExec
  partition — a global sort on a single reducer.
- ``tiny-key window``: a window partitioned SOLELY by pinned
  tiny-cardinality columns with no cardinality bound (Aggregate /
  Join / GlobalLimit) beneath it — a full-table sort on a handful of
  reducers (the q_outlier_trim hazard).
- ``cartesian product``: O(n·m) row explosion.
- ``row-at-a-time python``: BatchEvalPython[UDTF] — per-row
  serialization instead of Arrow batches.

The detectors mirror the pinned test-suite sweeps exactly; the test
suite imports from here so the CLI and CI can't drift apart.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Fixture columns with pinned tiny cardinality; callers auditing their
# own tables pass their own list.
DEFAULT_TINY_KEYS = ("l_returnflag", "l_linestatus", "o_orderpriority",
                     "o_orderstatus", "event_type", "lang")

# Catalog queries whose SEMANTICS inherently need a per-tiny-group
# total order (greedy packing cumsum, ntile, per-status rank demos,
# the documented rank-exact oracle twin). Each docstring states the
# group-cardinality assumption; the CLI reports these as "documented"
# instead of failing, and the test sweep pins this map EXACTLY — a
# new tiny-key window can't ship without either a fix or an explicit
# entry here plus a docstring.
DOCUMENTED_TINY_WINDOWS: dict[str, list[str]] = {
    "q_doc_packing": ["lang"],
    "q_ntile_buckets": ["o_orderpriority"],
    "q_outlier_trim": ["l_returnflag", "l_returnflag"],
    "q_stratified_sample": ["lang"],
    "q_window_rank_dist": ["o_orderstatus"],
    "q_window_topk": ["o_orderpriority"],
}

# windowspecdefinition's first argument is a frame spec or ASC/DESC
# ordering ONLY when there are no partition expressions
_UNPARTITIONED = re.compile(
    r"windowspecdefinition\((specifiedwindowframe|\S+ (ASC|DESC) NULLS)")


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def tiny_key_window_hazards(df: DataFrame,
                            tiny_cols=DEFAULT_TINY_KEYS) -> list[str]:
    """Partition-key lists (comma-joined) of Window nodes in the
    optimized plan whose keys are ALL tiny-cardinality and whose
    subtree holds no cardinality bound."""
    out = []
    for n in _walk(df._jdf.queryExecution().optimizedPlan()):
        if n.getClass().getSimpleName() != "Window":
            continue
        ps = n.partitionSpec()
        cols = [ps.apply(i).toString().split("#")[0]
                for i in range(ps.size())]
        if not cols or not all(c in tiny_cols for c in cols):
            continue
        bounded = any(
            sub.getClass().getSimpleName() in ("Aggregate", "Join",
                                               "GlobalLimit")
            for i in range(n.children().size())
            for sub in _walk(n.children().apply(i)))
        if not bounded:
            out.append(",".join(cols))
    return out


def non_arrow_datasource_readers() -> list[str]:
    """Batch Python DataSource readers in this package whose ``read``
    lacks an Arrow-batch path (no ``RecordBatch`` yield) — the hazard
    the plan sweeps above CANNOT see: a per-row Python parse loop
    lives BELOW its BatchScan node, where no plan string shows it
    (the r7 q_fixedwidth_ingest regression). Returns class names;
    empty list = clean. Static by design: it audits code, not a
    running plan, so `plan-audit` flags a non-Arrow reader before any
    query is built on it."""
    import ast
    import importlib
    import inspect
    import pkgutil
    import textwrap

    from pyspark.sql.datasource import DataSourceReader

    from .. import sources as sources_pkg

    def _mentions_recordbatch_in_code(fn) -> bool:
        # AST walk, not substring: a docstring or comment saying
        # "RecordBatch" must not satisfy the detector (that is exactly
        # how the guarded regression would sneak back in). Only a
        # Name/Attribute node — actual code — counts.
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute) and node.attr == "RecordBatch":
                return True
            if isinstance(node, ast.Name) and node.id == "RecordBatch":
                return True
        return False

    out = []
    for m in pkgutil.iter_modules(sources_pkg.__path__):
        mod = importlib.import_module(f"{sources_pkg.__name__}.{m.name}")
        for _, cls in inspect.getmembers(mod, inspect.isclass):
            if (issubclass(cls, DataSourceReader)
                    and cls is not DataSourceReader
                    and cls.__module__ == mod.__name__
                    and not _mentions_recordbatch_in_code(cls.read)):
                out.append(cls.__name__)
    return sorted(out)


def plan_hazards(df: DataFrame,
                 tiny_cols=DEFAULT_TINY_KEYS) -> list[str]:
    """All four hazard classes for one DataFrame's plan, as
    human-readable strings (empty list = clean)."""
    probs = []
    qe = df._jdf.queryExecution()
    opt = qe.optimizedPlan().toString()
    phys = qe.executedPlan().toString()
    if _UNPARTITIONED.search(opt):
        probs.append("unpartitioned window (global sort on one reducer)")
    for keys in tiny_key_window_hazards(df, tiny_cols):
        probs.append(f"tiny-key window partitioned by ({keys}) with no "
                     "cardinality bound below it")
    if "CartesianProduct" in phys:
        probs.append("cartesian product")
    if "BatchEvalPython" in phys:
        probs.append("row-at-a-time python evaluation (use Arrow forms)")
    return probs
