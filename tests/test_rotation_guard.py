"""FORCE_REATTEST staleness guard (r9 verdict item 6): the one human
judgment in the otherwise-mechanical attestation rotation is the list
of queries whose implementation changed this round. This test derives
that set MECHANICALLY — every catalog query whose package-internal
import closure touches a file changed since the round started (the
last `round N: verdict` commit, plus the working tree) must be either
never-attested (it holds a head slot anyway) or force-listed.
Forgetting to update `rotation.FORCE_REATTEST` now fails the suite
instead of silently skipping a re-attestation."""

import ast
import os
import subprocess

import pytest

PKG = "howto_mongo_bulk_update_from_parquet_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG_DIR = os.path.join(REPO, PKG)


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                          text=True, check=True).stdout


def _round_base_commit() -> str | None:
    """The commit the current round started from: the most recent
    `round N: verdict/...` snapshot the driver committed."""
    out = _git("log", "--format=%H %s")
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith("round ") and "verdict" in subject:
            return sha
    return None


def _changed_modules(base: str) -> set[str]:
    """Package modules changed since the round started (committed diff
    plus the working tree)."""
    files = set(_git("diff", "--name-only", base, "HEAD").splitlines())
    for line in _git("status", "--porcelain").splitlines():
        files.add(line[3:].split(" -> ")[-1].strip())
    return {f[:-3].replace("/", ".") for f in files
            if f.startswith(PKG + "/") and f.endswith(".py")}


def _module_file(modname: str) -> str | None:
    rel = modname.replace(".", "/")
    for cand in (os.path.join(REPO, rel + ".py"),
                 os.path.join(REPO, rel, "__init__.py")):
        if os.path.exists(cand):
            return cand
    return None


def _package_imports(modname: str) -> set[str]:
    """Package-internal modules `modname` imports (one level)."""
    path = _module_file(modname)
    if path is None:
        return set()
    tree = ast.parse(open(path, encoding="utf-8").read())
    pkg_parts = modname.split(".")[:-1]
    if path.endswith("__init__.py"):
        pkg_parts = modname.split(".")
    deps: set[str] = set()

    def _add(candidate: str, names: list[str]) -> None:
        if not candidate.startswith(PKG):
            return
        if _module_file(candidate):
            deps.add(candidate)
        for n in names:
            sub = f"{candidate}.{n}" if candidate else n
            if _module_file(sub):
                deps.add(sub)

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    _add(a.name, [])
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                base = pkg_parts[:len(pkg_parts) - node.level + 1]
                mod = ".".join(base + (node.module or "").split("."))
                mod = mod.rstrip(".")
            else:
                mod = node.module or ""
            _add(mod, [a.name for a in node.names])
    return deps


def _closure(modname: str, cache: dict[str, set[str]]) -> set[str]:
    seen: set[str] = set()
    todo = [modname]
    while todo:
        m = todo.pop()
        if m in seen:
            continue
        seen.add(m)
        if m == f"{PKG}.plans.catalog":
            # the registry imports EVERY query module as a
            # registration side effect — traversing through it would
            # connect each query to all others and flag the whole
            # catalog on any single-module change
            continue
        if m not in cache:
            cache[m] = _package_imports(m)
        todo.extend(cache[m] - seen)
    return seen


def test_changed_queries_are_force_listed_or_never_attested():
    from howto_mongo_bulk_update_from_parquet_spark.plans.catalog import (
        CATALOG, _load, all_oracles)
    from howto_mongo_bulk_update_from_parquet_spark.plans.rotation import (
        FORCE_REATTEST, ROWS_ONLY, last_green_by_query)

    base = _round_base_commit()
    if base is None:
        pytest.skip("no round-marker commit in history")
    changed = _changed_modules(base)
    # the registry/rotation machinery itself orders the catalog but
    # cannot change any query's RESULT — without this carve-out,
    # editing FORCE_REATTEST (which this guard demands) would flag
    # every query in the catalog
    changed -= {f"{PKG}.plans.catalog", f"{PKG}.plans.rotation"}
    if not changed:
        return                                   # nothing changed yet
    _load()
    last_green = last_green_by_query(REPO)
    cache: dict[str, set[str]] = {}
    oracles = all_oracles()
    stale = []
    for name, q in CATALOG.items():
        if name in ROWS_ONLY or name not in oracles:
            continue                             # rows-only: no head slot
        if name not in last_green or name in FORCE_REATTEST:
            continue                             # will (re-)attest anyway
        if _closure(q.fn.__module__, cache) & changed:
            stale.append(name)
    assert stale == [], (
        f"implementation changed this round but neither never-attested "
        f"nor in rotation.FORCE_REATTEST: {sorted(stale)} — add them to "
        f"FORCE_REATTEST (plans/rotation.py) so they re-attest")


def test_attested_through_matches_committed_artifacts():
    """ATTESTED_THROUGH pins which CORRECTNESS rounds the rotation
    derives from (ADVICE r9: uncommitted artifacts must not shift the
    head). The pin is itself a per-round manual constant — this guard
    makes forgetting the bump fail the suite: it must equal the
    highest round whose artifact is COMMITTED (git-tracked), which is
    exactly the set a fresh checkout would see."""
    from howto_mongo_bulk_update_from_parquet_spark.plans.rotation import (
        ATTESTED_THROUGH)
    tracked = _git("ls-files", "CORRECTNESS_r*.json").split()
    rounds = [int(f.split("_r")[1].split(".")[0]) for f in tracked]
    assert rounds, "no committed CORRECTNESS artifacts tracked by git"
    assert ATTESTED_THROUGH == max(rounds), (
        f"rotation.ATTESTED_THROUGH={ATTESTED_THROUGH} but the newest "
        f"COMMITTED artifact is round {max(rounds)} — bump the constant "
        f"(and review FORCE_REATTEST) now that the round's artifacts "
        f"are committed")
