"""MERGE INTO-shaped SQL write path for the keyed table (r15,
verdict item 6).

`register_sql_view` (r14) made the keyed table READABLE from pure
SQL; a dashboard migrating its WRITES still had to drop to the
Python API. `sql_merge` closes that: a constrained `MERGE INTO`
statement — the lingua franca of upsert SQL (Delta Lake, Iceberg,
ANSI SQL:2003 MERGE) — executes against the keyed table with the
engine's exact null-skip upsert semantics, through the SAME delta
append every Python writer uses (one tombstone-or-upsert delta
commit, CAS manifest flip, CHECK constraints and schema mode
enforced by `append_delta` underneath).

Reference parity: the reference's update pipeline builds per-key
upsert statements with null-skip payloads
(reference `src/howto_mongo_bulk_update_from_parquet/pipeline.py` —
its UpdateOne construction skips None fields); `MERGE ... WHEN
MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` is that
same operation as SQL text.

Supported grammar (case-insensitive keywords, one statement):

    MERGE INTO <target> [AS] [<t_alias>]
    USING (<any SELECT>) | <view_name> [AS] [<s_alias>]
    ON <a>.<col> = <b>.<col>          -- target side must be the key
    [ WHEN MATCHED [AND <cond>] THEN UPDATE SET *
    | WHEN MATCHED [AND <cond>] THEN UPDATE SET c = <expr>, ...
    | WHEN MATCHED [AND <cond>] THEN DELETE ]...
    [ WHEN NOT MATCHED THEN INSERT * ]
    [ WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE
    | WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ... ]...

Multiple WHEN MATCHED clauses evaluate FIRST-MATCH-WINS in statement
order (ANSI MERGE / Delta Lake semantics); conditions may reference
both aliases (`AND t.qty < s.qty`); an unconditional matched clause
must come last (later clauses would be unreachable — refused).
`WHEN NOT MATCHED BY SOURCE` (Delta's full-sync extension) acts on
TARGET rows the source lacks — delete them (replication sync) or
update them with target-side expressions (mark stale); this side
anti-joins the target against the source key set, O(target scan) by
definition (every row must prove its absence), source side broadcast
when small. The three clause groups are independent (ANSI).

Semantics, mapped to the engine:

- `UPDATE SET *` + `INSERT *` → one upsert delta of every source
  row (the engine's null-skip merge IS this statement).
- `UPDATE SET <subset>` → matched rows contribute ONLY the assigned
  columns; every unassigned payload column rides as NULL and the
  null-skip merge preserves its current value — exactly the
  reference's partial-update construction. Assignment expressions
  may reference BOTH aliases (`SET qty = t.qty + s.qty`): the
  source is LEFT-joined to the table's merged snapshot once,
  O(source) rows, broadcast/fast-merge machinery underneath.
- `INSERT *` alone → only not-matched rows land (anti-join
  semantics); `UPDATE` alone → only matched rows land.
- `WHEN MATCHED THEN DELETE` → a tombstone delta of the matched
  keys (`append_delete_delta`), never a base rewrite.

Constraints (loud errors, never silent drift): the ON condition is
a single key equality; `INSERT` takes only `*` (the null-skip union
makes column-list inserts redundant — project the source instead);
`SET col = NULL` cannot express "overwrite with null" because the
engine's merge is null-skip BY DESIGN (use `delete` + re-insert,
same as the reference); a source column the target lacks refuses
the statement (MERGE never evolves the schema silently).

Scale: one pass — parse (driver-side string work), one left join of
source against the merged snapshot (fast-merge pruned, broadcast
where small), one delta append O(source rows). Nothing driver-side
scales with data.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .keyed_table import (append_delete_delta, append_delta,
                          read_merged, table_schema)


class MergeSyntaxError(ValueError):
    """The statement is outside the supported MERGE grammar (the
    message names the failing clause and the accepted form)."""


_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[A-Za-z_][\w.]*)"
    r"(?:\s+AS)?(?:\s+(?P<talias>[A-Za-z_]\w*))?"
    r"\s+USING\s+(?:\((?P<subquery>.+?)\)|(?P<srcname>[A-Za-z_][\w.]*))"
    r"(?:\s+AS)?(?:\s+(?P<salias>[A-Za-z_]\w*))?"
    r"\s+ON\s+(?P<on>.+?)"
    r"(?P<clauses>\s+WHEN\s+.+)$",
    re.IGNORECASE | re.DOTALL)

_ON_RE = re.compile(
    r"^\s*(?P<l>[A-Za-z_]\w*)\.(?P<lc>[A-Za-z_]\w*)\s*=\s*"
    r"(?P<r>[A-Za-z_]\w*)\.(?P<rc>[A-Za-z_]\w*)\s*$")

_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?P<bysrc>\s+BY\s+SOURCE)?"
    r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.+?|DELETE|INSERT\s+.+?)"
    r"(?=\s+WHEN\s+(?:NOT\s+)?MATCHED|\s*$)",
    re.IGNORECASE | re.DOTALL)


def _split_assignments(set_text: str) -> list[tuple[str, str]]:
    """Split `a = expr, b = expr` on TOP-LEVEL commas (expressions
    may carry commas inside parens: `SET v = greatest(a, b)`)."""
    parts, depth, cur = [], 0, []
    for ch in set_text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = []
    for p in parts:
        if "=" not in p:
            raise MergeSyntaxError(
                f"UPDATE SET assignment {p.strip()!r} is not of the "
                f"form col = <expr>")
        col, _, rhs = p.partition("=")
        col = col.strip()
        # tolerate a target-alias qualifier on the LHS (t.col = ...)
        if "." in col:
            col = col.split(".", 1)[1]
        out.append((col, rhs.strip()))
    return out


def parse_merge(text: str) -> dict:
    """Parse the constrained MERGE grammar into
    {target, talias, source_sql|source_name, salias, on: (l, lc, r,
    rc), matched: [(cond|None, ('update', '*'|[(col, expr)...]) |
    ('delete', None)), ... in statement order], insert: bool}.
    Raises `MergeSyntaxError` outside the grammar. Standard MERGE
    clause semantics: matched clauses evaluate FIRST-MATCH-WINS in
    statement order, so an UNCONDITIONAL matched clause must be the
    last one (anything after it is unreachable — refused)."""
    m = _MERGE_RE.match(text.strip().rstrip(";"))
    if not m:
        raise MergeSyntaxError(
            "statement is not of the form MERGE INTO <t> USING "
            "<src|(<select>)> ON <a>.<k> = <b>.<k> WHEN ... — see "
            "sql_merge's supported grammar")
    on = _ON_RE.match(m.group("on"))
    if not on:
        raise MergeSyntaxError(
            f"ON condition {m.group('on').strip()!r} must be a single "
            f"alias-qualified key equality: <a>.<key> = <b>.<key>")
    spec = {"target": m.group("target"),
            "talias": m.group("talias") or m.group("target"),
            "source_sql": m.group("subquery"),
            "source_name": m.group("srcname"),
            "salias": m.group("salias") or m.group("srcname") or "src",
            "on": (on.group("l"), on.group("lc"),
                   on.group("r"), on.group("rc")),
            "matched": [], "by_source": [], "insert": False}
    clauses = _WHEN_RE.findall(m.group("clauses"))
    if not clauses:
        raise MergeSyntaxError("no WHEN [NOT] MATCHED clause found")

    def _parse_action(a, au, where):
        if au == "DELETE":
            return ("delete", None)
        if au.startswith("UPDATE"):
            set_text = re.sub(r"^UPDATE\s+SET\s+", "", a,
                              flags=re.IGNORECASE | re.DOTALL)
            return ("update", "*" if set_text.strip() == "*"
                    else _split_assignments(set_text))
        raise MergeSyntaxError(f"unsupported {where} action {a!r} "
                               f"(UPDATE SET ... or DELETE)")

    for is_not, bysrc, cond, action in clauses:
        a = action.strip()
        au = a.upper()
        cond = cond.strip() or None if cond else None
        if is_not and bysrc:
            # NOT MATCHED BY SOURCE: target rows the source lacks
            if spec["by_source"] and spec["by_source"][-1][0] is None:
                raise MergeSyntaxError(
                    "a WHEN NOT MATCHED BY SOURCE clause after an "
                    "unconditional one is unreachable")
            act = _parse_action(a, au, "WHEN NOT MATCHED BY SOURCE")
            if act[1] == "*":
                raise MergeSyntaxError(
                    "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET * is "
                    "meaningless (there is no source row to copy) — "
                    "assign explicit target-side expressions")
            spec["by_source"].append((cond, act))
            continue
        if bysrc:
            raise MergeSyntaxError(
                "WHEN MATCHED BY SOURCE is not a MERGE clause — use "
                "WHEN MATCHED or WHEN NOT MATCHED BY SOURCE")
        if is_not:
            if cond:
                raise MergeSyntaxError(
                    "WHEN NOT MATCHED AND <cond> is not supported — "
                    "filter the source subquery instead")
            if au != "INSERT *":
                raise MergeSyntaxError(
                    f"WHEN NOT MATCHED supports only INSERT * (got "
                    f"{a!r}); project the source subquery instead of "
                    f"a column-list insert")
            spec["insert"] = True
            continue
        if (spec["matched"] and spec["matched"][-1][0] is None):
            raise MergeSyntaxError(
                "a WHEN MATCHED clause after an unconditional one is "
                "unreachable (clauses evaluate first-match-wins in "
                "statement order)")
        spec["matched"].append((cond, _parse_action(a, au,
                                                    "WHEN MATCHED")))
    if (not spec["matched"] and not spec["insert"]
            and not spec["by_source"]):
        raise MergeSyntaxError("statement performs no action")
    return spec


def sql_merge(spark: SparkSession, text: str, *,
              tables: dict[str, tuple[str, str]]) -> dict:
    """Execute a constrained MERGE statement against a keyed table.

    `tables` maps SQL target names to (table_path, key) — the same
    registration the CLI's `--keyed NAME=PATH:KEY` flag builds, so
    one flag powers reads (`register_sql_view`) and writes. Returns
    {action, n_source, n_matched, n_inserted|n_deleted, delta_version}.
    """
    spec = parse_merge(text)
    if spec["target"] not in tables:
        raise MergeSyntaxError(
            f"MERGE target {spec['target']!r} is not a registered "
            f"keyed table (known: {sorted(tables)}); register it "
            f"with --keyed NAME=PATH:KEY")
    path, key = tables[spec["target"]]
    ta, sa = spec["talias"], spec["salias"]
    on_l, on_lc, on_r, on_rc = spec["on"]
    if {on_l, on_r} != {ta, sa}:
        raise MergeSyntaxError(
            f"ON condition references {on_l!r}/{on_r!r}; expected the "
            f"target alias {ta!r} and the source alias {sa!r}")
    t_keycol = on_lc if on_l == ta else on_rc
    s_keycol = on_rc if on_l == ta else on_lc
    if t_keycol != key:
        raise MergeSyntaxError(
            f"ON condition's target column {t_keycol!r} is not the "
            f"table's merge key {key!r} — the keyed table merges on "
            f"its key only")

    src = (spark.sql(spec["source_sql"]) if spec["source_sql"]
           else spark.table(spec["source_name"]))
    tgt = read_merged(spark, path, key)
    tgt_fields = {f.name: f.dataType for f in table_schema(spark, path)}
    src_fields = {f.name: f.dataType for f in src.schema.fields}
    has_star = any(act == "update" and sets == "*"
                   for _, (act, sets) in spec["matched"])
    if has_star or spec["insert"]:
        extra = sorted(c for c in src_fields
                       if c != s_keycol and c not in tgt_fields)
        if extra:
            # silent drop would be the worst outcome: the statement
            # "succeeds" and the columns never land. Schema evolution
            # stays an explicit table operation (upsert/append with
            # merge mode), not a MERGE side effect.
            raise MergeSyntaxError(
                f"source column(s) {extra} do not exist on the target "
                f"table (columns: {sorted(tgt_fields)}) — MERGE does "
                f"not evolve the schema; project them away or evolve "
                f"the table first (append_delta/upsert with "
                f"schema_mode='merge')")

    # ONE left join enriches every source row with its current match
    # (NULL target key = not matched). Assignment expressions resolve
    # against both aliases; the fast-merge/broadcast machinery under
    # read_merged keeps the probe O(source) where the table is zoned.
    # The match predicate stays an expression (no withColumn — a
    # projection between the aliased join and the branch selects
    # would break qualified `t.col` resolution).
    joined = (src.alias(sa)
              .join(tgt.alias(ta),
                    F.col(f"{sa}.{s_keycol}") == F.col(f"{ta}.{key}"),
                    "left"))
    matched_col = F.col(f"{ta}.{key}").isNotNull()

    # FIRST-MATCH-WINS clause reach: clause i fires on matched rows
    # whose condition holds (SQL three-valued: NULL = does not fire)
    # and no earlier clause fired. Conditions may reference both
    # aliases (e.g. AND t.qty < s.qty).
    def _cond_col(cond):
        return (F.coalesce(F.expr(cond), F.lit(False))
                if cond else F.lit(True))
    reach, taken = [], F.lit(False)
    for cond, _ in spec["matched"]:
        fire = matched_col & _cond_col(cond) & ~taken
        reach.append(fire)
        taken = taken | fire

    count_aggs = [F.count(F.lit(1)).alias("n"),
                  F.sum(matched_col.cast("long")).alias("m")]
    for i, r in enumerate(reach):
        count_aggs.append(F.sum(r.cast("long")).alias(f"r{i}"))
    counts = joined.agg(*count_aggs).first()
    n_source, n_matched = int(counts["n"]), int(counts["m"] or 0)
    n_reach = [int(counts[f"r{i}"] or 0) for i in range(len(reach))]

    n_updated = sum(n for n, (_, (act, _s)) in zip(n_reach,
                                                   spec["matched"])
                    if act == "update")
    n_deleted = sum(n for n, (_, (act, _s)) in zip(n_reach,
                                                   spec["matched"])
                    if act == "delete")
    out = {"action": "merge", "n_source": n_source,
           "n_matched": n_updated, "n_deleted": n_deleted,
           "n_inserted": (n_source - n_matched) if spec["insert"] else 0}

    # tombstones first, upserts second — the reach predicates are
    # mutually exclusive, so no key takes both actions (barring
    # duplicate source keys, which the upsert side's latest-per-key
    # normalization resolves exactly as the Python writer does)
    del_fires = [r for r, (_, (act, _s)) in zip(reach, spec["matched"])
                 if act == "delete"]
    if del_fires:
        pred = del_fires[0]
        for r in del_fires[1:]:
            pred = pred | r
        keys = (joined.filter(pred)
                .select(F.col(f"{sa}.{s_keycol}").alias(key)))
        out["delta_version"] = append_delete_delta(spark, keys,
                                                   path=path, key=key)

    branches = []
    for r, (_, (act, sets)) in zip(reach, spec["matched"]):
        if act == "update":
            branches.append(_branch_rows(joined, r, sets, sa, key,
                                         s_keycol, tgt_fields,
                                         src_fields))
    if spec["insert"]:
        branches.append(_branch_rows(joined, ~matched_col, "*", sa,
                                     key, s_keycol, tgt_fields,
                                     src_fields))

    if spec["by_source"]:
        # NOT MATCHED BY SOURCE: target rows the source lacks — the
        # full-sync half of MERGE (Delta's bySource extension). This
        # side anti-joins the TARGET against the source key set:
        # O(table scan) by definition (every target row must prove
        # its absence), with the source side broadcast when small.
        # Conditions and UPDATE expressions resolve over the target
        # alias only (there is no source row); first-match-wins
        # within the by-source group, independent of the matched
        # group (ANSI treats the clause groups separately).
        tgt_only = (tgt.alias(ta)
                    .join(src.alias(sa).select(
                              F.col(f"{sa}.{s_keycol}").alias(key)),
                          key, "left_anti"))
        bs_reach, bs_taken = [], F.lit(False)
        for cond, _ in spec["by_source"]:
            fire = _cond_col(cond) & ~bs_taken
            bs_reach.append(fire)
            bs_taken = bs_taken | fire
        bs_aggs = [F.sum(r.cast("long")).alias(f"b{i}")
                   for i, r in enumerate(bs_reach)]
        bs_counts = tgt_only.agg(*bs_aggs).first()
        n_bs = [int(bs_counts[f"b{i}"] or 0)
                for i in range(len(bs_reach))]
        out["n_deleted"] += sum(
            n for n, (_, (act, _s)) in zip(n_bs, spec["by_source"])
            if act == "delete")
        out["n_matched"] += sum(
            n for n, (_, (act, _s)) in zip(n_bs, spec["by_source"])
            if act == "update")
        bs_del = [r for r, (_, (act, _s)) in zip(bs_reach,
                                                 spec["by_source"])
                  if act == "delete"]
        if bs_del:
            pred = bs_del[0]
            for r in bs_del[1:]:
                pred = pred | r
            out["delta_version"] = append_delete_delta(
                spark, tgt_only.filter(pred).select(key),
                path=path, key=key)
        for r, (_, (act, sets)) in zip(bs_reach, spec["by_source"]):
            if act == "update":
                branches.append(_target_branch_rows(
                    tgt_only, r, sets, key, tgt_fields))

    if branches:
        delta_src = branches[0]
        for b in branches[1:]:
            delta_src = delta_src.unionByName(b)
        out["delta_version"] = append_delta(spark, delta_src,
                                            path=path, key=key)
    return out


def _target_branch_rows(tgt_only: DataFrame, fire_col, sets,
                        key: str, tgt_fields: dict) -> DataFrame:
    """A NOT MATCHED BY SOURCE update branch's contribution: assigned
    columns evaluate over the TARGET row (no source exists), every
    other payload column rides as a typed NULL for the null-skip
    merge to preserve."""
    assigned = {c: rhs for c, rhs in sets}
    unknown = [c for c in assigned if c not in tgt_fields]
    if unknown:
        raise MergeSyntaxError(
            f"UPDATE SET assigns unknown column(s) {unknown} "
            f"(table columns: {sorted(tgt_fields)})")
    cols = [F.col(key).cast(tgt_fields[key]).alias(key)]
    for c, dt in tgt_fields.items():
        if c == key:
            continue
        if c in assigned:
            cols.append(F.expr(assigned[c]).cast(dt).alias(c))
        else:
            cols.append(F.lit(None).cast(dt).alias(c))
    return tgt_only.filter(fire_col).select(*cols)


def _branch_rows(joined: DataFrame, fire_col, sets, sa: str,
                 key: str, s_keycol: str, tgt_fields: dict,
                 src_fields: dict) -> DataFrame:
    """One WHEN branch's contribution to the upsert delta, shaped to
    the TARGET's columns: assigned/inserted columns carry values,
    every other payload column rides as a typed NULL — the engine's
    null-skip merge then preserves the current value for matched
    rows (and stores NULL for genuinely new ones), exactly the
    reference's partial-payload construction."""
    rows = joined.filter(fire_col)
    if sets != "*":
        assigned = {c: rhs for c, rhs in sets}
        unknown = [c for c in assigned if c not in tgt_fields]
        if unknown:
            raise MergeSyntaxError(
                f"UPDATE SET assigns unknown column(s) {unknown} "
                f"(table columns: {sorted(tgt_fields)})")
    else:
        # SET * / INSERT *: every source column maps by name
        assigned = {c: f"{sa}.{c}" for c in src_fields
                    if c != s_keycol and c in tgt_fields}
    cols = [F.col(f"{sa}.{s_keycol}").cast(tgt_fields[key]).alias(key)]
    for c, dt in tgt_fields.items():
        if c == key:
            continue
        if c in assigned:
            cols.append(F.expr(assigned[c]).cast(dt).alias(c))
        else:
            cols.append(F.lit(None).cast(dt).alias(c))
    return rows.select(*cols)
