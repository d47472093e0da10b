"""Range layout + zone-map data skipping for the keyed table.

Covers: per-file min/max map written with a range-clustered base and
retired with it; point/range lookups touching only the admissible
files with results identical to the unpruned merged view; pending
deltas and tombstones honored through a pruned lookup; layout
inheritance and switching; bucket pruning on hash-layout tables
(including the pmod(hash)=file-suffix contract the pruner relies on).
"""

import re

import pytest
from pyspark.sql import Row, functions as F

from howto_mongo_bulk_update_from_parquet_spark.sinks import fs as hfs
from howto_mongo_bulk_update_from_parquet_spark.sinks import zonemap as zm
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
    append_delete_delta, append_delta, compact, current_base_version,
    lookup_keyed_table, pruned_base_files, read_keyed_table, read_merged,
    table_meta, upsert_into_keyed_table)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("val"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("tag"))


def _mk_range_table(spark, tmp_path, n=400, files=8):
    path = str(tmp_path / "ztab")
    upsert_into_keyed_table(spark, _docs(spark, n), path=path, key="k",
                            updated_at_col=None, range_files=files)
    return path


def test_zonemap_written_and_disjoint(spark, tmp_path):
    path = _mk_range_table(spark, tmp_path)
    v = current_base_version(spark, path)
    base = hfs.join(path, f"base_v{v:05d}")
    zmap = zm.read_zone_map(spark, base)
    assert zmap is not None and zmap["cols"] == {"k": "bigint"}
    assert len(zmap["files"]) == 8
    assert sum(e["rows"] for e in zmap["files"]) == 400
    # range layout: files hold DISJOINT key ranges
    spans = sorted((e["min_k"], e["max_k"]) for e in zmap["files"])
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2
    meta = table_meta(spark, path)
    assert meta["range_key"] == "k" and meta["range_files"] == "8"


def test_point_lookup_prunes_to_one_file(spark, tmp_path):
    path = _mk_range_table(spark, tmp_path)
    out, stats = lookup_keyed_table(spark, path, "k", values=[123],
                                    with_stats=True)
    assert stats["files_total"] == 8 and stats["files_read"] == 1
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["val"] == 369


def test_range_lookup_matches_full_scan(spark, tmp_path):
    path = _mk_range_table(spark, tmp_path)
    out, stats = lookup_keyed_table(spark, path, "k", lo=90, hi=160,
                                    with_stats=True)
    assert 0 < stats["files_read"] < stats["files_total"]
    expect = (read_keyed_table(spark, path)
              .filter(F.col("k").between(90, 160)))
    assert sorted(out.collect()) == sorted(expect.collect())


def test_open_ended_range(spark, tmp_path):
    path = _mk_range_table(spark, tmp_path)
    out, stats = lookup_keyed_table(spark, path, "k", lo=350,
                                    with_stats=True)
    # range boundaries come from sampling — the tail may straddle two
    # files, never more
    assert stats["files_read"] <= 2
    assert out.count() == 50


def test_lookup_sees_pending_delta_and_tombstone(spark, tmp_path):
    path = _mk_range_table(spark, tmp_path)
    # delta updates k=10 (val -> 999, tag null-skipped) and inserts a
    # brand-new key OUTSIDE every file's range
    append_delta(spark, spark.createDataFrame(
        [Row(k=10, val=999, tag=None), Row(k=10_000, val=1, tag="new")]),
        path=path, key="k")
    append_delete_delta(spark, spark.createDataFrame([Row(k=11)]),
                        path=path, key="k")
    out = {r["k"]: r for r in lookup_keyed_table(
        spark, path, "k", values=[10, 11, 10_000]).collect()}
    assert out[10]["val"] == 999 and out[10]["tag"] == "s3"  # null-skip
    assert 11 not in out                                     # tombstoned
    assert out[10_000]["val"] == 1                           # delta-only key
    # the pruned view agrees with the unpruned merged view
    expect = (read_merged(spark, path, "k")
              .filter(F.col("k").isin([10, 11, 10_000])))
    got = lookup_keyed_table(spark, path, "k", values=[10, 11, 10_000])
    assert sorted(got.collect()) == sorted(expect.collect())


def test_all_files_pruned_but_delta_hit(spark, tmp_path):
    path = _mk_range_table(spark, tmp_path)
    append_delta(spark, spark.createDataFrame(
        [Row(k=99_999, val=7, tag="d")]), path=path, key="k")
    out, stats = lookup_keyed_table(spark, path, "k", values=[99_999],
                                    with_stats=True)
    assert stats["files_read"] == 0
    assert out.collect()[0]["val"] == 7


def test_layout_survives_compact_and_upsert_rounds(spark, tmp_path):
    path = _mk_range_table(spark, tmp_path)
    append_delta(spark, spark.createDataFrame(
        [(5, -1, None)], "k long, val long, tag string"),
        path=path, key="k")
    compact(spark, path, "k")
    # inherited: the folded base is re-range-clustered with a fresh map
    v = current_base_version(spark, path)
    assert zm.read_zone_map(
        spark, hfs.join(path, f"base_v{v:05d}")) is not None
    upsert_into_keyed_table(spark, spark.createDataFrame(
        [(5, -2, None)], "k long, val long, tag string"),
        path=path, key="k", updated_at_col=None)
    out, stats = lookup_keyed_table(spark, path, "k", values=[5],
                                    with_stats=True)
    assert stats["files_read"] == 1
    assert out.collect()[0]["val"] == -2


def test_layout_switch_and_conflict(spark, tmp_path):
    path = _mk_range_table(spark, tmp_path)
    with pytest.raises(ValueError, match="alternative base layouts"):
        upsert_into_keyed_table(spark, _docs(spark, 10), path=path,
                                key="k", updated_at_col=None,
                                buckets=4, range_files=4)
    # explicit buckets SWITCHES layout: range spec dropped
    upsert_into_keyed_table(spark, _docs(spark, 10), path=path, key="k",
                            updated_at_col=None, buckets=4)
    meta = table_meta(spark, path)
    assert meta.get("buckets") == "4" and "range_key" not in meta
    v = current_base_version(spark, path)
    assert zm.read_zone_map(spark, hfs.join(path, f"base_v{v:05d}")) is None


def test_bucket_pruning_on_hash_layout(spark, tmp_path):
    path = str(tmp_path / "btab")
    upsert_into_keyed_table(spark, _docs(spark, 400), path=path, key="k",
                            updated_at_col=None, buckets=8)
    v = current_base_version(spark, path)
    base = hfs.join(path, f"base_v{v:05d}")
    files = [f for f in hfs.listdir(spark, base)
             if not f.startswith("_") and not f.startswith(".")]
    # the contract the pruner rests on: every key in a file maps to
    # the file's _NNNNN suffix under pmod(hash(k), buckets)
    suffix = {f: int(re.search(r"_(\d{5})\.", f).group(1)) for f in files}
    placed = (spark.read.parquet(base)
              .select("k", F.col("_metadata.file_path").alias("p"),
                      F.pmod(F.hash("k"), F.lit(8)).alias("b")).collect())
    for r in placed:
        assert suffix[r["p"].rsplit("/", 1)[-1]] == r["b"]
    kept, total = pruned_base_files(spark, path, "k", values=[42, 77])
    assert 0 < len(kept) < total
    out = lookup_keyed_table(spark, path, "k", values=[42, 77])
    assert {r["k"]: r["val"] for r in out.collect()} == {42: 126, 77: 231}
    # range predicates never bucket-prune (hash scatters ranges)
    kept_r, total_r = pruned_base_files(spark, path, "k", lo=1, hi=2)
    assert len(kept_r) == total_r


def test_plain_layout_degrades_to_full_scan(spark, tmp_path):
    path = str(tmp_path / "ptab")
    upsert_into_keyed_table(spark, _docs(spark, 100), path=path, key="k",
                            updated_at_col=None, n_files=4)
    kept, total = pruned_base_files(spark, path, "k", values=[3])
    assert len(kept) == total == 4
    out = lookup_keyed_table(spark, path, "k", values=[3])
    assert out.collect()[0]["val"] == 9


def test_stats_cols_extra_column(spark, tmp_path):
    path = str(tmp_path / "stab")
    upsert_into_keyed_table(spark, _docs(spark, 200), path=path, key="k",
                            updated_at_col=None, range_files=4,
                            stats_cols=["val"])
    v = current_base_version(spark, path)
    zmap = zm.read_zone_map(spark, hfs.join(path, f"base_v{v:05d}"))
    assert set(zmap["cols"]) == {"k", "val"}
    # val = 3k is range-correlated too: pruning on the secondary column
    kept = zm.prune_files(zmap, "val", lo=0, hi=30)
    assert kept is not None and 0 < len(kept) < 4


def test_cli_range_layout_and_lookup(spark, tmp_path, capsys):
    """upsert --range-files + lookup end to end, with the files-read
    report proving the prune actually engaged."""
    from howto_mongo_bulk_update_from_parquet_spark.cli import main

    data = str(tmp_path / "src")
    table = str(tmp_path / "tab")
    assert main(["generate", "--path", data, "--n-rows", "300",
                 "--n-files", "2", "--seed", "3"]) == 0
    assert main(["upsert", "--path", data, "--table", table,
                 "--range-files", "4"]) == 0
    some = (read_keyed_table(spark, table).limit(1)
            .collect()[0]["_id"])
    assert main(["lookup", "--table", table, "--values", some]) == 0
    out = capsys.readouterr().out
    assert "read 1/4 base files" in out
    assert main(["upsert", "--path", data, "--table", table,
                 "--buckets", "2", "--range-files", "2"]) == 2


def test_cli_table_info(spark, tmp_path, capsys):
    import json

    from howto_mongo_bulk_update_from_parquet_spark.cli import main

    path = _mk_range_table(spark, tmp_path)
    append_delta(spark, spark.createDataFrame(
        [(5, -1, None)], "k long, val long, tag string"),
        path=path, key="k")
    assert main(["table-info", "--table", path]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["version"] == 1 and info["base_files"] == 8
    assert info["layout"].startswith("range (8 files on k")
    assert info["deltas_pending"] == [1]
    assert info["zonemap"]["rows"] == 400
    assert info["zonemap"]["spans"]["k"] == {"min": 0, "max": 399}
    assert info["claim_debris"] == []
    # debris becomes visible: an incomplete base claim + a complete
    # but never-published base (the two recover_dead_claims classes)
    import os
    os.makedirs(os.path.join(path, "base_v00007"))
    os.makedirs(os.path.join(path, "base_v00008"))
    with open(os.path.join(path, "base_v00008", "_SUCCESS"), "w"):
        pass
    assert main(["table-info", "--table", path]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["claim_debris"] == ["base_v00007", "base_v00008"]


def test_lookup_skips_nonintersecting_deltas(spark, tmp_path):
    """Pending deltas carry an O(1) key-range sidecar; a point lookup
    opens only the deltas whose range can hold a probe key — the LSM
    read-path twin of the base zone map."""
    path = _mk_range_table(spark, tmp_path)
    # three deltas in disjoint key neighborhoods (one a tombstone)
    append_delta(spark, spark.createDataFrame(
        [Row(k=10, val=-10, tag="a"), Row(k=12, val=-12, tag="a")]),
        path=path, key="k")
    append_delta(spark, spark.createDataFrame(
        [Row(k=350, val=-350, tag="b")]), path=path, key="k")
    append_delete_delta(spark, spark.createDataFrame([Row(k=200)]),
                        path=path, key="k")
    out, stats = lookup_keyed_table(spark, path, "k", values=[12],
                                    with_stats=True)
    assert stats["deltas_total"] == 3 and stats["deltas"] == 1
    assert out.collect()[0]["val"] == -12
    # the tombstone's delta IS opened when its key is probed
    out2, st2 = lookup_keyed_table(spark, path, "k", values=[200],
                                   with_stats=True)
    assert st2["deltas"] == 1 and out2.count() == 0
    # a range probe straddling two deltas opens exactly those two
    out3, st3 = lookup_keyed_table(spark, path, "k", lo=150, hi=360,
                                   with_stats=True)
    assert st3["deltas"] == 2
    rows = {r["k"]: r["val"] for r in out3.collect()}
    assert rows[350] == -350 and 200 not in rows and len(rows) == 210


def test_delta_without_sidecar_is_read(spark, tmp_path):
    """A delta whose sidecar is missing (older writer, failed stats
    job) is conservatively opened."""
    import os

    path = _mk_range_table(spark, tmp_path)
    append_delta(spark, spark.createDataFrame(
        [Row(k=10, val=-10, tag="a")]), path=path, key="k")
    os.remove(str(tmp_path / "ztab" / "delta_00001" / "_KEYRANGE.json"))
    out, stats = lookup_keyed_table(spark, path, "k", values=[399],
                                    with_stats=True)
    assert stats["deltas"] == stats["deltas_total"] == 1
    assert out.collect()[0]["val"] == 399 * 3


def test_scan_secondary_column_prunes(spark, tmp_path):
    """val = 3k is range-correlated with the key layout, so a scan on
    the SECONDARY stats column genuinely skips files."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        scan_keyed_table)

    path = str(tmp_path / "sctab")
    upsert_into_keyed_table(spark, _docs(spark, 400), path=path, key="k",
                            updated_at_col=None, range_files=8,
                            stats_cols=["val"])
    out, stats = scan_keyed_table(spark, path, where={"val": (0, 90)},
                                  with_stats=True)
    assert 0 < stats["files_read"] < stats["files_total"] == 8
    rows = sorted(r["k"] for r in out.collect())
    assert rows == list(range(31))        # val=3k <= 90 -> k <= 30
    # ANDed predicates intersect the admissible sets: val<=900 admits
    # the low-key half, k>=250 the high half — only the overlap reads
    out2, st2 = scan_keyed_table(
        spark, path, where={"val": (0, 900), "k": (250, 399)},
        with_stats=True)
    assert 0 < st2["files_read"] < st2["files_total"]
    assert sorted(r["k"] for r in out2.collect()) == list(range(250, 301))
    # disjoint predicates: every file pruned, empty result
    out3, st3 = scan_keyed_table(
        spark, path, where={"val": (0, 90), "k": (300, 399)},
        with_stats=True)
    assert st3["files_read"] == 0 and out3.count() == 0


def test_scan_with_pending_deltas_decomposes(spark, tmp_path):
    """r12 verdict item 5: a scan between folds serves the pruned base
    MINUS delta-touched keys UNION the merged view of delta keys —
    equal to scan-after-fold, including a delta that moves a row INTO
    the predicate range while its base row sits in a pruned file."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        compact_pruned, scan_keyed_table)

    path = _mk_range_table(spark, tmp_path)
    # k=10's base val is 20 (outside the probe range below); the delta
    # moves it INTO range — and k=10's base row lives in the FIRST
    # file, which the val-prune may drop
    append_delta(spark, spark.createDataFrame(
        [(10, 999, None)], "k long, val long, tag string"),
        path=path, key="k")
    # k=332's base val (996) IS in range — the tombstone must cut it
    append_delete_delta(spark, spark.createDataFrame([(332,)], "k long"),
                        path=path, key="k")
    live, st_live = scan_keyed_table(spark, path,
                                     where={"val": (990, 1010)},
                                     with_stats=True)
    assert st_live["deltas"] == 2
    live_rows = sorted((r["k"], r["val"]) for r in live.collect())
    assert (10, 999) in live_rows
    assert all(k != 332 for k, _ in live_rows)
    compact_pruned(spark, path, "k")
    folded = scan_keyed_table(spark, path, where={"val": (990, 1010)})
    assert live_rows == sorted((r["k"], r["val"])
                               for r in folded.collect())
    # folded (and carried) table scans fine — including the carried
    # files, resolved by reference
    out, stats = scan_keyed_table(spark, path, where={"k": (0, 50)},
                                  with_stats=True)
    assert stats["files_read"] < stats["files_total"]
    got = {r["k"]: r["val"] for r in out.collect()}
    assert got[10] == 999 and len(got) == 51


def test_cli_scan(spark, tmp_path, capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main

    path = str(tmp_path / "clisctab")
    upsert_into_keyed_table(spark, _docs(spark, 400), path=path, key="k",
                            updated_at_col=None, range_files=8,
                            stats_cols=["val"])
    assert main(["scan", "--table", path, "--where", "k:100:150",
                 "--where", "val:330:"]) == 0
    out = capsys.readouterr().out
    m = re.search(r"read (\d+)/8 base files", out)
    assert m and 0 < int(m.group(1)) < 8   # pruning engaged
    assert main(["scan", "--table", path, "--where", "bogus"]) == 2


def test_predicate_validation(spark, tmp_path):
    path = _mk_range_table(spark, tmp_path, n=20, files=2)
    with pytest.raises(ValueError):
        lookup_keyed_table(spark, path, "k")
    with pytest.raises(ValueError):
        lookup_keyed_table(spark, path, "k", values=[1], lo=0)


def test_zorder_layout_prunes_stats_column(spark, tmp_path):
    """r12 verdict stretch: zorder_col clusters the range base on the
    Morton interleave of (key, col), so files cover bounded (key, col)
    rectangles — a stats-column scan prunes files on a z-ordered
    table where the key-sorted layout reads everything, results
    identical; the layout survives a fold; key lookups stay pruned."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        compact, lookup_keyed_table, scan_keyed_table, table_meta)

    # val decorrelated from k: key-sorted files each span ~the whole
    # val range (no stats prune), z-ordered files cover val slices
    docs = spark.range(4000).selectExpr(
        "id AS k", "CAST((id * 2654435761) % 10000 AS DOUBLE) AS val")
    p_key = str(tmp_path / "ksorted")
    p_z = str(tmp_path / "zordered")
    upsert_into_keyed_table(spark, docs, path=p_key, key="k",
                            updated_at_col=None, range_files=16,
                            stats_cols=["val"])
    upsert_into_keyed_table(spark, docs, path=p_z, key="k",
                            updated_at_col=None, range_files=16,
                            stats_cols=["val"], zorder_col="val")
    where = {"val": (100.0, 600.0)}
    out_k, st_k = scan_keyed_table(spark, p_key, where=where,
                                   with_stats=True)
    out_z, st_z = scan_keyed_table(spark, p_z, where=where,
                                   with_stats=True)
    assert st_z["files_read"] < st_k["files_read"], (st_z, st_k)
    rows_k = sorted((r["k"], r["val"]) for r in out_k.collect())
    rows_z = sorted((r["k"], r["val"]) for r in out_z.collect())
    assert rows_k == rows_z and len(rows_z) > 0
    # key lookups still prune (z-rectangles bound the key too)
    _, st = lookup_keyed_table(spark, p_z, "k", values=[42],
                               with_stats=True)
    assert st["files_read"] < st["files_total"]
    # the layout is inherited through a full fold
    append_delta(spark, spark.createDataFrame(
        [(42, 555.0)], "k long, val double"), path=p_z, key="k")
    compact(spark, p_z, "k")
    assert table_meta(spark, p_z).get("zorder_col") == "val"
    out2, st2 = scan_keyed_table(spark, p_z, where=where, with_stats=True)
    assert st2["files_read"] < st2["files_total"]
    got = {r["k"]: r["val"] for r in out2.collect()}
    assert got[42] == 555.0


def test_cli_zorder_col(spark, tmp_path, capsys):
    """CLI surface for the z-order layout: `compact --zorder-col`
    (re-)clusters an existing range table; `table-info` reports the
    layout; a subsequent CLI scan on the stats column prunes."""
    from howto_mongo_bulk_update_from_parquet_spark.cli import main

    path = str(tmp_path / "clizt")
    docs = spark.range(2000).selectExpr(
        "id AS k", "CAST((id * 2654435761) % 10000 AS DOUBLE) AS val")
    upsert_into_keyed_table(spark, docs, path=path, key="k",
                            updated_at_col=None, range_files=8,
                            stats_cols=["val"])
    assert main(["compact", "--table", path, "--key", "k",
                 "--range-files", "8", "--zorder-col", "val"]) == 0
    capsys.readouterr()
    assert main(["table-info", "--table", path]) == 0
    assert "z-ordered with val" in capsys.readouterr().out
    assert main(["scan", "--table", path, "--where", "val:100:900"]) == 0
    m = re.search(r"read (\d+)/8 base files", capsys.readouterr().out)
    assert m and 0 < int(m.group(1)) < 8
    # flag validation: z-order on a hash base is a contradiction
    gen = str(tmp_path / "gen.parquet")
    from howto_mongo_bulk_update_from_parquet_spark.sources.generate import (
        generate_pipeline_data)
    generate_pipeline_data(spark, 50, seed=1).write.parquet(gen)
    assert main(["upsert", "--path", gen, "--table", str(tmp_path / "t2"),
                 "--buckets", "4", "--zorder-col", "score"]) == 2


def test_cli_scan_live_table(spark, tmp_path, capsys):
    """The CLI scan verb over a table WITH pending deltas — the r13
    delta-aware decomposition reaches the command surface: the delta's
    moved-into-range row appears, the prune still engages."""
    from howto_mongo_bulk_update_from_parquet_spark.cli import main

    path = _mk_range_table(spark, tmp_path)
    append_delta(spark, spark.createDataFrame(
        [(10, 999, None)], "k long, val long, tag string"),
        path=path, key="k")
    assert main(["scan", "--table", path, "--where", "val:990:1010"]) == 0
    out = capsys.readouterr().out
    m = re.search(r"read (\d+)/8 base files", out)
    assert m is not None
    assert "k=10" in out or "10" in out   # the delta-moved row surfaced


def test_lookup_join_bulk_probes(spark, tmp_path):
    """Bulk probe join (r13): distributed probe keys enrich from the
    merged view — span-pruned base read, exact broadcast semi join,
    deltas and tombstones honored; absent keys don't match; scattered
    probes stay correct without pruning."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        lookup_join_keyed_table)

    path = _mk_range_table(spark, tmp_path)       # 400 keys, 8 files
    append_delta(spark, spark.createDataFrame(
        [(120, 999, None)], "k long, val long, tag string"),
        path=path, key="k")
    append_delete_delta(spark, spark.createDataFrame([Row(k=121)]),
                        path=path, key="k")
    # clustered probe batch: keys 100..140 (+ an absent key)
    probes = spark.range(100, 141).select(F.col("id").alias("k")) \
        .unionByName(spark.createDataFrame([Row(k=9_999)]))
    out, st = lookup_join_keyed_table(spark, path, "k", probes,
                                      with_stats=True)
    got = {r["k"]: r["val"] for r in out.collect()}
    assert st["files_read"] < st["files_total"]   # span prune engaged
    assert got[120] == 999                        # delta merged
    assert 121 not in got and 9_999 not in got    # tombstone + absent
    assert len(got) == 40 and got[100] == 300     # 41 probed, -1 deleted
    # scattered probes (full key span): no prune, still exact
    scattered = spark.createDataFrame([Row(k=0), Row(k=399)])
    out2 = lookup_join_keyed_table(spark, path, "k", scattered)
    assert {r["k"] for r in out2.collect()} == {0, 399}
    # empty probe set
    empty = lookup_join_keyed_table(
        spark, path, "k", spark.createDataFrame([], "k long"))
    assert empty.count() == 0


def test_cli_lookup_probes(spark, tmp_path, capsys):
    """CLI bulk form: --probes <parquet of keys> routes through
    lookup_join_keyed_table; mutual exclusion with --values/--lo."""
    from howto_mongo_bulk_update_from_parquet_spark.cli import main

    path = _mk_range_table(spark, tmp_path)
    probes = str(tmp_path / "probes.parquet")
    spark.range(50, 80).select(F.col("id").alias("k")) \
        .write.parquet(probes)
    assert main(["lookup", "--table", path, "--key", "k",
                 "--probes", probes]) == 0
    out = capsys.readouterr().out
    m = re.search(r"read (\d+)/8 base files", out)
    assert m and 0 < int(m.group(1)) < 8
    assert main(["lookup", "--table", path, "--key", "k",
                 "--probes", probes, "--values", "1"]) == 2
    assert main(["lookup", "--table", path, "--key", "k",
                 "--probes", probes, "--lo", "1"]) == 2


def test_pruned_delete_on_zordered_table(spark, tmp_path, capsys):
    """The surgical delete path (tombstone + pruned fold) on a
    Z-ORDERED table: key spans per file are wider, so the prune is
    less selective but MUST stay correct; the layout (and its
    manifest spec) survives the fold."""
    import json

    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        scan_keyed_table, table_meta)

    path = str(tmp_path / "zdel")
    docs = spark.range(2000).selectExpr(
        "id AS k", "CAST((id * 2654435761) % 10000 AS DOUBLE) AS val")
    upsert_into_keyed_table(spark, docs, path=path, key="k",
                            updated_at_col=None, range_files=8,
                            stats_cols=["val"], zorder_col="val")
    assert main(["delete", "--table", path, "--key", "k",
                 "--keys", "100,101,102", "--key-type", "bigint",
                 "--pruned"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["pruned"] is True
    got = {r["k"] for r in read_keyed_table(spark, path).collect()}
    assert not {100, 101, 102} & got and len(got) == 1997
    assert table_meta(spark, path).get("zorder_col") == "val"
    # the z-order's stats-column pruning still works post-fold
    _, st = scan_keyed_table(spark, path, where={"val": (100.0, 600.0)},
                             with_stats=True)
    assert st["files_read"] < st["files_total"]
