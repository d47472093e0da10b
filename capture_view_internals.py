"""Dump the view-maintenance round's INTERNAL frames as
explain('formatted') text — the maintenance machinery the cycle
queries exercise is not visible in their returned DataFrames, so the
plan evidence for optimization rounds is captured here (same posture
as r16's feed_preimage dumps). Usage:

    python capture_view_internals.py <outdir> <tag>

Writes <outdir>/view_contrib_<tag>.txt (the differential round's
contribution aggregation, which embeds the enriched feed) for a
3-arrival maintenance window over an orders-derived table at
$SPARK_GRAFT_SF_DIR. Standalone profiling tool — bench.py never
imports this.
"""
from __future__ import annotations

import os
import sys
import tempfile


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.session import get_spark
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        append_delta, append_delete_delta, upsert_into_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.sinks import views as V
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    spark = get_spark("capture_view_internals")
    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").cast("bigint").alias("g"),
        F.col("o_totalprice").cast("double").alias("val"))
    tp = tempfile.mkdtemp(prefix="cap_vm_t_")
    vp = tempfile.mkdtemp(prefix="cap_vm_v_")
    upsert_into_keyed_table(spark, rows, path=tp, key="k",
                            updated_at_col=None)
    V.maintain_grouped_view(spark, table_path=tp, key="k", view_path=vp,
                            group_col="g", sum_col="val")
    append_delta(spark,
                 rows.filter(F.col("k") % 10 == 0)
                 .select("k", (F.col("g") + 1000000).alias("g"),
                         (F.col("val") * 2).alias("val")),
                 path=tp, key="k")
    append_delete_delta(spark, rows.filter(F.col("k") % 7 == 0)
                        .select("k"), path=tp, key="k")

    # rebuild the round's contribution aggregation exactly as
    # _apply_differential does, pre-checkpoint, and dump its plan
    from howto_mongo_bulk_update_from_parquet_spark.sinks.changes import (
        OP_COL, PRE_COL, read_table_changes)
    off = V.view_offset(spark, vp)
    changes = read_table_changes(spark, tp, after=off,
                                 with_preimage=True, key="k")
    cols_, names = V._sum_cols("val")
    _DEC = V._DEC
    post_g = F.coalesce(F.col("g"), F.col(f"{PRE_COL}.g"))
    add_sel = [(F.col(OP_COL) == "U").alias("__keep"),
               post_g.alias("__g"), F.lit(1).cast("long").alias("__c")]
    ret_sel = [F.col(PRE_COL).isNotNull().alias("__keep"),
               F.col(f"{PRE_COL}.g").alias("__g"),
               F.lit(-1).cast("long").alias("__c")]
    for i, c in enumerate(cols_):
        post_v = F.coalesce(F.col(c), F.col(f"{PRE_COL}.{c}"))
        pre_v = F.col(f"{PRE_COL}.{c}")
        add_sel += [F.coalesce(post_v.cast(_DEC),
                               F.lit(0).cast(_DEC)).alias(f"__t{i}"),
                    post_v.cast("double").alias(f"__v{i}"),
                    F.lit(None).cast("double").alias(f"__r{i}")]
        ret_sel += [(-F.coalesce(pre_v.cast(_DEC),
                                 F.lit(0).cast(_DEC))).alias(f"__t{i}"),
                    F.lit(None).cast("double").alias(f"__v{i}"),
                    pre_v.cast("double").alias(f"__r{i}")]
    delta_aggs = [F.sum("__c").alias("__dc")]
    for i in range(len(cols_)):
        delta_aggs += [F.sum(f"__t{i}").alias(f"__dt{i}"),
                       F.min(f"__v{i}").alias(f"__wmin{i}"),
                       F.max(f"__v{i}").alias(f"__wmax{i}"),
                       F.min(f"__r{i}").alias(f"__rmin{i}"),
                       F.max(f"__r{i}").alias(f"__rmax{i}")]
    header = ""
    if "before" in tag:
        # r16 shape, reproduced verbatim: two filtered branches over
        # the CHECKPOINTED feed, unioned. The checkpoint was its own
        # job executing the feed plan — included below as section 1 so
        # the before/after Exchange totals compare the SAME work (the
        # after-plan runs the feed inline in the contribution job).
        header = ("== section 1: feed localCheckpoint job's plan "
                  "(a separate job in the r16 shape) ==\n"
                  + _explain(changes)
                  + "\n\n== section 2: contribution aggregation over "
                  "the checkpointed feed ==\n")
        ck = changes.localCheckpoint()
        add = ck.filter(F.col(OP_COL) == "U").select(*add_sel[1:])
        retract = ck.filter(F.col(PRE_COL).isNotNull()).select(
            *ret_sel[1:])
        delta = (add.unionByName(retract)
                 .filter(F.col("__g").isNotNull())
                 .groupBy("__g").agg(*delta_aggs))
    else:
        # r17 shape: one inline() pass over the un-checkpointed feed
        contrib = changes.select(
            F.inline(F.array(F.struct(*add_sel), F.struct(*ret_sel))))
        delta = (contrib
                 .filter(F.col("__keep") & F.col("__g").isNotNull())
                 .groupBy("__g").agg(*delta_aggs))
    with open(os.path.join(outdir, f"view_contrib_{tag}.txt"), "w") as fh:
        fh.write(header + _explain(delta))
    print("wrote", os.path.join(outdir, f"view_contrib_{tag}.txt"))


if __name__ == "__main__":
    main()
