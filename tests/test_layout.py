"""Z-ordered writes: every output file's footer stats must cover a
bounded rectangle in BOTH cluster dimensions (the min/max-skipping
property), unlike a naive write where each file spans the full range."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.sinks.layout import write_zordered

SF = "/root/testdata/sf0.01"


def _file_spans(path, a_col, b_col):
    spans = []
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        amin = amax = bmin = bmax = None
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == a_col:
                    amin = st.min if amin is None else min(amin, st.min)
                    amax = st.max if amax is None else max(amax, st.max)
                elif name == b_col:
                    bmin = st.min if bmin is None else min(bmin, st.min)
                    bmax = st.max if bmax is None else max(bmax, st.max)
        if amin is not None and bmin is not None:
            spans.append((amax - amin, bmax - bmin))
    return spans


def test_zordered_write_bounds_both_dimensions(spark, tmp_path):
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .select("o_orderkey", "o_custkey",
                 F.expr("datediff(o_orderdate, DATE '1970-01-01')")
                 .cast("long").alias("day")))
    naive = os.path.join(str(tmp_path), "naive")
    zord = os.path.join(str(tmp_path), "zord")
    o.repartition(16).write.mode("overwrite").parquet(naive)
    write_zordered(o, zord, "o_custkey", "day", n_files=16)

    glob_span_cust = (o.agg(F.max("o_custkey") - F.min("o_custkey"))
                      .first()[0])
    glob_span_day = o.agg(F.max("day") - F.min("day")).first()[0]

    naive_spans = _file_spans(naive, "o_custkey", "day")
    z_spans = _file_spans(zord, "o_custkey", "day")
    assert len(z_spans) >= 8

    # naive: every file spans essentially the whole key range in both
    # dimensions (round-robin repartition)
    assert all(c > 0.9 * glob_span_cust and d > 0.9 * glob_span_day
               for c, d in naive_spans)
    # z-ordered: 16 contiguous z-ranges cut EACH dimension's span —
    # on average well under half the global span
    avg_c = sum(c for c, _ in z_spans) / len(z_spans)
    avg_d = sum(d for _, d in z_spans) / len(z_spans)
    assert avg_c < 0.5 * glob_span_cust
    assert avg_d < 0.5 * glob_span_day


def test_zordered_write_preserves_rows_and_schema(spark, tmp_path):
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .select("o_orderkey", "o_custkey",
                 F.expr("datediff(o_orderdate, DATE '1970-01-01')")
                 .cast("long").alias("day")))
    zord = os.path.join(str(tmp_path), "z2")
    write_zordered(o, zord, "o_custkey", "day", n_files=8)
    back = spark.read.parquet(zord)
    assert back.columns == o.columns  # helper column dropped
    assert back.count() == o.count()
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0
