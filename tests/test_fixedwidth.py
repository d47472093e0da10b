"""Custom Python DataSource (fixed-width): round trip, per-file
partition parallelism, parse-time filter pushdown, width contract."""

import os

import pytest
from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.sources.fixedwidth import (
    FixedWidthReader, register_fixedwidth, write_fixedwidth)


@pytest.fixture()
def fw_dir(spark, tmp_path):
    register_fixedwidth(spark)
    df = spark.createDataFrame(
        [(i, f"s{i % 4}", float(i) / 2 if i % 5 else None)
         for i in range(100)],
        "k long, tag string, v double").repartition(4)
    d = os.path.join(str(tmp_path), "fw")
    write_fixedwidth(df, d, [6, 6, 10])
    return d, df


def _read(spark, d):
    return (spark.read.format("fixedwidth")
            .schema("k long, tag string, v double")
            .option("widths", "6,6,10").load(d))


def test_round_trip_exact(spark, fw_dir):
    d, df = fw_dir
    assert sorted(map(tuple, _read(spark, d).collect())) \
        == sorted(map(tuple, df.collect()))


def test_one_partition_per_file(spark, fw_dir):
    d, _ = fw_dir
    n_files = len([f for f in os.listdir(d) if f.endswith(".txt")])
    assert n_files == 4
    assert _read(spark, d).rdd.getNumPartitions() == n_files


def test_pushed_filters_match_unpushed_semantics(spark, fw_dir):
    """Spark trusts accepted filters (no residual Filter node), so the
    parse-time evaluation must equal Spark's own: compare every
    supported comparison against post-scan filtering of the full
    read."""
    d, _ = fw_dir
    full = _read(spark, d).collect()
    for cond in ["k > 50", "k >= 99", "k < 3", "k <= 0", "k = 7",
                 "tag = 's1'", "v IS NOT NULL", "v > 20.0",
                 "k > 10 AND tag = 's2' AND v IS NOT NULL"]:
        got = sorted(map(tuple, _read(spark, d).filter(cond).collect()))
        want = sorted(tuple(r) for r in
                      spark.createDataFrame(full, "k long, tag string, v double")
                      .filter(cond).collect())
        assert got == want, cond


def test_unsupported_filters_are_returned_to_spark(spark):
    class Opts(dict):
        pass
    from pyspark.sql.types import StructType
    schema = StructType.fromDDL("k long, tag string")
    r = FixedWidthReader(schema, Opts(path="/tmp", widths="4,4"))
    from pyspark.sql.datasource import EqualTo, Not
    residual = list(r.pushFilters([EqualTo(("k",), 5),
                                   Not(EqualTo(("tag",), "x"))]))
    assert len(residual) == 1 and isinstance(residual[0], Not)
    assert len(r._filters) == 1


def test_too_wide_value_raises_at_write(spark, tmp_path):
    df = spark.createDataFrame([("toolongvalue",)], "s string")
    with pytest.raises(Exception, match="too wide"):
        write_fixedwidth(df, os.path.join(str(tmp_path), "x"), [4])


def test_tickstream_custom_streaming_source(spark, tmp_path):
    """The custom Python STREAMING source drives real micro-batch
    machinery: availableNow consumes the bounded stream to its max
    tick with exactly-once, deterministic batches."""
    import os
    from howto_mongo_bulk_update_from_parquet_spark.sources.fixedwidth import register_tickstream
    register_tickstream(spark)
    # Python streaming sources don't support Trigger.AvailableNow
    # (Spark falls back to ONE batch) — run continuous micro-batches
    # and stop once the bounded stream is drained
    out = (spark.readStream.format("tickstream")
           .option("rowspertick", "4").option("maxticks", "3").load()
           .writeStream.format("memory").queryName("ticks_mem")
           .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
           .start())
    import time
    want = sorted((t, i, float(t * 100 + i))
                  for t in range(3) for i in range(4))
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("ticks_mem").count() >= len(want):
                break
            time.sleep(0.5)
        rows = sorted(map(tuple, spark.table("ticks_mem").collect()))
    finally:
        out.stop()
    assert rows == want


def test_polymorphic_udtf_analyze_schema(spark):
    """Spark 4 polymorphic Python UDTF: the output schema is computed
    by analyze() from a constant argument — the table function's arity
    is data-driven at plan time, the remaining piece of the UDTF
    surface beyond the fixed-schema Arrow UDTF (q_udtf_bigrams)."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import StringType, StructType

    @udtf
    class FirstNTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            parts = (text or "").split(" ")
            yield tuple((parts[i] if i < len(parts) else None)
                        for i in range(n))

    spark.udtf.register("first_n_tokens", FirstNTokens)
    two = spark.sql("SELECT * FROM first_n_tokens('a b c', 2)")
    assert two.columns == ["tok0", "tok1"]
    assert two.collect()[0] == ("a", "b")
    four = spark.sql("SELECT * FROM first_n_tokens('a b c', 4)")
    assert four.columns == ["tok0", "tok1", "tok2", "tok3"]
    assert four.collect()[0] == ("a", "b", "c", None)


def test_fixedwidth_roundtrip_property(spark, tmp_path):
    """Hypothesis round-trip over the representable value space.
    Fixed-width columns cannot carry trailing spaces or newlines (the
    slot pad and the line terminator are in-band) — the strategy
    excludes them, which IS the format's documented contract."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    text = (st.text(alphabet=st.characters(
                codec="utf-8", exclude_characters=" \n\r",
                exclude_categories=("Cs", "Cc")), max_size=8)
            .map(lambda s: s or None))
    rows = st.lists(st.tuples(st.integers(0, 10**8), text,
                              st.one_of(st.none(),
                                        st.floats(allow_nan=False,
                                                  allow_infinity=False,
                                                  width=16))),
                    min_size=1, max_size=20)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(rows=rows)
    def check(rows):
        df = spark.createDataFrame(rows, "k long, s string, v double")
        d = os.path.join(str(tmp_path), "prop")
        write_fixedwidth(df, d, [10, 8, 24])
        back = (spark.read.format("fixedwidth")
                .schema("k long, s string, v double")
                .option("widths", "10,8,24").load(d))
        # None-safe sort key: plain tuple sort raises on None vs str.
        key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
        assert sorted(map(tuple, back.collect()), key=key) \
            == sorted(rows, key=key)

    register_fixedwidth(spark)
    check()


def test_fixedwidth_reader_chunks_large_files(spark, tmp_path, monkeypatch):
    """The Arrow read path batches by a readlines character hint; a
    file bigger than one hint must arrive as MULTIPLE RecordBatches
    that concatenate to exactly the file's rows (no dropped/dup lines
    at chunk boundaries)."""
    import pyarrow as pa
    from pyspark.sql.types import StructType

    from howto_mongo_bulk_update_from_parquet_spark.sources.fixedwidth import (
        FixedWidthReader, _FilePartition)

    d = tmp_path / "fw"
    d.mkdir()
    n = 500
    lines = "".join(f"{i:<6}{i * 3:<6}\n" for i in range(n))
    (d / "part-0.txt").write_text(lines)
    schema = StructType.fromDDL("a long, b long")
    monkeypatch.setattr(FixedWidthReader, "_BATCH_CHARS", 256)
    rdr = FixedWidthReader(schema, {"path": str(d), "widths": "6,6"})
    batches = list(rdr.read(_FilePartition(str(d / "part-0.txt"))))
    assert len(batches) > 5           # genuinely chunked
    t = pa.Table.from_batches(batches)
    assert t.num_rows == n
    assert t.column("a").to_pylist() == list(range(n))
    assert t.column("b").to_pylist() == [i * 3 for i in range(n)]


def test_fixedwidth_reads_crlf_files(spark, tmp_path):
    """CRLF (and lone-CR) line endings are translated by text-mode
    universal newlines before the parser sees them — pin that a
    Windows/FTP-written file round-trips with no stray carriage
    returns in the last column."""
    import pyarrow as pa
    from pyspark.sql.types import StructType

    from howto_mongo_bulk_update_from_parquet_spark.sources.fixedwidth import (
        FixedWidthReader, _FilePartition)

    d = tmp_path / "crlf"
    d.mkdir()
    (d / "part-0.txt").write_bytes(b"abc   1     \r\nxy    22    \r\n")
    schema = StructType.fromDDL("s string, k long")
    rdr = FixedWidthReader(schema, {"path": str(d), "widths": "6,6"})
    t = pa.Table.from_batches(
        list(rdr.read(_FilePartition(str(d / "part-0.txt")))))
    assert t.to_pydict() == {"s": ["abc", "xy"], "k": [1, 22]}


def test_fixedwidth_right_aligned_numerics(spark, tmp_path):
    """ADVICE r8: right-aligned numeric fields (leading spaces — the
    mainframe convention for externally-produced files) must cast like
    the row path's int(raw)/float(raw) did; string columns keep their
    left padding as data (left-aligned convention)."""
    import pyarrow as pa
    from pyspark.sql.types import StructType

    from howto_mongo_bulk_update_from_parquet_spark.sources.fixedwidth import (
        FixedWidthReader, _FilePartition)

    d = tmp_path / "ra"
    d.mkdir()
    line1 = "  ab" + "    42" + "      1.5"
    line2 = " cd " + "     7" + "        2"
    (d / "part-0.txt").write_text(line1 + "\n" + line2 + "\n")
    schema = StructType.fromDDL("s string, k long, v double")
    rdr = FixedWidthReader(schema, {"path": str(d), "widths": "4,6,9"})
    t = pa.Table.from_batches(
        list(rdr.read(_FilePartition(str(d / "part-0.txt")))))
    assert t.to_pydict() == {"s": ["  ab", " cd"],
                             "k": [42, 7], "v": [1.5, 2.0]}
