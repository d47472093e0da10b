"""Fixed-width text connector via Spark 4's Python DataSource API —
the custom-connector extension point, demonstrated on the one
interchange format Spark has no built-in reader for (mainframe/COBOL
exports, FTP drops).

Why this is the right tool here and a UDF is not: a DataSource gets a
real scan node (`BatchScan fixedwidth`) with schema-aware column
typing, ONE InputPartition PER FILE (so a 10k-file drop reads with
full cluster parallelism, not a single-threaded driver loop), and
filter pushdown hooks — `pushFilters` accepts `IsNotNull`/`EqualTo`/
comparison filters on any column and applies them DURING the per-line
parse, so filtered rows never materialize into Arrow/rows at all
(Spark still re-applies every filter above the scan; pushing is a
bandwidth win, never a correctness risk).

Layout options (all strings, DataSourceOptions are untyped):
    path    directory containing *.txt part files
    widths  comma-separated column widths, schema order

Values are right-padded in their slot (the writer in
`write_fixedwidth` produces the same layout); blank slots are NULL.
Types come from the user-supplied `.schema(...)` — long/double/string
supported, which covers the classic export surface.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (DataSource, DataSourceReader, EqualTo,
                                    GreaterThan, GreaterThanOrEqual,
                                    InputPartition, IsNotNull, LessThan,
                                    LessThanOrEqual,
                                    SimpleDataSourceStreamReader)
from pyspark.sql.types import DoubleType, LongType, StructType


@dataclass
class _FilePartition(InputPartition):
    filepath: str


class FixedWidthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def schema(self) -> StructType:
        raise NotImplementedError(
            "fixedwidth requires an explicit .schema(...) — width slots "
            "carry no type information to infer from")

    def reader(self, schema: StructType) -> "FixedWidthReader":
        return FixedWidthReader(schema, self.options)


class FixedWidthReader(DataSourceReader):
    def __init__(self, schema: StructType, options) -> None:
        self._schema = schema
        self._path = options.get("path")
        self._widths = [int(w) for w in options.get("widths").split(",")]
        if len(self._widths) != len(schema.fields):
            raise ValueError(
                f"{len(self._widths)} widths for {len(schema.fields)} columns")
        self._filters = []

    def pushFilters(self, filters):  # noqa: N802 - API name
        """Accept single-column comparison filters; anything else is
        returned to Spark as unsupported (Spark evaluates it above the
        scan). Accepted filters drop rows during the parse loop."""
        names = {f.name for f in self._schema.fields}
        supported_types = (EqualTo, IsNotNull, GreaterThan,
                           GreaterThanOrEqual, LessThan, LessThanOrEqual)
        for f in filters:
            if (isinstance(f, supported_types)
                    and len(f.attribute) == 1 and f.attribute[0] in names):
                self._filters.append(f)
            else:
                yield f

    def partitions(self):
        files = sorted(fn for fn in os.listdir(self._path)
                       if fn.endswith(".txt"))
        return [_FilePartition(os.path.join(self._path, fn)) for fn in files]

    # Characters per Arrow batch (readlines hint). Bounds executor
    # memory per yield while amortizing vectorized-kernel dispatch:
    # ~8 MB of line text per batch — far under task memory, far over
    # kernel overhead.
    _BATCH_CHARS = 1 << 23

    def read(self, partition: _FilePartition):
        """Vectorized Arrow-batch parse (Spark 4 Python DataSources
        may yield ``pyarrow.RecordBatch``es instead of tuples — one
        Arrow exchange per batch, no per-row Python objects):

        - slice every field for the whole batch with
          ``utf8_slice_codeunits`` (codepoint-correct, so multi-byte
          UTF-8 never shears a column boundary),
        - strip ONLY the ASCII-space pad character (`write_fixedwidth`
          pads with `rpad(_, " ")`; a bare ``.rstrip()`` would eat
          Unicode whitespace like NBSP and NULL out a real value),
        - blank slot → NULL, then one vectorized cast per column,
        - pushed filters become boolean masks applied BEFORE the
          batch leaves the reader (nulls compare to false, matching
          the row-path semantics where any filtered column being NULL
          drops the row).
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        fields = self._schema.fields
        offsets = []
        pos = 0
        for w in self._widths:
            offsets.append((pos, pos + w))
            pos += w
        arrow_types = []
        for f in fields:
            if isinstance(f.dataType, LongType):
                arrow_types.append(pa.int64())
            elif isinstance(f.dataType, DoubleType):
                arrow_types.append(pa.float64())
            else:
                arrow_types.append(pa.string())
        idx = {f.name: i for i, f in enumerate(fields)}
        checks = [(type(flt).__name__, idx[flt.attribute[0]],
                   getattr(flt, "value", None)) for flt in self._filters]
        cmp_fn = {"EqualTo": pc.equal, "GreaterThan": pc.greater,
                  "GreaterThanOrEqual": pc.greater_equal,
                  "LessThan": pc.less, "LessThanOrEqual": pc.less_equal}

        with open(partition.filepath, encoding="utf-8") as fh:
            while True:
                lines = [ln.rstrip("\n")
                         for ln in fh.readlines(self._BATCH_CHARS)]
                if not lines:
                    break
                raw = pa.array(lines, type=pa.string())
                cols = []
                for (a, b), typ in zip(offsets, arrow_types):
                    sl = pc.utf8_slice_codeunits(raw, start=a, stop=b)
                    if typ == pa.string():
                        # strings: rtrim only, preserving left padding
                        # as data (left-aligned convention)
                        sl = pc.utf8_rtrim(sl, characters=" ")
                    else:
                        # numerics: trim BOTH sides — right-aligned
                        # fields (leading spaces, the mainframe
                        # convention) must cast like the row path's
                        # int(raw)/float(raw) did
                        sl = pc.utf8_trim(sl, characters=" ")
                    sl = pc.if_else(pc.equal(sl, ""),
                                    pa.scalar(None, type=pa.string()), sl)
                    cols.append(sl if typ == pa.string()
                                else pc.cast(sl, typ))
                mask = None
                for kind, i, value in checks:
                    m = pc.is_valid(cols[i])
                    if kind in cmp_fn:
                        m = pc.and_kleene(m, pc.fill_null(
                            cmp_fn[kind](cols[i], value), False))
                    mask = m if mask is None else pc.and_(mask, m)
                if mask is not None:
                    cols = [pc.filter(c, mask) for c in cols]
                yield pa.RecordBatch.from_arrays(
                    cols, names=[f.name for f in fields])


def register_fixedwidth(spark: SparkSession) -> None:
    """Idempotent registration of the connector with a session. Also
    enables Python-source filter pushdown (off by default in Spark
    4.1; without it, Spark refuses to plan a reader that implements
    pushFilters at all)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FixedWidthDataSource)


def write_fixedwidth(df: DataFrame, path: str, widths: list[int]) -> None:
    """Distributed fixed-width writer: one `rpad`-formatted text line
    per row (executors write part files; the driver never sees data).
    Values must fit their slot — widths are a declared contract, so a
    too-narrow slot raises at write rather than corrupting columns."""
    cols = []
    for c, w in zip(df.columns, widths):
        s = F.coalesce(F.col(c).cast("string"), F.lit(""))
        cols.append(
            F.when(F.length(s) > w,
                   F.raise_error(F.concat(
                       F.lit(f"value too wide for {c}({w}): "), s))
                    .cast("string"))
             .otherwise(F.rpad(s, w, " ")))
    (df.select(F.concat(*cols).alias("value"))
       .write.mode("overwrite").text(path))


# ---------------------------------------------------------------------------
# Custom STREAMING source (SimpleDataSourceStreamReader): replayable
# deterministic event ticks. The simple-reader contract keeps offsets
# as plain dicts ({"tick": N}) and must be able to RE-READ any
# committed range (readBetweenOffsets) for recovery — exactly the
# replayability Kafka offers and rate/memory sources fake. Rows per
# tick and a hard stop come from options, so tests drive a bounded,
# fully deterministic stream through real micro-batch machinery.
# ---------------------------------------------------------------------------


class TickStreamDataSource(DataSource):
    """`spark.readStream.format("tickstream")` — schema (tick, i, value)."""

    @classmethod
    def name(cls) -> str:
        return "tickstream"

    def schema(self) -> str:
        return "tick long, i long, value double"

    def simpleStreamReader(self, schema):  # noqa: N802 - API name
        return TickStreamReader(self.options)


class TickStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self._rows_per_tick = int(options.get("rowspertick", "5"))
        self._max_tick = int(options.get("maxticks", "3"))

    def initialOffset(self) -> dict:  # noqa: N802
        return {"tick": 0}

    def _rows(self, tick: int):
        for i in range(self._rows_per_tick):
            # deterministic payload: replaying a range yields
            # identical rows, byte for byte
            yield (tick, i, float(tick * 100 + i))

    def read(self, start: dict):
        tick = start["tick"]
        if tick >= self._max_tick:
            return [], start
        # a LIST, not a generator: the engine pickles the prefetched
        # batch into its offset cache for replay
        return list(self._rows(tick)), {"tick": tick + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [row for tick in range(start["tick"], end["tick"])
                for row in self._rows(tick)]


def register_tickstream(spark: SparkSession) -> None:
    spark.dataSource.register(TickStreamDataSource)
