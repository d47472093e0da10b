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

    def read(self, partition: _FilePartition):
        fields = self._schema.fields
        offsets = []
        pos = 0
        for w in self._widths:
            offsets.append((pos, pos + w))
            pos += w
        casts = []
        for f in fields:
            if isinstance(f.dataType, LongType):
                casts.append(int)
            elif isinstance(f.dataType, DoubleType):
                casts.append(float)
            else:
                casts.append(str)
        idx = {f.name: i for i, f in enumerate(fields)}
        checks = [(type(flt).__name__, idx[flt.attribute[0]],
                   getattr(flt, "value", None)) for flt in self._filters]
        with open(partition.filepath, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                row = []
                for (a, b), cast in zip(offsets, casts):
                    raw = line[a:b].rstrip()
                    row.append(cast(raw) if raw else None)
                ok = True
                for kind, i, value in checks:
                    v = row[i]
                    if v is None:
                        ok = False
                    elif kind == "EqualTo" and not v == value:
                        ok = False
                    elif kind == "GreaterThan" and not v > value:
                        ok = False
                    elif kind == "GreaterThanOrEqual" and not v >= value:
                        ok = False
                    elif kind == "LessThan" and not v < value:
                        ok = False
                    elif kind == "LessThanOrEqual" and not v <= value:
                        ok = False
                    if not ok:
                        break
                if ok:
                    yield tuple(row)


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
