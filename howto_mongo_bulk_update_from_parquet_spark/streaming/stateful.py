"""Custom stateful streaming operator via applyInPandasWithState:
first-seen dedup — emit each (user_id, event_type) the first time it
appears in the stream, suppress every later occurrence.

This is the streaming form of the training-data-pipeline "emit only
novel examples" pattern: state per key is one boolean (plus the
winning row), bounded by key cardinality, and survives across
micro-batches via the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("first_event_id", T.LongType()),
    T.StructField("first_ts", T.TimestampType()),
])

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _first_seen(key, pdfs, state: GroupState):
    import pandas as pd
    if state.exists and state.get[0]:
        for _ in pdfs:   # drain; key already emitted
            pass
        return
    best = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"]).iloc[:1]
        cand = (pdf["ts"].iloc[0], int(pdf["event_id"].iloc[0]))
        if best is None or cand < best:
            best = cand
    if best is None:
        return
    state.update((True,))
    yield pd.DataFrame({"user_id": [key[0]], "event_type": [key[1]],
                        "first_event_id": [best[1]], "first_ts": [best[0]]})


def stream_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First occurrence of each (user, event_type), computed by the
    streaming engine with explicit keyed state."""
    from .jobs import _run_to_memory, _stage_events_stream
    events, stage = _stage_events_stream(spark, sf_dir)
    out = (events.groupBy("user_id", "event_type")
           .applyInPandasWithState(_first_seen, OUTPUT_SCHEMA, STATE_SCHEMA,
                                   "append", GroupStateTimeout.NoTimeout))
    return _run_to_memory(out, "append", stage)
