"""Streaming keyed upsert: the reference pipeline as a stream.

The reference reads parquet batches and bulk-upserts them into a keyed
collection (/root/reference/src/func/job.py:20-95). Its streaming form:
`readStream` over the landing directory → `foreachBatch` → the same
merge operator per micro-batch. foreachBatch gives exactly-once table
updates (the checkpoint records which micro-batch was applied; a
replayed batch re-merges the same rows, and the merge is idempotent —
proved by tests/test_merge_properties.py::test_merge_idempotent).

Scale notes: each micro-batch merge shuffles batch ∪ table on the key.
For small frequent batches swap the full merge for
`sinks.keyed_table.append_delta` inside foreachBatch and compact on a
schedule — same trade as the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sinks.keyed_table import upsert_into_keyed_table


def stream_upsert_parquet(spark: SparkSession, source_dir: str, *,
                          schema: T.StructType, table_path: str, key: str,
                          checkpoint: str,
                          max_files_per_trigger: int | None = None) -> None:
    """Continuously upsert arriving parquet files into the keyed table,
    draining everything currently available (availableNow)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_into_keyed_table(batch_df.sparkSession, batch_df,
                                path=table_path, key=key)

    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def stream_apply_changefeed(spark: SparkSession, source_dir: str, *,
                            schema: T.StructType, table_path: str,
                            key: str, op_col: str, checkpoint: str) -> None:
    """Consume an op-typed changefeed stream ('U' upserts / 'D'
    deletes, the q_merge_upsert_delete shape) into the LSM keyed
    table: each micro-batch appends one upsert delta for its 'U' rows
    and one tombstone delta for its 'D' rows — O(batch) writes, no
    base rewrite; compact on a schedule.

    The tombstone delta is appended AFTER the upsert delta, so within
    one batch a delete of a key wins over that key's own upsert
    (matching the batch MERGE semantics). A checkpoint-replayed batch
    appends byte-identical deltas at higher versions; newest-wins
    merge-on-read makes the table state idempotent under replay."""
    from ..sinks.keyed_table import append_delete_delta, append_delta

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F
        sess = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            ups = batch_df.filter(F.col(op_col) == "U").drop(op_col)
            if ups.limit(1).count():
                append_delta(sess, ups, path=table_path, key=key)
            dels = (batch_df.filter(F.col(op_col) == "D")
                    .select(key))
            if dels.limit(1).count():
                append_delete_delta(sess, dels, path=table_path, key=key)
        finally:
            batch_df.unpersist()

    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
