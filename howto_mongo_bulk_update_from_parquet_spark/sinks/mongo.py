"""MongoDB bulk-upsert sink — the reference's terminal operator
(/root/reference/src/func/mongo.py:28-163) re-expressed as a
distributed `foreachPartition` write.

Semantics preserved exactly (SURVEY §2.1 notes 1-5):
- one upsert per row, filter {key: value} (mongo.py:59)
- $set contains only non-null payload fields (mongo.py:60-63)
- $currentDate: {updatedAt: true} on every write (mongo.py:64-66)
- null-key rows dropped, logged, job continues (mongo.py:50-53)
- unordered bulk writes (mongo.py:139); result counts aggregated

What the asyncio machinery becomes: the reference ran K concurrent
bulk writes on one event loop (mongo.py:166-269); here every partition
is an executor task doing its own bulk_write, so write parallelism =
`df.rdd.getNumPartitions()` × executor slots — repartition(k) is the
old `--concurrent-tasks` knob.

pymongo is not installed in this environment; the sink takes an
injectable `client_factory` (tests pass a fake) and raises a clear
error otherwise. With the official Spark connector on the classpath,
prefer `write_with_connector`.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_upsert_ops(rows: Iterator[dict[str, Any]], key: str,
                     payload: list[str]) -> Iterator[dict[str, Any]]:
    """Upsert operations (as plain dicts — pymongo-agnostic) for a
    partition's rows. Null-key rows are skipped; $set carries only
    non-null fields."""
    for row in rows:
        key_val = row.get(key)
        if key_val is None:
            continue
        fields = {f: row[f] for f in payload if row.get(f) is not None}
        # MongoDB rejects an empty $set — an all-null payload row would
        # fail the whole bulk_write; keep only $currentDate for it.
        update: dict[str, Any] = {"$currentDate": {"updatedAt": True}}
        if fields:
            update["$set"] = fields
        yield {
            "filter": {key: key_val},
            "update": update,
            "upsert": True,
        }


def write_mongo_upserts(df: DataFrame, *, uri: str, database: str,
                        collection: str, key: str,
                        payload: list[str] | None = None,
                        ordered: bool = False,
                        n_partitions: int | None = None,
                        permissive: bool = False,
                        client_factory: Callable[[str], Any] | None = None
                        ) -> dict[str, int]:
    """Distributed bulk upsert: each partition opens one client and
    issues one unordered bulk_write (reference U3/U4, minus the
    asyncio slicing — Spark's scheduler overlaps partitions).

    `permissive=True` reproduces the reference's degrade-and-continue
    error ladder (/root/reference/src/func/mongo.py:148-159: a failed
    bulk_write is logged and the job continues): a partition whose
    bulk_write raises is counted in an accumulator instead of failing
    the task. Returns {"n_failed_partitions": N} (always 0 in the
    default fail-fast mode — Spark's task retry owns errors there)."""
    payload = payload or [c for c in df.columns if c != key]
    cols = [key, *payload]
    if n_partitions:
        df = df.repartition(n_partitions)
    failed_acc = df.sparkSession.sparkContext.accumulator(0) if permissive else None

    if client_factory is None:
        def client_factory(u: str) -> Any:  # pragma: no cover - env-dependent
            try:
                from pymongo import MongoClient
            except ImportError as exc:
                raise NotImplementedError(
                    "pymongo is not installed in this environment; pass "
                    "client_factory= or use write_with_connector with the "
                    "MongoDB Spark connector jars") from exc
            return MongoClient(u)

    def write_partition(rows: Iterator[Any]) -> None:
        ops = list(build_upsert_ops((r.asDict() for r in rows), key, payload))
        if not ops:
            return
        client = client_factory(uri)
        try:
            coll = client[database][collection]
            try:
                from pymongo import UpdateOne
                requests = [UpdateOne(o["filter"], o["update"], upsert=True)
                            for o in ops]
            except ImportError:
                requests = ops  # fake clients consume the dict form
            if failed_acc is None:
                coll.bulk_write(requests, ordered=ordered)
            else:
                # reference error ladder: BulkWriteError / OperationFailure /
                # Exception all degrade to log-and-continue; here every
                # failure kind lands in the accumulator (pymongo's
                # specific exception types may not even be importable)
                try:
                    coll.bulk_write(requests, ordered=ordered)
                except Exception as exc:  # noqa: BLE001 - permissive by contract
                    import sys
                    print(f"mongo bulk_write failed, continuing "
                          f"({len(requests)} ops dropped): {exc!r}",
                          file=sys.stderr)
                    failed_acc.add(1)
        finally:
            close = getattr(client, "close", None)
            if close:
                close()

    df.select(*cols).foreachPartition(write_partition)
    return {"n_failed_partitions": failed_acc.value if failed_acc else 0}


def write_with_connector(df: DataFrame, *, uri: str, database: str,
                         collection: str, key: str) -> None:
    """Official MongoDB Spark connector path (jars required on the
    classpath — not present in this environment)."""
    (df.withColumn("updatedAt", F.current_timestamp())
       .write.format("mongodb")
       .option("connection.uri", uri)
       .option("database", database)
       .option("collection", collection)
       .option("idFieldList", key)
       .option("operationType", "update")
       .option("upsertDocument", "true")
       .mode("append")
       .save())
