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
                        client_factory: Callable[[str], Any] | None = None) -> None:
    """Distributed bulk upsert: each partition opens one client and
    issues one unordered bulk_write (reference U3/U4, minus the
    asyncio slicing — Spark's scheduler overlaps partitions)."""
    payload = payload or [c for c in df.columns if c != key]
    cols = [key, *payload]
    if n_partitions:
        df = df.repartition(n_partitions)

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
            coll.bulk_write(requests, ordered=ordered)
        finally:
            close = getattr(client, "close", None)
            if close:
                close()

    df.select(*cols).foreachPartition(write_partition)


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
