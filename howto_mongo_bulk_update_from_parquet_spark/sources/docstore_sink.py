"""Custom Python DataSource WRITER — the connector write path with the
full task-commit protocol, which is what the reference's Mongo bulk
sink actually needs from an engine (its asyncio pipeline hand-rolls
retries but has no transactional story; cf reference
src/func/mongo.py bulk execution).

`docstore` writes one JSON-lines file per partition into a staging
area; each task returns a WriterCommitMessage naming its staged file,
and the DRIVER-side commit() publishes them all (rename into the
destination + a _DOCSTORE_COMMITTED manifest listing every member) —
so readers see either the complete dataset or nothing. abort() tears
the staging down; a failed/retried task leaves at most an orphaned
temp file that commit ignores (task temp names carry a uuid, so a
retry never collides with its zombie predecessor).

This is Spark's V2 write protocol expressed through the public Python
DataSource API: executor work → commit messages → driver publish.
At 100 TB it's the same contract every real table format implements;
the JSON-lines "doc store" stands in for the remote sink the sandbox
doesn't host.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (DataSource, DataSourceWriter,
                                    WriterCommitMessage)
from pyspark.sql import SparkSession


class _Staged(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int) -> None:
        self.staged_path = staged_path
        self.n_rows = n_rows


class DocStoreDataSource(DataSource):
    """`df.write.format("docstore").option("path", dir).save()`."""

    @classmethod
    def name(cls) -> str:
        return "docstore"

    def writer(self, schema, overwrite: bool) -> "DocStoreWriter":
        return DocStoreWriter(self.options["path"], schema, overwrite)


class DocStoreWriter(DataSourceWriter):
    def __init__(self, path: str, schema, overwrite: bool) -> None:
        self.path = path
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    # -- executor side -----------------------------------------------
    def write(self, rows) -> _Staged:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        # uuid per ATTEMPT: a zombie first attempt can never collide
        # with (or be published instead of) the retry's file
        fname = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname + ".tmp", "w") as fh:
            for row in rows:
                fh.write(json.dumps(
                    {k: row[i] for i, k in enumerate(self.fields)},
                    default=str) + "\n")
                n += 1
        os.rename(fname + ".tmp", fname)   # task-local atomic finish
        return _Staged(fname, n)

    # -- driver side -------------------------------------------------
    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        members, total = [], 0
        # append MERGES with the published manifest; overwrite starts
        # fresh (earlier members stay on disk but drop out of the
        # manifest, so the reader contract hides them)
        prior = os.path.join(self.path, "_DOCSTORE_COMMITTED")
        if not self.overwrite and os.path.exists(prior):
            with open(prior) as fh:
                old = json.load(fh)
            members, total = list(old["members"]), old["n_rows"]
        for m in messages:
            final = os.path.join(self.path, os.path.basename(m.staged_path))
            os.rename(m.staged_path, final)
            members.append(os.path.basename(final))
            total += m.n_rows
        manifest = {"members": sorted(members), "n_rows": total}
        tmp = os.path.join(self.path, "_DOCSTORE_COMMITTED.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(self.path, "_DOCSTORE_COMMITTED"))
        self._cleanup_staging()

    def abort(self, messages) -> None:
        self._cleanup_staging()

    def _cleanup_staging(self) -> None:
        import shutil
        shutil.rmtree(os.path.join(self.path, "_staging"),
                      ignore_errors=True)


def register_docstore(spark: SparkSession) -> None:
    spark.dataSource.register(DocStoreDataSource)


def read_committed(path: str) -> list[dict]:
    """Reader contract: ONLY manifest members count; uncommitted or
    orphaned files are invisible."""
    with open(os.path.join(path, "_DOCSTORE_COMMITTED")) as fh:
        manifest = json.load(fh)
    out = []
    for m in manifest["members"]:
        with open(os.path.join(path, m)) as fh:
            out.extend(json.loads(line) for line in fh)
    assert len(out) == manifest["n_rows"]
    return out
