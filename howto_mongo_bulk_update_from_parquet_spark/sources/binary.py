"""Binary-file ingestion for multimodal corpora: Spark's built-in
`binaryFile` source reads a directory of opaque media files (images,
audio, video segments) as rows of (path, modificationTime, length,
content) — the raw-bytes layer the multimodal operators
(operators/multimodal.py) decode and feature-extract over.

Scale notes (100 TB): each file becomes one row; Spark lists and
splits the file set across executors, so ingestion parallelism is
file-count-bound (pack small media into a few thousand files per
directory, or use archive shards). `pathGlobFilter` prunes at
listing time — non-matching files are never opened — and
`spark.sql.files.maxPartitionBytes` has no effect here (a file is
never split); `wholeFile` semantics are implicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None,
                      recursive: bool = False) -> DataFrame:
    """Read a directory of opaque files as (path, modificationTime,
    length, content) rows via the built-in binaryFile source."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)
