from .mongo import write_mongo_upserts, build_upsert_ops  # noqa: F401
from .keyed_table import (  # noqa: F401
    ConcurrentWriteError, upsert_into_keyed_table, read_keyed_table,
    current_base_version, append_delta, read_merged, compact)
