from .mongo import write_mongo_upserts, build_upsert_ops  # noqa: F401
from .keyed_table import upsert_into_keyed_table  # noqa: F401
