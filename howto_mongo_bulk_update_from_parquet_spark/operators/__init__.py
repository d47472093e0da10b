from .merge import keyed_upsert, prepare_source  # noqa: F401
