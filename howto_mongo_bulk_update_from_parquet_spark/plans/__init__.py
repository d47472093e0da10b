from .catalog import CATALOG, Query, register, all_queries, all_oracles  # noqa: F401
