"""Public operator surface — import the composable building blocks
directly (each module's docstring carries its scale contract):

    from howto_mongo_bulk_update_from_parquet_spark.operators import (
        keyed_upsert, bloom_semi_join, skyline_2d, ...)
"""

from .bloom import bloom_semi_join, build_bloom_bits, might_contain  # noqa: F401
from .constraints import audit as constraint_audit  # noqa: F401
from .merge import keyed_upsert, prepare_source  # noqa: F401
from .pca import pca_fit, pca_project  # noqa: F401
from .reconcile import checksum_diff, table_checksum  # noqa: F401
from .result_cache import cached, plan_fingerprint  # noqa: F401
from .skyline import skyline_2d  # noqa: F401
