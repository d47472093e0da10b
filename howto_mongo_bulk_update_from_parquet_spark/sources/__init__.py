from .parquet import load_table, load_tables, configure_s3, write_parquet  # noqa: F401
from .generate import generate_pipeline_data  # noqa: F401
