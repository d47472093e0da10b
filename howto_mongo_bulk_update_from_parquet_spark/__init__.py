"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline (dimdasci/howto-mongo-bulk-update-from-parquet)
plus large-scale training-data-pipeline operators (dedup, similarity
search, multimodal plumbing, text analysis).

Design stance (see SURVEY.md §7):
- DataFrame/SQL API end-to-end; zero custom Catalyst code.
- Explicit schemas, seeded determinism, lazy single-action pipelines.
- Built-in `pyspark.sql.functions` in every hot path; Pandas UDFs only
  where built-ins genuinely can't express the semantics (multimodal
  decode stubs).
- Designed for a 1000-executor cluster reading 100 TB: broadcast small
  dims, AQE on, no driver-side collects, partition-count knobs exposed.
"""

__version__ = "0.1.0"
