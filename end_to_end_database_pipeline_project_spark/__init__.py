"""end_to_end_database_pipeline_project_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
the reference pipeline ``ugutkarsh/End-to-End-Database-Pipeline-Project``
(NWS API -> MongoDB -> ClickHouse -> Redis -> dashboard), rebuilt Spark-first:

- the reference's medallion layers (bronze/silver/gold/serving) become
  Parquet-backed DataFrames in one job graph (``pipeline/``),
- its driver-side Python transforms become native Catalyst column
  expressions (``functions/``),
- its ClickHouse SQL rollups become two/three-level ``groupBy`` chains
  (``operators/rollup.py``),
- its scheduler-driven micro-batching becomes Structured Streaming
  (``streaming/``),
- and the generalized relational + LLM-data-pipeline surface (joins,
  windows, dedup, similarity search, text analysis, multimodal columns)
  lives in ``operators/`` and ``plans/``.

Every public query is registered in ``plans.registry`` together with a
DuckDB-executable ANSI-SQL oracle; the driver contract in
``/root/repo/__spark_entry__.py`` is a thin re-export.
"""

__version__ = "0.1.0"
