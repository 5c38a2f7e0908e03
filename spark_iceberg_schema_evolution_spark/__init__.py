"""spark_iceberg_schema_evolution_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the capabilities of the reference
(`andermaco/spark_iceberg_schema_evolution`, a schema-evolution ETL demo):
schema-evolving ingestion into partitioned lakehouse tables, plus a full
relational surface (joins / aggregations / windows / set ops / scalar
functions), Structured Streaming, and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns). Everything is
expressed through the DataFrame/SQL API so Catalyst handles optimization;
no engine code path ever collects data to the driver.

Layout:
  session.py            SparkSession factory (AQE, Arrow, UTC, catalog wiring)
  config.py             frozen engine settings (replaces reference settings.py)
  types_map.py          DataType <-> type-string round trip
  tables.py             lakehouse table lifecycle (snapshots, evolution, MERGE)
  operators/evolve.py   schema alignment / diff / coercion operator family
  operators/relational.py  as-of join, range join, top-k helpers
  operators/dedup.py    exact + MinHash-LSH + SimHash dedup
  operators/similarity.py  cosine top-k similarity search
  operators/text.py     token/quality/lang-id text analysis
  operators/multimodal.py  binary-payload column plumbing
  sources/              batch readers (evolving CSV family)
  streaming/            Structured Streaming windows / watermark / sinks
  queries.py            declared query corpus (duckdb-oracle checked)
"""

from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: F401

__all__ = ["get_spark"]
__version__ = "0.1.0"
