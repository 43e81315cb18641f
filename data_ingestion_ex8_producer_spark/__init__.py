"""PySpark-native analytics engine with the capabilities of the reference
``eEDB-Grupo-5/data_ingestion_ex8-producer`` (a single-process S3-CSV → Avro →
Kafka producer), rebuilt Spark-first and extended with the analytics /
LLM-data-pipeline surface mandated by the build contract.

Layout:
  config.py     env-driven configuration (same env-var names as the reference's
                ``settings.py:11-18``)
  session.py    SparkSession factory (AQE, Arrow, s3a wiring)
  schemas.py    bronze/silver StructTypes + verbatim Avro schema JSON
  functions/    pure column/name helpers (sanitize port, text, vectors, avro)
  sources/      batch + streaming readers (csv, parquet star schema, kafka)
  sinks/        kafka / parquet / memory sinks
  operators/    the analytics query surface (driver-scored via plans.registry)
  plans/        query registry: name -> (spark builder, DuckDB oracle SQL)
  streaming/    ingestion pipeline parity + event-time queries
"""

__version__ = "0.1.0"
