"""Kafka source: read back the Avro datums the ingest pipeline produces.

The reference is produce-only (no consumer anywhere, SURVEY.md §2); this
module closes the loop so the analytics surface can query the ingested
stream.  Layered so the Avro decode is testable without a broker:

* ``read_kafka_stream`` / ``read_kafka_batch`` — the broker-facing readers
  (require the spark-sql-kafka package; not present in this container).
* ``decode_value_frame`` — turns any DataFrame with a ``value: binary``
  column (from Kafka, or from the parquet fallback sink) back into bronze
  reclamacoes rows.  Uses built-in ``from_avro`` when spark-avro is loaded,
  else the same pure-Python codec the encoder pins with golden tests.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig, load_config
from ..functions.avro_codec import decode_record
from ..schemas import BRONZE_SCHEMA, FIELD_ORDER, RECLAMACOES_AVRO_SCHEMA_JSON


def read_kafka_stream(spark: SparkSession, config: EngineConfig | None = None) -> DataFrame:
    """Streaming reader over the ingest topic (value: binary Avro datums)."""
    cfg = config or load_config()
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_bootstrap_servers)
        .option("subscribe", cfg.kafka_topic)
        .option("startingOffsets", "earliest")
        .load()
    )


def read_kafka_batch(spark: SparkSession, config: EngineConfig | None = None) -> DataFrame:
    cfg = config or load_config()
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_bootstrap_servers)
        .option("subscribe", cfg.kafka_topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )


def _from_avro_builtin(df: DataFrame) -> DataFrame | None:
    try:
        from pyspark.sql.avro.functions import from_avro

        out = df.select(
            from_avro("value", RECLAMACOES_AVRO_SCHEMA_JSON).alias("r")
        ).select(*[F.col(f"r.{name}").alias(name) for name in FIELD_ORDER])
        out.schema  # force analysis so AVRO_NOT_LOADED surfaces here
        return out
    except Exception:  # noqa: BLE001 — spark-avro not on the classpath
        return None


def decode_value_frame(df: DataFrame, use_builtin: bool = True) -> DataFrame:
    """value: binary -> bronze reclamacoes rows (inverse of
    sinks.encode.avro_value_frame)."""
    if use_builtin:
        builtin = _from_avro_builtin(df)
        if builtin is not None:
            return builtin

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [decode_record(bytes(v)) for v in pdf["value"]]
            yield pd.DataFrame(
                {name: [r[name] for r in rows] for name in FIELD_ORDER},
                dtype=object,
            )

    return df.select("value").mapInPandas(decode_batches, BRONZE_SCHEMA)
