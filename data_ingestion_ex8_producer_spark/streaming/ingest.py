"""The ingestion pipeline — the reference's entire job (S3 CSV poll -> Avro
-> Kafka, ``app.py:176-196``) as ONE checkpointed Structured Streaming query.

Reference loop -> Spark mapping (SURVEY.md §3):
  list_csv_files + re-scan forever  -> FileStreamSource listing + checkpoint
                                       (once-per-file; ``replay_all`` below
                                       reproduces bug-compatible re-ingestion)
  60 s poll sleep                   -> trigger(processingTime="60 seconds")
  CHUNK_SIZE=10 + 20 s sleep        -> micro-batch boundaries; the 0.5 rows/s
                                       throttle is deliberately NOT reproduced
  per-row Avro datum                -> sinks.encode.avro_value_frame
  keyless Kafka produce + flush     -> Kafka sink, epoch-committed
  skip-and-log on bad record        -> per-row skip in the encode fallback /
                                       PERMISSIVE scan (strictly narrower
                                       blast radius than the reference's
                                       drop-rest-of-chunk, app.py:157-158)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..config import EngineConfig, load_config
from ..sinks.encode import avro_value_frame
from ..sources.csv_source import read_reclamacoes_batch, read_reclamacoes_stream


def build_ingest_stream(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    config: EngineConfig | None = None,
    sink: str = "kafka",
    output_path: str | None = None,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Start the ingestion stream.

    sink="kafka": production parity (requires the spark-sql-kafka package and
    a broker).  sink="parquet": broker-less fallback — writes the same
    ``value`` binary column to parquet files (used by tests and for replay /
    backfill audits).  sink="memory": in-memory table for assertions.
    """
    cfg = config or load_config()
    bronze = read_reclamacoes_stream(
        spark, source_path, max_files_per_trigger=cfg.chunk_size
    )
    encoded = avro_value_frame(bronze)
    trigger = trigger_seconds if trigger_seconds is not None else cfg.process_interval_seconds

    writer = (
        encoded.writeStream.option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger} seconds")
    )
    if sink == "kafka":
        cfg.validate_for_ingest()
        return (
            writer.format("kafka")
            .option("kafka.bootstrap.servers", cfg.kafka_bootstrap_servers)
            .option("topic", cfg.kafka_topic)
            .start()
        )
    if sink == "parquet":
        if not output_path:
            raise ValueError("output_path required for parquet sink")
        return writer.format("parquet").option("path", output_path).start()
    if sink == "foreachBatch":
        if not output_path:
            raise ValueError("output_path required for foreachBatch sink")

        def write_with_audit(batch_df: DataFrame, epoch_id: int) -> None:
            # Transactional-ish pattern: write the payload, then append one
            # audit row per epoch (epoch_id makes redeliveries idempotent
            # on the audit side too).
            batch_df.persist()
            batch_df.write.mode("append").parquet(f"{output_path}/data")
            spark_b = batch_df.sparkSession
            spark_b.createDataFrame(
                [(int(epoch_id), batch_df.count())], "epoch_id long, n_rows long"
            ).write.mode("append").parquet(f"{output_path}/audit")
            batch_df.unpersist()

        return writer.foreachBatch(write_with_audit).start()
    if sink == "memory":
        return writer.format("memory").queryName("reclamacoes_ingest").start()
    raise ValueError(f"unknown sink {sink!r}")


def replay_all_batch(spark: SparkSession, source_path: str) -> DataFrame:
    """Bug-compatible replay mode: encode EVERY file currently present,
    regardless of checkpoint state — one cycle of the reference's
    re-ingest-forever loop (``app.py:176-196``), on demand instead of
    unbounded."""
    return avro_value_frame(read_reclamacoes_batch(spark, source_path))
