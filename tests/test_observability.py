"""Inline observed-metrics telemetry (observability.py): the counters ride
the SAME action as the query — verified by comparing against explicit
aggregates — in both batch (Observation) and streaming (observedMetrics on
the progress event + MetricsRecorder listener) modes."""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import functions as F

from data_ingestion_ex8_producer_spark.observability import (
    MetricsRecorder,
    observed,
    quality_metrics,
)

SF = "/root/testdata/sf0.001"


def test_batch_observation_matches_explicit_aggregates(spark):
    """Observation metrics == a separate aggregation pass, and they arrive
    from the SAME action (one count() drives both the result and the
    metrics)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df, obs = observed(docs, "docs_quality", *quality_metrics("text", "lang"))
    n = df.count()  # the one action; metrics ride it
    got = obs.get
    assert got["n_rows"] == n
    expected = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.sum(F.col("lang").isNull().cast("long")).alias("null_lang"),
    ).collect()[0]
    assert got["n_rows"] == expected["n_rows"]
    assert got["null_text"] == expected["null_text"]
    assert got["null_lang"] == expected["null_lang"]


def test_streaming_observed_metrics_reach_the_listener(spark, tmp_path: Path):
    """Streaming observe: per-micro-batch metrics surface on the progress
    events and the MetricsRecorder listener captures them; the summed
    n_rows across batches equals the corpus row count."""
    import shutil

    in_dir = tmp_path / "obs_in"
    in_dir.mkdir()
    raw = spark.read.parquet(f"{SF}/embeddings.parquet")
    for i, pred in enumerate(("vec_id % 2 = 0", "vec_id % 2 = 1")):
        raw.filter(pred).coalesce(1).write.parquet(str(tmp_path / f"o{i}"))
        part = next((tmp_path / f"o{i}").glob("part-*.parquet"))
        shutil.move(str(part), str(in_dir / f"o{i}.parquet"))

    recorder = MetricsRecorder()
    spark.streams.addListener(recorder)
    try:
        stream = (
            spark.readStream.schema(raw.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir))
        )
        df, obs = observed(
            stream, "emb_quality", *quality_metrics("embedding")
        )
        assert obs is None  # streams can't carry a blocking Observation
        q = (
            df.writeStream.format("memory")
            .queryName("obs_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "obs_ckpt"))
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        # Listener callbacks are async — give the bus a moment to drain.
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = [m for m in recorder.metrics if m[0] == "emb_quality"]
            if sum(r[2]["n_rows"] for r in rows) >= raw.count():
                break
            time.sleep(0.5)
        rows = [m for m in recorder.metrics if m[0] == "emb_quality"]
        assert rows, "no observed metrics reached the listener"
        assert sum(r[2]["n_rows"] for r in rows) == raw.count()
        total_nulls = sum(r[2]["null_embedding"] for r in rows)
        expected_nulls = raw.filter(F.col("embedding").isNull()).count()
        assert total_nulls == expected_nulls
    finally:
        spark.streams.removeListener(recorder)
