"""Watermark semantics: rows arriving after the watermark has passed their
window are dropped and never revise emitted results (SURVEY.md §5.2 item 5).

Drives two micro-batches through a real streaming aggregation: batch 1
advances the watermark far past an old window; batch 2 delivers a late row
into that old window.  In append mode the old window's result must reflect
ONLY batch 1 — the late row is discarded, its state already reclaimed.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from pyspark.sql import functions as F


def _write_events(spark, path: Path, rows: list[tuple[int, str, int, float]]) -> None:
    """Write ONE parquet FILE at ``path`` (the file-stream source does not
    recurse into the directory-per-dataset layout ``df.write.parquet``
    produces, so the part file is relocated)."""
    import shutil
    import tempfile

    df = spark.createDataFrame(
        [(i, ts, u, v) for i, ts, u, v in rows],
        "event_id long, ts_str string, user_id long, value double",
    ).select(
        "event_id",
        F.col("ts_str").cast("timestamp").alias("ts"),
        "user_id",
        "value",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/out")
        part = next(Path(f"{tmp}/out").glob("part-*.parquet"))
        shutil.move(str(part), str(path))


@pytest.mark.slow
def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path: Path) -> None:
    staging = tmp_path / "stream_in"
    staging.mkdir()
    out_name = "wm_counts"

    # Batch 1: three rows in the 10:00 window, then one at 20:00 that drags
    # the watermark (delay 1h) up to 19:00 — far past the 10:00 window.
    _write_events(
        spark,
        staging / "batch1.parquet",
        [
            (1, "2024-01-01 10:05:00", 1, 1.0),
            (2, "2024-01-01 10:20:00", 1, 1.0),
            (3, "2024-01-01 10:40:00", 2, 1.0),
            (4, "2024-01-01 20:00:00", 2, 1.0),
        ],
    )

    schema = spark.read.parquet(str(staging / "batch1.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(staging))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    query = (
        agg.writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    try:
        # Wait until batch 1 committed and advanced the watermark to 19:00.
        for _ in range(60):
            progress = query.lastProgress
            if (
                progress
                and progress["eventTime"].get("watermark", "1970") >= "2024-01-01T19:00"
            ):
                break
            time.sleep(1)
        else:
            raise AssertionError(f"watermark never advanced: {query.lastProgress}")

        # Batch 2: a LATE row into the long-closed 10:00 window.
        _write_events(
            spark,
            staging / "batch2.parquet",
            [(5, "2024-01-01 10:50:00", 3, 1.0)],
        )
        first_batch = query.lastProgress["batchId"]
        for _ in range(60):
            if (
                query.lastProgress["batchId"] > first_batch
                and query.lastProgress["numInputRows"] == 0
            ):
                break  # the late batch and a follow-up empty batch ran
            time.sleep(1)
    finally:
        query.stop()
        query.awaitTermination(30)

    got = {
        str(r["ws"]): r["n"] for r in spark.sql(f"SELECT * FROM {out_name}").collect()
    }
    # The 10:00 window was finalized with 3 rows; the late event_id=5 must
    # NOT appear (no 4-count revision, no extra emission).
    assert got.get("2024-01-01 10:00:00") == 3, got
