"""Python DataSource (`reclamacoes_poll`) semantics: batch parity with the
built-in CSV scan, once-per-file streaming, and the bug-compatible replay
mode reproducing the reference's stateless re-ingest loop (`app.py:176-196`).
"""

from __future__ import annotations

import time
from pathlib import Path

import pytest

from data_ingestion_ex8_producer_spark.sources.csv_source import read_reclamacoes_batch
from data_ingestion_ex8_producer_spark.sources.polling_source import (
    ReclamacoesPollDataSource,
)

from .test_ingest_pipeline import RAW_HEADER, ROWS


@pytest.fixture()
def landing_dir(tmp_path: Path) -> str:
    d = tmp_path / "bucket"
    d.mkdir()
    (d / "reclamacoes_2024.csv").write_bytes(
        ("\n".join([RAW_HEADER, *ROWS]) + "\n").encode("iso-8859-1")
    )
    (d / "notes.txt").write_text("ignored: wrong suffix")
    return str(d)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(ReclamacoesPollDataSource)
    return spark


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_batch_read_matches_builtin_csv_scan(registered, landing_dir: str) -> None:
    spark = registered
    via_ds = spark.read.format("reclamacoes_poll").option("path", landing_dir).load()
    via_csv = read_reclamacoes_batch(spark, landing_dir + "/reclamacoes_2024.csv")
    assert via_ds.columns == via_csv.columns
    assert _rows(via_ds) == _rows(via_csv.select(*via_ds.columns))


def test_batch_read_empty_dir(registered, tmp_path: Path) -> None:
    empty = tmp_path / "empty"
    empty.mkdir()
    df = (
        registered.read.format("reclamacoes_poll")
        .option("path", str(empty))
        .load()
    )
    assert df.count() == 0


def _drain(spark, stream_df, name: str, ckpt: str, n_batches: int) -> None:
    """Run `n_batches` micro-batches of a Python-datasource stream (which has
    no availableNow support) against the memory sink, then stop."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", ckpt)
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if len([p for p in q.recentProgress if p["numInputRows"] >= 0]) >= n_batches:
            break
        time.sleep(0.5)
    q.stop()


def test_stream_once_per_file(registered, landing_dir: str, tmp_path: Path) -> None:
    """Default mode: each file is emitted exactly once across batches (the
    corrected semantics; SURVEY.md §3 delta 1)."""
    spark = registered
    stream = (
        spark.readStream.format("reclamacoes_poll")
        .option("path", landing_dir)
        .option("latency_ms", "0")  # fixture file is brand new; no hold-back
        .load()
    )
    _drain(spark, stream, "poll_once", str(tmp_path / "ck1"), n_batches=3)
    out = spark.sql("SELECT * FROM poll_once")
    assert out.count() == len(ROWS)  # 3 rows, no duplication after 3+ polls


def test_stream_replay_duplicates_every_batch(
    registered, landing_dir: str, tmp_path: Path
) -> None:
    """replay=true: the reference's stateless loop — every poll re-emits
    every file, so counts grow by |rows| per completed batch."""
    spark = registered
    stream = (
        spark.readStream.format("reclamacoes_poll")
        .option("path", landing_dir)
        .option("replay", "true")
        .load()
    )
    _drain(spark, stream, "poll_replay", str(tmp_path / "ck2"), n_batches=3)
    n = spark.sql("SELECT COUNT(*) c FROM poll_replay").collect()[0]["c"]
    assert n >= 2 * len(ROWS)  # at least two full re-ingests observed
    assert n % len(ROWS) == 0  # ... always in whole-file multiples


def test_stream_checkpoint_restart_watermark_offsets(
    registered, landing_dir: str, tmp_path: Path
) -> None:
    """Restart against the same checkpoint: already-ingested files must not
    re-emit (their (mtime, path) keys are at-or-below the committed
    watermark) and a file landed between runs is picked up exactly once.
    Uses a parquet sink — the memory sink does not support checkpoint
    recovery."""
    spark = registered
    ckpt = str(tmp_path / "ck_restart")
    out = str(tmp_path / "restart_out")

    def run(n_batches: int) -> None:
        q = (
            spark.readStream.format("reclamacoes_poll")
            .option("path", landing_dir)
            .option("latency_ms", "0")  # test files are brand new
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline and len(q.recentProgress) < n_batches:
            time.sleep(0.5)
        q.stop()

    run(n_batches=2)
    assert spark.read.parquet(out).count() == len(ROWS)

    # New file lands while the stream is DOWN.
    late = Path(landing_dir) / "reclamacoes_late.csv"
    late.write_bytes(("\n".join([RAW_HEADER, *ROWS]) + "\n").encode("iso-8859-1"))

    run(n_batches=2)
    total = spark.read.parquet(out).count()
    assert total == 2 * len(ROWS), (
        "restart must emit exactly the late file's rows once "
        f"(got {total}, expected {2 * len(ROWS)})"
    )
