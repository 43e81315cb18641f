"""CLI entry point — the engine's equivalent of the reference daemon
(``python -m ex8_producer.app``, ``app.py:199-215``):

    python -m data_ingestion_ex8_producer_spark [--sink kafka|parquet]
        [--source PATH] [--checkpoint PATH] [--output PATH] [--replay]

Reads the same environment variables as the reference (S3 bucket/prefix,
Kafka bootstrap/topic, AWS creds — see config.py), validates them up front
(same fatal-on-missing contract as ``app.py:202-203``), starts the
checkpointed ingestion stream, and blocks until terminated.
"""

from __future__ import annotations

import argparse
import sys

from .config import load_config
from .session import build_session
from .streaming.ingest import build_ingest_stream, replay_all_batch


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="data_ingestion_ex8_producer_spark")
    parser.add_argument("--sink", choices=["kafka", "parquet"], default="kafka")
    parser.add_argument("--source", help="override source path (default: s3a bucket/prefix from env)")
    parser.add_argument("--checkpoint", default="_checkpoints/ingest")
    parser.add_argument("--output", help="output path (parquet sink only)")
    parser.add_argument(
        "--replay", action="store_true",
        help="bug-compatible one-shot replay of every file currently present",
    )
    args = parser.parse_args(argv)

    cfg = load_config()
    source = args.source or cfg.source_path
    spark = build_session("ex8-ingest")

    if args.replay:
        n = replay_all_batch(spark, source).count()
        print(f"replayed {n} records from {source}")
        return 0

    query = build_ingest_stream(
        spark,
        source,
        args.checkpoint,
        config=cfg,
        sink=args.sink,
        output_path=args.output,
    )
    query.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
