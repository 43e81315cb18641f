"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced through the noop sink (full materialization — a count()
would let Catalyst prune the computed columns and under-report work).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_ex8_producer_spark.plans.registry import all_specs
from data_ingestion_ex8_producer_spark.session import build_session


def main() -> None:
    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1).rstrip(".")) if match else -1.0

    spark = build_session("bench")
    specs = {n: s for n, s in all_specs().items() if s.bench}

    # Warm-up, outside the timed region: run the whole headline set once at
    # the smallest SF so JVM/codegen/broadcast machinery is initialized and
    # the timed numbers reflect steady-state per-query cost (first-query
    # session warm-up otherwise lands on whichever query runs first).
    warm_dir = "/root/testdata/sf0.001"
    for name in sorted(specs):
        try:
            specs[name].builder(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 — warm-up must never fail the bench
            pass
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in sorted(specs):
        t0 = time.perf_counter()
        specs[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
