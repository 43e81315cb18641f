"""Isolated interleaved query timing — the optimization-round A/B harness.

Times each named bench/registered query through the noop sink (full
materialization, guide §1.4), min-of-N with cache cleared between reps,
inside ONE warm session so host noise hits both variants alike.

Usage:
    python tools/ab_time.py [-n REPS] [--ab VAR=a,b] query [query ...]

Without --ab: prints {"query": min_sec, ...} for the named queries.
With --ab VAR=a,b: for each rep, runs every query once with VAR=a and once
with VAR=b (interleaved A/B/A/B...), and prints per-variant minima side by
side.  The operator code must read VAR at builder-call time for this to
toggle behavior.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_ex8_producer_spark.plans.registry import all_specs  # noqa: E402
from data_ingestion_ex8_producer_spark.session import build_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    ab_var, ab_vals = None, None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--ab":
            ab_var, vals = args[i + 1].split("=", 1)
            ab_vals = vals.split(",")
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab_time")
    specs = all_specs()
    missing = [n for n in names if n not in specs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    variants = ab_vals if ab_var else [None]

    # Warm-up: one run per (query, variant) at the smallest SF (JVM/codegen
    # warm-up, same discipline as bench.py).
    for name in names:
        for v in variants:
            if ab_var:
                os.environ[ab_var] = v
            try:
                specs[name].builder(spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception:  # noqa: BLE001
                pass
            spark.catalog.clearCache()

    best: dict[tuple[str, str | None], float] = {}
    for _ in range(reps):
        for name in names:
            for v in variants:
                if ab_var:
                    os.environ[ab_var] = v
                t0 = time.perf_counter()
                specs[name].builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = time.perf_counter() - t0
                key = (name, v)
                best[key] = min(best.get(key, el), el)
                spark.catalog.clearCache()

    if ab_var:
        out = {
            n: {v: round(best[(n, v)], 3) for v in variants} for n in names
        }
    else:
        out = {n: round(best[(n, None)], 3) for n in names}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
