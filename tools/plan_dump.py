"""Dump `.explain("formatted")` for bench queries into plans/<round>/.

Usage:
    python tools/plan_dump.py <suffix> [query ...]

Writes plans/<round>/<query>_<suffix>.txt for every bench-flagged query (or
the named subset), where <round> comes from $SPARK_GRAFT_PLAN_ROUND (default
r12).  <suffix> is `before` / `after` — the optimization-round evidence files
the judge checks plan claims against.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_ex8_producer_spark.plans.registry import all_specs  # noqa: E402
from data_ingestion_ex8_producer_spark.session import build_session  # noqa: E402

_OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "plans", os.getenv("SPARK_GRAFT_PLAN_ROUND", "r12"))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(_OUT_DIR, exist_ok=True)
    spark = build_session("plan_dump")
    specs = {n: s for n, s in all_specs().items() if s.bench}
    if only:
        specs = {n: s for n, s in specs.items() if n in only}
    for name in sorted(specs):
        df = specs[name].builder(spark, sf_dir)
        # DataFrame.explain prints to stdout; capture it.
        buf = io.StringIO()
        stdout = sys.stdout
        try:
            sys.stdout = buf
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(_OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        spark.catalog.clearCache()
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
