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

    # N timed runs per query, report the min: the host shares cores with
    # other tenants and single runs vary ±15%; the min is the steady-state
    # cost of the plan, which is what the engine controls.  Default 5 reps
    # (the r2→r3 regression investigation, BENCH_NOTES.md, showed 3-rep
    # minima still straddle the host-noise band while 5-rep minima are
    # stable); lower via SPARK_GRAFT_BENCH_REPS for quick iteration runs.
    reps = int(os.getenv("SPARK_GRAFT_BENCH_REPS", "5"))
    timings: dict[str, float] = {}
    for _ in range(reps):
        for name in sorted(specs):
            t0 = time.perf_counter()
            specs[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)
            # Queries that persist() intermediates (capped-shingle dedup,
            # minhash signatures) must not serve a later query or rep from
            # this run's cache — every timed run starts cache-cold.
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "ingest_rows_per_sec": _ingest_throughput(spark, reps=reps),
            }
        )
    )
    spark.stop()


def _ingest_throughput(spark, n_rows: int = 100_000, reps: int = 3) -> float:
    """Rows/s through the full reference-parity ingest pipeline (CSV scan ->
    sanitize -> whitelist -> empty→null -> per-row Avro datum), measured on a
    generated ;/ISO-8859-1 landing file.  Directly comparable to the
    reference's engineered ceiling of 0.5 rows/s (BASELINE.md: CHUNK_SIZE=10
    rows per 20 s sleep)."""
    import shutil
    import tempfile

    from data_ingestion_ex8_producer_spark.sinks.encode import avro_value_frame
    from data_ingestion_ex8_producer_spark.sources.csv_source import (
        read_reclamacoes_batch,
    )

    header = (
        "Ano;Trimestre;Categoria;Tipo;CNPJ IF;Instituição financeira;Índice;"
        "Quantidade de reclamações reguladas procedentes;"
        "Quantidade de reclamações reguladas - outras;"
        "Quantidade de reclamações não reguladas;"
        "Quantidade total de reclamações;"
        "Quantidade total de clientes  CCS e SCR;"
        "Quantidade de clientes  CCS;Quantidade de clientes  SCR"
    )
    d = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        with open(
            os.path.join(d, "reclamacoes.csv"), "w", encoding="iso-8859-1"
        ) as fh:
            fh.write(header + "\n")
            for i in range(n_rows):
                fh.write(
                    f"2024;{1 + i % 4}º;Bancos;Banco Múltiplo;{i:08d};"
                    f"BANCO {i};{i % 90},{i % 100:02d};{i % 50};{i % 7};"
                    f"{i % 11};{i % 60};{1000 + i};{i};{i % 997}\n"
                )
        # Warm-up on a prefix so the timed runs measure steady-state; same
        # min-of-N discipline as the query set (shared-host variance).
        avro_value_frame(read_reclamacoes_batch(spark, d).limit(1000)).write.format(
            "noop"
        ).mode("overwrite").save()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            avro_value_frame(read_reclamacoes_batch(spark, d)).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(n_rows / best, 1)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
