"""Differential oracle tests at sf0.001 (fast twin of the driver's sf0.01
gate): every registered query with an oracle must match DuckDB exactly;
rows-only queries must at least execute and keep a stable schema.
"""

from __future__ import annotations

import duckdb
import pytest

from data_ingestion_ex8_producer_spark.plans.registry import all_specs
from tools.check_correctness import TABLES, frame_fingerprint

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')"
        )
    yield con
    con.close()


SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, oracle, name: str) -> None:
    spec = SPECS[name]
    sdf = spec.builder(spark, SF)
    s_fp = frame_fingerprint(list(sdf.columns), [tuple(r) for r in sdf.collect()])
    if spec.oracle is None:
        assert len(sdf.columns) > 0
        return
    cur = oracle.execute(spec.oracle)
    o_fp = frame_fingerprint([d[0] for d in cur.description], cur.fetchall())
    assert s_fp[0] == o_fp[0], f"row count {s_fp[0]} != {o_fp[0]}"
    assert s_fp[1] == o_fp[1], f"columns {s_fp[1]} != {o_fp[1]}"
    assert s_fp[2] == o_fp[2], "value-hash mismatch"
