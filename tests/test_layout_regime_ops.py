"""Targeted invariants for the r8 layout/regime/association batch
(q_zorder_layout, q_cusum_changepoint, q_daily_autocorr,
q_item_pmi_similarity, q_gopher_rules, q_lexical_diversity) beyond the
generic oracle differential in test_queries_oracle.py: the properties the
operators CLAIM (Morton locality, CUSUM closure, Pearson bounds, PMI
gates) rather than just engine parity.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_ingestion_ex8_producer_spark.operators.scale_patterns import (
    _morton,
    _sql_morton,
    _Z_CELL_SHIFT,
)
from data_ingestion_ex8_producer_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _py_morton(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


SAMPLES = [(0, 0), (1, 0), (0, 1), (65535, 65535), (1234, 4321), (255, 256)]


def test_morton_spark_matches_python_reference(spark) -> None:
    df = spark.createDataFrame(SAMPLES, "x int, y int").select(
        "x", "y", _morton(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _py_morton(r.x, r.y), (r.x, r.y)


def test_morton_sql_matches_python_reference() -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE s (x INTEGER, y INTEGER)")
    con.executemany("INSERT INTO s VALUES (?, ?)", SAMPLES)
    rows = con.execute(
        f"SELECT x, y, {_sql_morton('x', 'y')} AS z FROM s"
    ).fetchall()
    for x, y, z in rows:
        assert z == _py_morton(x, y), (x, y)


def test_zorder_cells_are_aligned_boxes(spark) -> None:
    """A z-cell at shift {16} is exactly an aligned 256 x 256 box: every
    member's high bits agree with the cell, so both reported spans are
    bounded by 256 — the file-skipping property the report exists to
    measure."""
    side = 1 << (_Z_CELL_SHIFT // 2)  # 256
    rows = all_specs()["q_zorder_layout"].builder(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.min_cust >> 8 == r.max_cust >> 8
        assert r.min_day >> 8 == r.max_day >> 8
        assert r.cust_span <= side and r.day_span <= side


def test_cusum_trace_closes_at_zero(spark) -> None:
    """Residuals n_d*D - N sum to exactly zero over all days, so the last
    CUSUM value must be 0 and exactly one contiguous peak set is
    flagged."""
    rows = sorted(
        all_specs()["q_cusum_changepoint"].builder(spark, SF).collect(),
        key=lambda r: r.day,
    )
    assert rows[-1].cusum_scaled == 0
    assert sum(r.is_changepoint for r in rows) >= 1


def test_daily_autocorr_bounds(spark) -> None:
    rows = all_specs()["q_daily_autocorr"].builder(spark, SF).collect()
    assert sorted(r.lag for r in rows) == list(range(1, 8))
    for r in rows:
        assert r.var_x >= 0 and r.var_y >= 0
        if r.r is not None:
            assert -1.0 - 1e-12 <= r.r <= 1.0 + 1e-12


def test_item_pmi_gates_hold(spark) -> None:
    from data_ingestion_ex8_producer_spark.operators._util import (
        persisted_scope,
    )

    with persisted_scope():  # the builder persists its basket relation
        rows = all_specs()["q_item_pmi_similarity"].builder(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p1 < r.p2
        assert r.c_ab >= 2
        assert r.pmi_scaled > 1000  # PMI > 0 in milli-units
        assert r.c_ab <= min(r.c_a, r.c_b)


def test_gopher_census_is_consistent(spark) -> None:
    rows = all_specs()["q_gopher_rules"].builder(spark, SF).collect()
    assert rows
    for r in rows:
        for f in (
            r.fail_wordcount,
            r.fail_meanlen,
            r.fail_alpha,
            r.fail_stopword,
            r.fail_symbol,
        ):
            assert 0 <= f <= r.n_docs
        assert 0 <= r.n_pass_all <= r.n_docs
        # pass-all can never exceed the docs passing any single rule
        assert r.n_pass_all <= r.n_docs - max(
            r.fail_wordcount,
            r.fail_meanlen,
            r.fail_alpha,
            r.fail_stopword,
            r.fail_symbol,
        )


def test_lexical_diversity_buckets(spark) -> None:
    rows = all_specs()["q_lexical_diversity"].builder(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert r.sum_distinct <= r.sum_tokens
        assert 0.0 < r.ttr_micro <= 1.0


@pytest.mark.parametrize(
    "name",
    [
        "q_zorder_layout",
        "q_gopher_rules",
        "q_lexical_diversity",
        "q_cusum_changepoint",
        "q_daily_autocorr",
        "q_item_pmi_similarity",
    ],
)
def test_no_python_udf_in_plan(spark, name: str) -> None:
    """The whole batch claims scan-stage built-in expressions — assert no
    Python evaluation node appears in the physical plan."""
    from data_ingestion_ex8_producer_spark.operators._util import (
        persisted_scope,
    )

    with persisted_scope():  # q_item_pmi_similarity persists its baskets
        plan = (
            all_specs()[name]
            .builder(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------------------------------------
# Warehouse-lifecycle batch (r8): skyline / stats / MV identity / MERGE
# --------------------------------------------------------------------------


def test_pareto_frontier_equals_bruteforce(spark) -> None:
    """The two-phase prefix-max skyline must equal the naive quadratic
    NOT EXISTS at the small scale where the quadratic is feasible."""
    import duckdb

    got = sorted(
        (r.o_orderkey, r.price_c, r.day)
        for r in all_specs()["q_pareto_frontier"].builder(spark, SF).collect()
    )
    want = sorted(
        duckdb.sql(f"""
        WITH pts AS (
            SELECT o_orderkey,
                   CAST(floor(CAST(o_totalprice AS DOUBLE)*100 + 0.5)
                        AS BIGINT) AS pc,
                   CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                        AS BIGINT) AS day
            FROM '{SF}/orders.parquet')
        SELECT o_orderkey, pc, day FROM pts b
        WHERE NOT EXISTS (
            SELECT 1 FROM pts a
            WHERE a.pc <= b.pc AND a.day >= b.day
              AND (a.pc < b.pc OR a.day > b.day))
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_cdc_merge_branches_all_nonempty(spark) -> None:
    rows = {r.action: r for r in
            all_specs()["q_cdc_merge_apply"].builder(spark, SF).collect()}
    assert set(rows) == {"insert", "update", "unchanged"}
    for r in rows.values():
        assert r.n_users > 0 and r.n_events >= r.n_users


def test_incremental_maintenance_identity(spark) -> None:
    """new == old + delta per key, in counts and exact-decimal totals."""
    rows = all_specs()["q_incremental_agg_maintenance"].builder(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_new == r.n_old + r.n_delta
        assert abs(r.total_new - (r.total_old + r.total_delta)) == 0.0


def test_table_stats_profile_sanity(spark) -> None:
    rows = {r.column_name: r for r in
            all_specs()["q_table_stats_profile"].builder(spark, SF).collect()}
    assert set(rows) == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    for r in rows.values():
        assert r.n_distinct <= r.n_rows - r.n_nulls
        assert r.min_value <= r.mcv_value <= r.max_value
        assert 1 <= r.mcv_count <= r.n_rows
    assert rows["l_quantity"].n_distinct == 50  # TPC-H quantity domain 1..50
