"""Machine-check the approximate-sketch queries that have no SQL oracle
(sketch estimates are engine-specific, so the driver only row-counts them):
the estimates must land within a tight relative error of the exact answers
computed by the same engine.  HLL++ at rsd=0.01 and percentile_approx at
accuracy=10000 are both far inside 5% on this data; a 5% gate catches any
regression that swaps or mis-parameterizes the sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_ex8_producer_spark.plans.registry import all_specs
from data_ingestion_ex8_producer_spark.operators._util import t

SF = "/root/testdata/sf0.001"
REL_TOL = 0.05


def _rel_err(approx: float, exact: float) -> float:
    return abs(approx - exact) / max(abs(exact), 1.0)


def test_approx_distinct_within_tolerance(spark) -> None:
    approx = {
        r["l_returnflag"]: r
        for r in all_specs()["q_approx_distinct"].builder(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in (
            t(spark, SF, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.countDistinct("l_partkey").alias("exact_parts"),
                F.countDistinct("l_orderkey").alias("exact_orders"),
            )
            .collect()
        )
    }
    assert approx.keys() == exact.keys()
    for flag, row in approx.items():
        for a_col, e_col in (
            ("approx_parts", "exact_parts"),
            ("approx_orders", "exact_orders"),
        ):
            err = _rel_err(row[a_col], exact[flag][e_col])
            assert err <= REL_TOL, (
                f"{flag}.{a_col}: approx {row[a_col]} vs exact "
                f"{exact[flag][e_col]} (rel err {err:.4f})"
            )


def test_approx_percentile_within_tolerance(spark) -> None:
    approx = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in all_specs()["q_approx_percentile"].builder(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r["exact_quantiles"]
        for r in (
            t(spark, SF, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.expr(
                    "percentile(l_extendedprice, array(0.5, 0.9, 0.99))"
                ).alias("exact_quantiles")
            )
            .collect()
        )
    }
    assert approx.keys() == exact.keys()
    for flag, quantiles in approx.items():
        for q_label, a, e in zip(("p50", "p90", "p99"), quantiles, exact[flag]):
            err = _rel_err(a, e)
            assert err <= REL_TOL, (
                f"{flag}.{q_label}: approx {a} vs exact {e} (rel err {err:.4f})"
            )
