"""Focused pins for internals the r11 optimization round restructured —
each test proves the optimized form computes exactly what the prior form
computed (the oracle gate pins the end-to-end outputs; these pin the
internal contracts the optimizations rely on).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ivf_centroid_rows_fused_and_overflow_paths_agree(spark) -> None:
    """_ivf_centroid_rows fuses the K(n) count into the selection collect
    when the corpus fits under the ladder-floor probe (one job), and falls
    back to the exact count-then-collect path above it.  Both paths must
    select the identical centroid set: the K(n) smallest salted-md5 vec_ids
    in centroid_id order."""
    from data_ingestion_ex8_producer_spark.operators import similarity as S

    def reference(emb):
        # The pre-optimization two-job form, inlined verbatim.
        k = S._ivf_k_for(emb.count())
        return sorted(
            emb.select(
                F.col("vec_id").alias("centroid_id"),
                F.col("ed").alias("c_ed"),
                F.col("norm").alias("c_norm"),
                F.md5(
                    F.concat(
                        F.lit(S._IVF_SALT), F.col("vec_id").cast("string")
                    )
                ).alias("_h"),
            )
            .orderBy("_h", "centroid_id")
            .limit(k)
            .drop("_h")
            .collect(),
            key=lambda r: r.centroid_id,
        )

    def check(emb, expect_k):
        got = S._ivf_centroid_rows(emb)
        want = reference(emb)
        assert len(got) == expect_k
        assert [r.centroid_id for r in got] == [r.centroid_id for r in want]
        assert [r.c_ed for r in got] == [r.c_ed for r in want]
        assert [r.c_norm for r in got] == [r.c_norm for r in want]

    # Fused path: the real test corpus sits under the 4096 floor bound.
    check(S._ivf_valid_emb(spark, SF), S._IVF_K)

    # Overflow path: a synthetic corpus above the floor bound (n = 4200 ->
    # the probe overflows, the exact count-then-collect path runs, K = 128).
    n_big = 4200
    big = spark.range(n_big).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(S._DIM)),
            lambda i: (F.col("id") % 97 + i).cast("double"),
        ).alias("ed"),
    )
    big = big.withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("ed"), lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ),
    )
    assert S._ivf_k_for(n_big) == 128
    check(big, 128)


def test_basket_pairs_match_distinct_self_join(spark) -> None:
    """_order_baskets + _basket_pairs must reproduce the pair multiset of
    the previous distinct + self-join on l_orderkey exactly — same ordered
    pairs, same per-pair order counts."""
    from data_ingestion_ex8_producer_spark.operators.analytics_ext import (
        _basket_pairs,
        _order_baskets,
    )
    from data_ingestion_ex8_producer_spark.operators._util import t

    got = {
        (r.u, r.v): r.n
        for r in _basket_pairs(_order_baskets(spark, SF))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    op = (
        t(spark, SF, "lineitem")
        .filter(F.col("l_partkey").isNotNull())
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = op.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("v"))
    want = {
        (r.u, r.v): r.n
        for r in a.join(b, "l_orderkey")
        .filter(F.col("v") > F.col("u"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert all(u < v for (u, v) in got)
