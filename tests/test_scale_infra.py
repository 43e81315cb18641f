"""Scale-infrastructure behaviors that don't fit the query registry:
bucketed co-located joins (no shuffle), corrupt-record quarantine, and the
partitioned silver layer with partition pruning.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_bucketed_join_has_no_shuffle(spark, tmp_path: Path) -> None:
    """Bucketing both fact tables on the join key co-locates matching rows:
    the sort-merge join runs without any Exchange (shuffle) — the physical
    plan every big fact-fact join should have at 100 TB."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bt_lineitem")
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bt_orders")
    )
    joined = (
        spark.table("bt_lineitem")
        .join(
            spark.table("bt_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # No shuffle may appear between the two bucketed scans and the join.
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # And the result is right.
    got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
    expected = {
        r["o_orderstatus"]: r["n"]
        for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_json_corrupt_record_quarantine(spark, tmp_path: Path) -> None:
    """PERMISSIVE scan + columnNameOfCorruptRecord: bad records land in a
    quarantine column instead of killing the file — the engine's replacement
    for the reference's log-and-abandon-file error policy (app.py:136-139)."""
    path = tmp_path / "events.json"
    path.write_text(
        '{"event_id": 1, "value": 10.5}\n'
        "this is not json at all\n"
        '{"event_id": 2, "value": null}\n'
        '{"event_id": 3, "value": "NaN-ish"}\n'
    )
    df = (
        spark.read.schema("event_id bigint, value double, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(str(path))
    )
    # Spark disallows filtering on ONLY the corrupt-record column of a raw
    # scan; cache() (the documented workaround) materializes it first.
    df = df.cache()
    rows = df.collect()
    good = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert {r["event_id"] for r in good} == {1, 2}
    assert len(bad) == 2  # the garbage line and the type-mismatched line
    # Quarantine split: the pipeline writes these to a dead-letter sink.
    assert df.filter(F.col("_corrupt").isNotNull()).count() == 2
    df.unpersist()


def test_silver_layer_partitioned(spark, tmp_path: Path) -> None:
    """Silver view: typed casts realizing the reference's dead-code type map
    (settings.py:22-37), written partitioned by year with partition pruning
    verified in the scan."""
    from data_ingestion_ex8_producer_spark.schemas import BRONZE_SCHEMA, silver_columns

    bronze = spark.createDataFrame(
        [
            ("2023", "2º", "Cat", "T", None, "BANCO A", "25,74",
             "10", "4", "7", "21", "1000", "600", "400"),
            ("2024", "1º", "Cat", "T", "123", "BANCO B", "9,10",
             "1", None, None, "1", "50", None, None),
        ],
        BRONZE_SCHEMA,
    )
    silver = bronze.select(*silver_columns())
    out = tmp_path / "silver"
    silver.write.partitionBy("ano").parquet(str(out))

    back = spark.read.parquet(str(out)).filter(F.col("ano") == 2024)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # pruning reaches the scan
    row = back.collect()[0]
    assert row["instituicao_financeira"] == "BANCO B"
    assert float(row["indice"]) == 9.10  # decimal-comma parsed
    assert str(row["quarter_start"]) == "2024-01-01"
    assert row["quantidade_total_de_reclamacoes"] == 1  # int cast

    shutil.rmtree(out)


@pytest.mark.slow
def test_aqe_splits_skewed_join_partition(spark) -> None:
    """AQE skew-join: a sort-merge join with one hot key gets its oversized
    partition split at runtime (the final adaptive plan marks the join
    skew=true) and still returns exact results.  This is the no-code-change
    answer to key skew at 100 TB; salting (q_salted_agg) remains for engines
    or joins AQE can't rewrite."""
    skew_conf = {
        # Force the skew machinery to consider our tiny test partitions.
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "16",
    }
    old = {k: spark.conf.get(k, None) for k in skew_conf}
    for k, v in skew_conf.items():
        spark.conf.set(k, v)
    try:
        # 150k rows on one hot key (wide payload so shuffle bytes, not row
        # count, trip the threshold) + a uniform tail over 100 keys.
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") < 150_000, F.lit(7)).otherwise(F.col("id") % 100)
            .alias("k"),
            F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
        )
        # Keyless aggregate downstream: a groupBy(k) right above the join
        # would require hashpartitioning(k) and make AQE decline the split
        # (split partitions duplicate build rows, breaking that guarantee).
        joined = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k") == 7, 1).otherwise(0)).alias("hot_n"),
        )
        row = joined.collect()[0]
        assert row["hot_n"] == 150_000 + 500  # hot key + its uniform-tail share
        assert row["n"] == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_join_pruning(spark) -> None:
    """Runtime row-group filtering for selective dim joins: with AQE's
    runtime bloom filter enabled, a selective filter on the dim side injects
    a BloomFilterMightContain predicate into the FACT side's scan stage —
    the mechanism that keeps a 100 TB fact scan from reading rows whose join
    keys cannot match.  (Thresholds are lowered only to trigger the
    optimization at test scale.)"""
    from data_ingestion_ex8_producer_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # production default is 10GB — the fact side must be big enough to be
        # worth filtering; at test scale it is 13MB, so lower the bar
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join so the filter has a stage boundary to cross
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF, "lineitem")
        p = load_table(spark, SF, "part").filter(F.col("p_brand") == "Brand#3")
        joined = li.join(p, li.l_partkey == p.p_partkey).groupBy("p_brand").count()
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "bloom_filter" in plan.lower() or "BloomFilterMightContain" in plan, plan
        # and the result is still correct
        rows = joined.collect()
        assert len(rows) == 1 and rows[0]["p_brand"] == "Brand#3"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observe_metrics_on_ingest_path(spark) -> None:
    """df.observe(): accumulator-style data-quality counters collected as a
    side effect of the normal action — the zero-extra-pass way to audit row
    counts / null rates on a 100 TB pipeline run."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from data_ingestion_ex8_producer_spark.sources.tables import load_table

    obs = Observation("ingest_audit")
    li = load_table(spark, SF, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.max("l_shipdate").alias("max_shipdate"),
    )
    n = li.filter(F.col("l_quantity") > 0).count()
    got = obs.get
    assert got["n_rows"] >= n
    assert got["null_qty"] == 0
    assert got["max_shipdate"] is not None


def test_orc_roundtrip_with_pushdown(spark, tmp_path: Path) -> None:
    """ORC source/sink: write lineitem to ORC, read it back identically, and
    verify the filter is pushed into the ORC scan (pushed-filter predicate in
    the physical plan) — same scan-level pruning posture as parquet."""
    from data_ingestion_ex8_producer_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem")
    dest = str(tmp_path / "lineitem_orc")
    li.write.mode("overwrite").orc(dest)

    back = spark.read.orc(dest)
    assert back.count() == li.count()
    a = li.agg(F.sum(F.col("l_quantity").cast("decimal(12,4)")).alias("s")).collect()[0]["s"]
    b = back.agg(F.sum(F.col("l_quantity").cast("decimal(12,4)")).alias("s")).collect()[0]["s"]
    assert a == b

    filtered = back.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters: [", 1)[1][:200]
    assert filtered.count() > 0


def test_hll_sketch_mergeable(spark) -> None:
    """HLL sketches are mergeable partial aggregates: per-nation customer
    sketches union-merged to a single global estimate — the property that
    makes distinct-count roll-ups single-pass at 100 TB (pre-aggregate once,
    merge at any granularity later, never rescan)."""
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    exact = cust.select("c_custkey").distinct().count()
    assert abs(merged - exact) / exact < 0.05


def test_range_partitioned_layout_enables_pruning(spark, tmp_path: Path) -> None:
    """Sorted data layout: repartitionByRange + sortWithinPartitions on the
    filter column produces files with disjoint min/max ranges, so a date
    filter can skip whole files/row-groups from footer statistics alone —
    the write-side half of predicate pushdown at 100 TB."""
    import pyarrow.parquet as pq

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    dest = tmp_path / "li_ranged"
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(str(dest))
    )
    spans = []
    for f in sorted(dest.glob("part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["l_shipdate"]
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append((lo, hi))
    assert len(spans) >= 4
    spans.sort()
    overlaps = sum(1 for (_, hi1), (lo2, _) in zip(spans, spans[1:]) if hi1 > lo2)
    assert overlaps == 0, f"file ranges overlap: {spans}"
