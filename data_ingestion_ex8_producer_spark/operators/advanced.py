"""Advanced relational surface: as-of join, higher-order array/map functions,
ntile windows, by-name/multiset set ops, and two multi-join TPC-H-style
benchmark queries (Q3/Q10 shapes).

None of these exist in the reference (SURVEY.md §2.2 absence matrix — its
only operators are S3-CSV scan, header sanitize, projection, empty→null,
Avro encode, Kafka produce; `app.py:87-196`); they are engine surface
mandated by the build contract.

Scale notes (100 TB posture):

* as-of join: implemented as union + single window pass — ONE shuffle on the
  join key, never the O(|left| x |right-per-key|) expanded candidate join a
  naive `ON a.key = b.key AND b.ts <= a.ts` plan would produce.  This is the
  canonical Spark formulation for point-in-time/as-of semantics.
* higher-order functions run inside codegen over the array without exploding
  rows — no shuffle at all; per-element lambdas stay JVM-side.
* Q3/Q10 are the join-heavy bench anchors: dim filters reach the parquet
  scans (PushedFilters), small sides broadcast, fact-fact joins shuffle on
  their natural keys with AQE handling skew/coalescing at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ._util import persist_tracked, revenue_dec, t

# --------------------------------------------------------------------------
# As-of (point-in-time) join
# --------------------------------------------------------------------------


@register(
    "q_asof_join",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    cand AS (
        SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.click_ts DESC, c.click_id DESC
               ) AS rn
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id AND c.click_ts <= p.ts
    )
    SELECT event_id, user_id, ts,
           click_id AS asof_click_id, click_ts AS asof_click_ts
    FROM cand WHERE rn = 1
    """,
    tags=("join", "asof", "temporal"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event paired with the latest click event by
    the same user at-or-before the purchase time (ties: highest event_id).

    Spark plan: tag both sides, union, ONE window pass per user ordered by
    (ts, side, click_id) carrying `last(click, ignorenulls=True)` — a single
    shuffle on user_id regardless of per-user history length.  The oracle
    spells the same semantics as an expanded join + row_number, which is
    O(candidates) and exactly what we avoid at scale.
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc(), F.col("click_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.last("click_id", ignorenulls=True).over(w).alias("asof_click_id"),
            F.last("click_ts", ignorenulls=True).over(w).alias("asof_click_ts"),
            "side",
        )
        .filter(F.col("side") == 1)
        .drop("side")
    )


# --------------------------------------------------------------------------
# Higher-order array functions (transform / filter / aggregate / zip_with)
# --------------------------------------------------------------------------


@register(
    "q_higher_order_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                   list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a, b) -> a + b) AS l2_sq,
           list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                   list_transform(list_zip(embedding, list_reverse(embedding)),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
               (a, b) -> a + b) AS rev_dot,
           CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
               AS max_abs
    FROM embeddings
    """,
    tags=("scalar", "higher_order", "array"),
)
def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: transform,
    filter, aggregate (left fold), zip_with, array_max — all evaluated
    JVM-side inside codegen, no explode and no shuffle.

    Determinism: per-element float→double casts and products are exact IEEE;
    the fold is an explicitly sequential left fold in BOTH engines (Spark
    `aggregate`, DuckDB `list_reduce` seeded via list_prepend), so double
    sums are bit-identical — no rounding shims needed.
    """
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = F.transform(xd, lambda x: x * x)
    zipped = F.zip_with(xd, F.reverse(xd), lambda x, y: x * y)
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_pos"),
        fold(sq).alias("l2_sq"),
        fold(zipped).alias("rev_dot"),
        F.array_max(F.transform(xd, F.abs)).alias("max_abs"),
    )


# --------------------------------------------------------------------------
# Map functions (map_from_entries / element_at / map_filter / map_values)
# --------------------------------------------------------------------------


@register(
    "q_map_funcs",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           MAX(CASE WHEN event_type = 'click' THEN cnt END) AS n_clicks,
           MAX(CASE WHEN event_type = 'purchase' THEN cnt END) AS n_purchases,
           CAST(SUM(cnt) AS BIGINT) AS total_events,
           CAST(COUNT(*) FILTER (WHERE cnt >= 5) AS BIGINT) AS n_heavy_types
    FROM per GROUP BY user_id
    """,
    tags=("scalar", "map"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a per-user event_type→count map with
    map_from_entries, then read it back via element_at / map_values /
    map_filter / size.  The map is an intra-row structure, so everything
    after the one counting aggregation is shuffle-free; lookups by key are
    independent of the (nondeterministic) collect_list order.
    """
    per = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.element_at("m", F.lit("click")).alias("n_clicks"),
        F.element_at("m", F.lit("purchase")).alias("n_purchases"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("total_events"),
        F.size(F.map_filter("m", lambda _, v: v >= 5)).cast("long").alias(
            "n_heavy_types"
        ),
    )


# --------------------------------------------------------------------------
# ntile window
# --------------------------------------------------------------------------


@register(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(NTILE(4) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey) AS BIGINT) AS balance_quartile,
           CAST(NTILE(10) OVER (
               ORDER BY c_acctbal, c_custkey) AS BIGINT) AS global_decile
    FROM customer
    """,
    tags=("window", "ntile"),
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing: account-balance quartiles within each market segment
    plus global deciles.  Tie order is pinned with the unique c_custkey so
    bucket assignment is deterministic in both engines.  (The global ntile is
    a single-partition window — fine for dim-sized inputs, replaced by
    approx percentile cuts on fact-sized data at scale.)
    """
    c = t(spark, sf_dir, "customer")
    seg = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    glob = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(seg).cast("long").alias("balance_quartile"),
        F.ntile(10).over(glob).cast("long").alias("global_decile"),
    )


# --------------------------------------------------------------------------
# Set ops: by-name union, multiset intersect/except
# --------------------------------------------------------------------------


@register(
    "q_union_by_name",
    oracle="""
    SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment
    FROM customer
    UNION ALL BY NAME
    SELECT s_name AS name, s_acctbal AS acctbal FROM supplier
    """,
    tags=("setop", "union"),
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: customers and suppliers stacked by column NAME
    with allowMissingColumns=True (suppliers have no segment → null), the
    idiomatic way to union tables whose schemas drifted."""
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    supp = t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal")
    )
    return cust.unionByName(supp, allowMissingColumns=True)


@register(
    "q_intersect_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_totalprice < 250000
    INTERSECT ALL
    SELECT o_orderpriority, o_orderstatus FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
    tags=("setop", "intersect"),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): keeps duplicate rows up to the
    minimum multiplicity on each side — distinct from q_intersect's set
    semantics."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") < 250000).select(
        "o_orderpriority", "o_orderstatus"
    )
    b = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "o_orderpriority", "o_orderstatus"
    )
    return a.intersectAll(b)


@register(
    "q_except_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_totalprice < 250000
    EXCEPT ALL
    SELECT o_orderpriority, o_orderstatus FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    tags=("setop", "except"),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): multiplicity-aware subtraction —
    a row appearing 3 times left and 1 time right survives twice."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") < 250000).select(
        "o_orderpriority", "o_orderstatus"
    )
    b = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")).select(
        "o_orderpriority", "o_orderstatus"
    )
    return a.exceptAll(b)


# --------------------------------------------------------------------------
# TPC-H Q3 / Q10 shapes (join-heavy bench anchors)
# --------------------------------------------------------------------------

_Q3_CUTOFF = "1998-06-01"


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(20,4)))
                AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_CUTOFF} 00:00:00'
      AND l_shipdate > TIMESTAMP '{_Q3_CUTOFF} 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "bench"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with selective dim filter, aggregate,
    global top-10 (TakeOrderedAndProject — no full sort materialization).

    Plan shape at scale: the segment filter reaches the customer scan, the
    filtered customer side broadcasts into orders, and only the orders x
    lineitem equi-join shuffles; revenue ties are broken by the unique
    l_orderkey so the LIMIT is deterministic.
    """
    cutoff = F.lit(_Q3_CUTOFF).cast("timestamp")
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_dec()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(20,4)))
                AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "bench"),
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join (two facts + two dims), returned-item
    revenue per customer, top 20.  nation broadcasts (25 rows always);
    the returnflag and orderdate filters push into the fact scans before
    the shuffle join; c_custkey breaks revenue ties deterministically.
    """
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue_dec()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Full outer join
# --------------------------------------------------------------------------


@register(
    "q_full_outer_join",
    oracle="""
    WITH hi_cust AS (
        SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 7000
    ),
    big_orders AS (
        SELECT o_custkey, COUNT(*) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                   AS big_total
        FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, o_custkey, n_big, big_total
    FROM hi_cust FULL OUTER JOIN big_orders ON c_custkey = o_custkey
    """,
    tags=("join", "outer"),
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join between two partially-overlapping sets (high-balance
    customers vs customers with big orders): rows survive from BOTH sides
    with nulls where unmatched — the reconciliation-report join.  At scale a
    full outer cannot broadcast (both sides must be preserved), so it's the
    one join flavor that always shuffles both inputs; AQE still coalesces
    its output."""
    hi_cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey", "c_name")
    )
    big_orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_big"),
            F.sum(F.col("o_totalprice").cast("decimal(12,4)"))
            .cast("double")
            .alias("big_total"),
        )
    )
    return hi_cust.join(
        big_orders, hi_cust.c_custkey == big_orders.o_custkey, "full_outer"
    ).select("c_custkey", "c_name", "o_custkey", "n_big", "big_total")


# --------------------------------------------------------------------------
# Pareto frontier (2-D skyline) via the two-phase distributed prefix max
# --------------------------------------------------------------------------

_SKY_BKT_W = 1 << 20  # price-cents per bucket (~$10k): value-domain bound


@register(
    "q_pareto_frontier",
    oracle="""
    WITH pts AS (
        SELECT o_orderkey,
               CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) AS price_c,
               CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                    AS BIGINT) AS day
        FROM orders
    ),
    grp AS (SELECT price_c, MAX(day) AS gmax FROM pts GROUP BY price_c),
    g2 AS (
        SELECT price_c, gmax,
               COALESCE(MAX(gmax) OVER (
                   ORDER BY price_c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), -1) AS smax
        FROM grp
    )
    SELECT p.o_orderkey, p.price_c, p.day
    FROM pts p JOIN g2 ON g2.price_c = p.price_c
    WHERE g2.smax < p.day AND g2.gmax <= p.day
    """,
    tags=("advanced", "skyline", "pareto", "scale-pattern", "bench"),
    bench=True,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (2-D skyline) of orders under (minimize price,
    maximize recency) — the classic SKYLINE operator (Borzsonyi et al.
    ICDE 2001): an order survives iff no other order is at most as
    expensive AND at least as recent with one strict.  Duplicated
    (price, day) points co-survive (no strict part), matching the
    standard definition.  Price is floor(p*100 + 0.5) integer cents, so
    membership is Class-A integer arithmetic end-to-end.

    The naive plan is the O(n^2) inequality anti-join (measured: 4.7 s
    at sf0.01 in DuckDB, minutes at sf0.1 — the quadratic the operator
    exists to avoid).  For a 2-D skyline the sort-based identity
    dominates: b survives iff max(day | price < price_b) < day_b AND
    max(day | price = price_b) <= day_b, which needs only per-price-group
    maxima and a strict-prefix running max over the price order.  Here
    that prefix max is the repo's two-phase distributed shape (the
    q_concat_chunk_packing doctrine, applied to max instead of sum):
    phase 1 per-price maxima (combinable groupBy), bucketed by the
    value-domain-bounded price range; a metadata-sized per-bucket prefix
    relation broadcasts back; phase 2 runs the within-bucket window at
    parallelism = bucket count.  No pair join exists anywhere; corpus
    volume touches one groupBy and one broadcast-annotated filter scan.
    The oracle states the same identity with DuckDB's single global
    window (single-node, no two-phase needed) — the semantics, not the
    mechanics."""
    pts = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .cast("long")
        .alias("day"),
    )
    # r11-opt note: persisting the per-price maxima for its two consumers
    # was tried and measured 50% SLOWER interleaved (0.98 s vs 1.47 s) —
    # AQE reuses the groupBy exchange at runtime, so the cache write is
    # pure overhead.  Deliberately left unpersisted.
    grp = pts.groupBy("price_c").agg(F.max("day").alias("gmax"))
    grp = grp.withColumn("bkt", F.expr(f"price_c div {_SKY_BKT_W}"))
    # phase 1: per-bucket max; metadata-sized strict-prefix over buckets
    bstats = grp.groupBy("bkt").agg(F.max("gmax").alias("bmax"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bstats.select(
        "bkt", F.coalesce(F.max("bmax").over(w_b), F.lit(-1)).alias("pmax")
    )
    # phase 2: within-bucket strict-prefix running max, offset by pmax
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g2 = (
        grp.join(F.broadcast(prefix), "bkt")
        .withColumn(
            "smax",
            F.greatest(
                F.coalesce(F.max("gmax").over(w_in), F.lit(-1)),
                F.col("pmax"),
            ),
        )
        .select("price_c", "gmax", "smax")
    )
    return (
        pts.join(g2, "price_c")
        .filter((F.col("smax") < F.col("day")) & (F.col("gmax") <= F.col("day")))
        .select("o_orderkey", "price_c", "day")
    )


# --------------------------------------------------------------------------
# ANALYZE-style column statistics profile (the CBO inputs, as a query)
# --------------------------------------------------------------------------

_STATS_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "q_table_stats_profile",
    oracle=f"""
    WITH long_form AS (
        {" UNION ALL ".join(
            f"SELECT '{c}' AS column_name, CAST({c} AS DOUBLE) AS value "
            "FROM lineitem" for c in _STATS_COLS
        )}
    ),
    base AS (
        SELECT column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(value) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM long_form GROUP BY column_name
    ),
    mcv AS (
        SELECT column_name, value AS mcv_value,
               CAST(cnt AS BIGINT) AS mcv_count
        FROM (
            SELECT column_name, value, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY column_name
                       ORDER BY COUNT(*) DESC, value
                   ) AS rn
            FROM long_form WHERE value IS NOT NULL
            GROUP BY column_name, value
        ) WHERE rn = 1
    )
    SELECT b.column_name, b.n_rows, b.n_nulls, b.n_distinct,
           b.min_value, b.max_value, m.mcv_value, m.mcv_count
    FROM base b JOIN mcv m ON m.column_name = b.column_name
    """,
    tags=("advanced", "statistics", "profiling"),
)
def q_table_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE as a registered query: per numeric lineitem column,
    the statistics triple a cost-based optimizer (and every data-quality
    monitor) feeds on — row/null counts, exact NDV, min/max, and the
    most-common-value with its frequency (deterministic under the
    (count DESC, value ASC) tie-break).  Grouping doubles by exact bit
    equality is cross-engine-safe: both engines read the identical
    parquet doubles and never re-derive them.

    Scale shape: the melt is a scan-stage unpivot (rows x 4, no join);
    counts/min/max are one combinable groupBy on a 4-key domain; exact
    NDV and the MCV ride one (column, value) groupBy whose key domain is
    the columns' VALUE domains (quantity: 50, discount/tax: ~10 each —
    catalog-bounded; extendedprice: price-grid-bounded), then a top-1
    WindowGroupLimit per column.  At 100 TB the only volume-scale stage
    is the map-side combine; production engines swap exact NDV for HLL
    (registered separately as q_approx_distinct) when the value domain
    itself grows with the corpus."""
    li = t(spark, sf_dir, "lineitem")
    long_form = li.select(
        F.expr(
            "stack({}, {})".format(
                len(_STATS_COLS),
                ", ".join(
                    f"'{c}', CAST({c} AS DOUBLE)" for c in _STATS_COLS
                ),
            )
        ).alias("column_name", "value")
    )
    base = long_form.groupBy("column_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("value")).cast("long").alias("n_nulls"),
        F.countDistinct("value").cast("long").alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    w = Window.partitionBy("column_name").orderBy(
        F.col("cnt").desc(), F.col("value")
    )
    mcv = (
        long_form.filter(F.col("value").isNotNull())
        .groupBy("column_name", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "column_name",
            F.col("value").alias("mcv_value"),
            F.col("cnt").cast("long").alias("mcv_count"),
        )
    )
    return base.join(mcv, "column_name")


# --------------------------------------------------------------------------
# Data-quality audits: referential integrity and id-sequence integrity
# --------------------------------------------------------------------------
#
# The warehouse-lifecycle family's validation arm: before a table feeds
# joins (or a training pipeline trusts its keys), two audits run on every
# load — do the foreign keys resolve, and is the surrogate-key space
# contiguous?  Both are census reports, not row dumps: the output is
# bounded by the schema graph / the bucket grid, never by violation count.

_FK_EDGES = (
    # child table, child key, parent table, parent key
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _ri_oracle() -> str:
    arms = []
    for ct, ck, pt, pk in _FK_EDGES:
        arms.append(f"""
        SELECT '{ct}.{ck} -> {pt}.{pk}' AS fk_edge,
               CAST(COUNT(*) AS BIGINT) AS n_child_rows,
               CAST(SUM(CASE WHEN {ck} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_null_keys,
               CAST(SUM(CASE WHEN {ck} IS NOT NULL AND {ck} NOT IN
                        (SELECT {pk} FROM {pt} WHERE {pk} IS NOT NULL)
                        THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_orphans
        FROM {ct}""")
    return " UNION ALL ".join(arms)


@register(
    "q_referential_integrity",
    oracle=_ri_oracle(),
    tags=("dq", "join", "audit", "warehouse"),
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity census over the star schema's six FK edges:
    per edge, the child row count, NULL-key count, and orphan count
    (non-null child keys with no parent).  The audit every load runs
    before the table graph is trusted — and the one that explains a
    downstream inner join silently dropping rows.

    Shape: each edge is one left-anti join (broadcast for dimension
    parents, shuffle equi-join for the orders parent — exactly the join
    the workload itself would run) collapsed to a one-row count; output
    is |schema edges| rows at any corpus size.  All counts BIGINT
    (Class A; no float anywhere)."""
    out = None
    for ct, ck, pt, pk in _FK_EDGES:
        # r11-opt: ONE pass per edge — a left join against the
        # deduplicated parent key set answers all three counts at once
        # (the previous anti-join + separate count aggregate scanned the
        # child table twice per edge; with distinct parent keys the left
        # join preserves child cardinality and a NULL parent key IS the
        # orphan predicate, so the counts are identical).
        child = t(spark, sf_dir, ct).select(F.col(ck).alias("_ck"))
        pkeys = t(spark, sf_dir, pt).select(F.col(pk).alias("_pk")).distinct()
        row = (
            child.join(pkeys, F.col("_ck") == F.col("_pk"), "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_child_rows"),
                F.sum(F.when(F.col("_ck").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null_keys"),
                F.sum(
                    F.when(
                        F.col("_ck").isNotNull() & F.col("_pk").isNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_orphans"),
            )
            .select(
                F.lit(f"{ct}.{ck} -> {pt}.{pk}").alias("fk_edge"),
                "n_child_rows",
                "n_null_keys",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_GAP_BUCKET = 1024


@register(
    "q_id_gap_audit",
    oracle=f"""
    WITH b AS (
        SELECT (o_orderkey // {_GAP_BUCKET}) AS bucket,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi
        FROM orders GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(lo AS BIGINT) AS lo,
           CAST(hi AS BIGINT) AS hi,
           CAST(hi - lo + 1 - n_distinct AS BIGINT) AS n_missing,
           CAST(n_rows - n_distinct AS BIGINT) AS n_duplicated
    FROM b
    WHERE hi - lo + 1 - n_distinct > 0 OR n_rows - n_distinct > 0
    UNION ALL
    SELECT CAST(-1 AS BIGINT),
           CAST(SUM(n_rows) AS BIGINT),
           CAST(SUM(n_distinct) AS BIGINT),
           CAST(MIN(lo) AS BIGINT),
           CAST(MAX(hi) AS BIGINT),
           CAST(MAX(hi) - MIN(lo) + 1 - SUM(n_distinct) AS BIGINT),
           CAST(SUM(n_rows) - SUM(n_distinct) AS BIGINT)
    FROM b
    """,
    tags=("dq", "audit", "sequence", "warehouse"),
)
def q_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key sequence integrity WITHOUT a global sort: bucket the
    id space into {1024}-wide cells, and per cell compare span (hi-lo+1)
    against distinct count — the difference is exactly the number of
    missing ids inside the cell, and rows-minus-distinct the duplicated
    ids.  Only defective buckets are emitted, so a healthy 100 TB table
    reports zero rows while a botched backfill pinpoints its id range to
    the bucket.  (Cross-bucket gaps surface in the NEXT bucket's lo or as
    absent buckets — the report is a screen, the bucket id the drill-down
    key.)

    A bucket=-1 summary row (global totals, span, missing, duplicated) is
    always emitted so a healthy table still pins its census in the hash —
    the global n_missing uses the global span, so it ALSO counts ids lost
    in wholly-absent buckets, which per-bucket rows cannot see.

    Shape: one map-side-combinable groupBy on the integer-divided key;
    no window, no sort, no join.  All integers (Class A).  The summary
    aggregate runs over the bucket relation (|id-space|/1024 rows), not
    the table."""
    b = (
        t(spark, sf_dir, "orders")
        .groupBy(F.expr(f"o_orderkey div {_GAP_BUCKET}").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("o_orderkey").cast("long").alias("n_distinct"),
            F.min("o_orderkey").cast("long").alias("lo"),
            F.max("o_orderkey").cast("long").alias("hi"),
        )
    )
    return (
        b.select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows",
            "n_distinct",
            "lo",
            "hi",
            (F.col("hi") - F.col("lo") + 1 - F.col("n_distinct"))
            .cast("long")
            .alias("n_missing"),
            (F.col("n_rows") - F.col("n_distinct"))
            .cast("long")
            .alias("n_duplicated"),
        )
        .filter((F.col("n_missing") > 0) | (F.col("n_duplicated") > 0))
        .unionByName(
            b.agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("n_distinct").cast("long").alias("n_distinct"),
                F.min("lo").cast("long").alias("lo"),
                F.max("hi").cast("long").alias("hi"),
            ).select(
                F.lit(-1).cast("long").alias("bucket"),
                "n_rows",
                "n_distinct",
                "lo",
                "hi",
                (F.col("hi") - F.col("lo") + 1 - F.col("n_distinct"))
                .cast("long")
                .alias("n_missing"),
                (F.col("n_rows") - F.col("n_distinct"))
                .cast("long")
                .alias("n_duplicated"),
            )
        )
    )


# --------------------------------------------------------------------------
# Join-size estimation validation (the CBO's uniform assumption, audited)
# --------------------------------------------------------------------------

_JSE_KEYS = (
    ("l_suppkey", "lineitem"),
    ("l_partkey", "lineitem"),
    ("o_custkey", "orders"),
)


def _jse_oracle() -> str:
    arms = []
    for key, tbl in _JSE_KEYS:
        arms.append(f"""
        SELECT '{tbl}.{key}' AS join_key,
               CAST(n AS BIGINT) AS n_rows,
               CAST(ndv AS BIGINT) AS ndv,
               CAST((n * n) // ndv AS BIGINT) AS est_join_rows,
               CAST(sum_c2 AS BIGINT) AS actual_join_rows,
               CAST(sum_c2 AS DOUBLE) / ((n * n) // ndv) AS amplification
        FROM (
            SELECT SUM(c) AS n, COUNT(*) AS ndv, SUM(c * c) AS sum_c2
            FROM (SELECT COUNT(*) AS c FROM {tbl}
                  WHERE {key} IS NOT NULL GROUP BY {key})
        )""")
    return " UNION ALL ".join(arms)


@register(
    "q_join_size_estimation",
    oracle=_jse_oracle(),
    tags=("dq", "join", "cbo", "skew", "estimation"),
)
def q_join_size_estimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cost-based optimizer's uniform-key assumption, audited against
    ground truth WITHOUT executing any join: for each candidate equi-join
    key, the self-join size the independence estimate predicts
    (n^2 / ndv) beside the EXACT size (sum of squared per-key counts,
    from the same one-pass count relation).  The amplification ratio is
    the number that explains a blown-up shuffle: >> 1 means the key is
    skewed and the optimizer's estimate — and your executor sizing — is
    wrong by exactly that factor.  This is the measure-first dial in
    front of the salting family (q_salted_join / q_key_skew_profile):
    salt when amplification says so, not after the OOM.

    Shape: one map-side-combinable groupBy per key into a three-number
    aggregate — the audit costs one scan per key, never the join it
    predicts.  Counts/NDVs/sums BIGINT with integer-division estimates
    (Class A); amplification is one division of exact integers."""
    out = None
    for key, tbl in _JSE_KEYS:
        c = (
            t(spark, sf_dir, tbl)
            .filter(F.col(key).isNotNull())
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        row = c.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("ndv"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("actual_join_rows"),
        ).select(
            F.lit(f"{tbl}.{key}").alias("join_key"),
            "n_rows",
            "ndv",
            F.expr("(n_rows * n_rows) div ndv").cast("long").alias(
                "est_join_rows"
            ),
            "actual_join_rows",
            (
                F.col("actual_join_rows").cast("double")
                / F.expr("(n_rows * n_rows) div ndv")
            ).alias("amplification"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# Equi-depth histogram (the CBO statistic q_table_stats_profile lacks)
# --------------------------------------------------------------------------
#
# ANALYZE-grade selectivity estimation needs more than min/max/ndv: an
# equi-depth (equal-height) histogram bounds any range predicate's
# selectivity error by 1/B regardless of skew — the reason every serious
# optimizer (and Spark's own CBO via ANALYZE TABLE ... FOR COLUMNS)
# stores one.  Built here exactly, on integer cents, with the repo's
# two-phase prefix-sum discipline so no fact-scale relation ever meets a
# single-partition window.

_EDH_BUCKETS = 16
_EDH_CELL = 16384  # cents per coarse prefix-sum cell (domain-bounded)


@register(
    "q_equidepth_histogram",
    oracle=f"""
    WITH c AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                 AS cents,
               COUNT(*) AS cnt
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
        GROUP BY 1
    ),
    n AS (SELECT SUM(cnt) AS n_total FROM c),
    cum AS (
        SELECT cents, cnt,
               COALESCE(SUM(cnt) OVER (ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
        FROM c
    )
    SELECT CAST((cum_before * {_EDH_BUCKETS}) // n_total AS BIGINT) AS bucket,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS ndv
    FROM cum CROSS JOIN n
    GROUP BY 1
    """,
    tags=("stats", "cbo", "histogram", "warehouse"),
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact {16}-bucket equi-depth histogram of l_extendedprice (integer
    cents): per bucket the value bounds, row count, and distinct-value
    count.  Each distinct value lands wholly in the bucket of its
    cumulative-rows-before prefix — the textbook construction, so bucket
    heights are equal up to the granularity of heavy values and a range
    predicate's selectivity reads off the report with <=1/16 error.

    Exactness: cents via DECIMAL(12,2) quantization (the established
    cross-engine idiom), all counts/prefix sums BIGINT (Class A).

    Scale shape: the value-counts relation is bounded by the DOMAIN (the
    1e-2 price grid), not the corpus — 100x volume only deepens the
    map-side combine (the q_robust_outliers growth mode).  The prefix sum
    over it is two-phase: per-16384-cent-cell totals (a few hundred rows)
    take the only unpartitioned window, then cumulative counts finish
    distributed inside each cell.  Reference has no statistics surface at
    all (SURVEY.md section 2.2)."""
    cents = (
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    counts = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").isNotNull())
        .select(cents)
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cell_tot = counts.groupBy(
        F.expr(f"cents div {_EDH_CELL}").alias("_cell")
    ).agg(F.sum("cnt").alias("_ct"))
    w_cell = Window.orderBy("_cell").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cell_off = cell_tot.select(
        "_cell", F.coalesce(F.sum("_ct").over(w_cell), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_cell").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    n_total = counts.agg(F.sum("cnt").cast("long").alias("_n"))
    cum = (
        counts.withColumn("_cell", F.expr(f"cents div {_EDH_CELL}"))
        .join(F.broadcast(cell_off), "_cell")
        .withColumn(
            "cum_before",
            F.col("_off") + F.coalesce(F.sum("cnt").over(w_in), F.lit(0)),
        )
        .crossJoin(F.broadcast(n_total))
    )
    return (
        cum.groupBy(
            F.expr(f"(cum_before * {_EDH_BUCKETS}) div _n")
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.min("cents").cast("long").alias("lo_cents"),
            F.max("cents").cast("long").alias("hi_cents"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("ndv"),
        )
    )


# --------------------------------------------------------------------------
# Histogram selectivity audit: the estimate, checked against ground truth
# --------------------------------------------------------------------------
#
# The acted-on loop for q_equidepth_histogram (the same close-the-loop
# discipline as q_sq8_recall for the SQ8 index): take the 16-bucket
# histogram the optimizer would store, run the standard
# uniform-within-bucket interpolation for a battery of range predicates,
# and report the estimate BESIDE the exact row count and the error.
# This is the number that justifies (or indicts) trusting the histogram
# for join ordering at 100 TB — measured on the actual data, not assumed.

_HSA_PROBES = (
    # name, lo cents, hi cents (inclusive band on l_extendedprice)
    ("narrow_low", 100_000, 200_000),
    ("mid_band", 2_000_000, 3_000_000),
    ("wide_upper", 5_000_000, 9_000_000),
    ("full_range", 0, 12_000_000),
)


def _hsa_oracle() -> str:
    hist = f"""
        WITH c AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                     AS cents,
                   COUNT(*) AS cnt
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
            GROUP BY 1
        ),
        n AS (SELECT SUM(cnt) AS n_total FROM c),
        cum AS (
            SELECT cents, cnt,
                   COALESCE(SUM(cnt) OVER (ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cum_before
            FROM c
        ),
        hist AS (
            SELECT (cum_before * {_EDH_BUCKETS}) // n_total AS bucket,
                   MIN(cents) AS lo_cents,
                   MAX(cents) AS hi_cents,
                   SUM(cnt) AS n_rows
            FROM cum CROSS JOIN n
            GROUP BY 1
        )"""
    probe_rows = " UNION ALL ".join(
        f"SELECT '{name}' AS probe, CAST({lo} AS BIGINT) AS p_lo,"
        f" CAST({hi} AS BIGINT) AS p_hi"
        for name, lo, hi in _HSA_PROBES
    )
    actual_arms = ", ".join(
        f"SUM(CASE WHEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100"
        f" AS BIGINT) BETWEEN {lo} AND {hi} THEN 1 ELSE 0 END) AS a_{name}"
        for name, lo, hi in _HSA_PROBES
    )
    actual_rows = " UNION ALL ".join(
        f"SELECT '{name}' AS probe, CAST(a_{name} AS BIGINT) AS actual_rows"
        f" FROM a" for name, _lo, _hi in _HSA_PROBES
    )
    return f"""{hist},
    probes AS ({probe_rows}),
    est AS (
        SELECT p.probe,
               SUM((h.n_rows *
                    (LEAST(p.p_hi, h.hi_cents)
                     - GREATEST(p.p_lo, h.lo_cents) + 1))
                   // (h.hi_cents - h.lo_cents + 1)) AS est_rows
        FROM probes p JOIN hist h
          ON h.lo_cents <= p.p_hi AND h.hi_cents >= p.p_lo
        GROUP BY 1
    ),
    a AS (SELECT {actual_arms} FROM lineitem),
    act AS ({actual_rows})
    SELECT act.probe,
           CAST(COALESCE(est.est_rows, 0) AS BIGINT) AS est_rows,
           act.actual_rows,
           CAST((ABS(COALESCE(est.est_rows, 0) - act.actual_rows) * 1000000)
                // GREATEST(1, act.actual_rows) AS BIGINT) AS err_ppm
    FROM act LEFT JOIN est ON act.probe = est.probe
    """


@register(
    "q_histogram_selectivity_audit",
    oracle=_hsa_oracle(),
    tags=("stats", "cbo", "histogram", "selectivity", "audit"),
)
def q_histogram_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selectivity estimates from the 16-bucket equi-depth histogram
    (uniform-within-bucket integer interpolation, the textbook rule)
    beside EXACT row counts for four range probes, with the error in ppm
    — the measured answer to "can the optimizer trust this histogram".
    Equi-depth's guarantee shows up in the numbers: error is bounded by
    the two partial buckets a range clips, ~1/16 of the table worst-case.

    Shape: the histogram build is q_equidepth_histogram's plan (domain-
    bounded two-phase prefix sum); the estimate join is 4 probes x <=16
    buckets of METADATA; exact counts are one conditional-aggregate scan
    pass (4 SUM(CASE)s, no second scan per probe).  All integers; the
    interpolation uses integer division on both engines (Class A)."""
    hist = q_equidepth_histogram(spark, sf_dir).select(
        "bucket", "lo_cents", "hi_cents", "n_rows"
    )
    probes = spark.createDataFrame(
        [(name, lo, hi) for name, lo, hi in _HSA_PROBES],
        "probe string, p_lo long, p_hi long",
    )
    est = (
        probes.join(
            F.broadcast(hist),
            (F.col("lo_cents") <= F.col("p_hi"))
            & (F.col("hi_cents") >= F.col("p_lo")),
        )
        .groupBy("probe")
        .agg(
            F.sum(
                F.expr(
                    "(n_rows * (least(p_hi, hi_cents)"
                    " - greatest(p_lo, lo_cents) + 1))"
                    " div (hi_cents - lo_cents + 1)"
                )
            ).alias("est_rows")
        )
    )
    cents = (
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
    )
    li = t(spark, sf_dir, "lineitem")
    actual = li.agg(
        *[
            F.sum(F.when(cents.between(lo, hi), 1).otherwise(0))
            .cast("long")
            .alias(f"a_{name}")
            for name, lo, hi in _HSA_PROBES
        ]
    )
    # r11-opt: the per-probe rows explode from ONE reference to the 1-row
    # actual-count aggregate — the unionByName loop re-ran the full scan
    # once per probe (|probes| scans -> 1; identical rows).
    act = actual.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("probe"),
                        F.col(f"a_{name}").alias("actual_rows"),
                    )
                    for name, _lo, _hi in _HSA_PROBES
                ]
            )
        ).alias("e")
    ).select("e.probe", "e.actual_rows")
    return (
        act.join(F.broadcast(est), "probe", "left")
        .select(
            "probe",
            F.coalesce(F.col("est_rows"), F.lit(0))
            .cast("long")
            .alias("est_rows"),
            "actual_rows",
            F.expr(
                "(abs(coalesce(est_rows, 0) - actual_rows) * 1000000)"
                " div greatest(1, actual_rows)"
            )
            .cast("long")
            .alias("err_ppm"),
        )
    )


# --------------------------------------------------------------------------
# k-anonymity privacy audit
# --------------------------------------------------------------------------
#
# The privacy-risk companion to q_pii_redact: before a curated slice ships,
# audit how identifying its quasi-identifier combinations are.  A row is
# "at risk" at threshold K when its equivalence class (all rows sharing its
# quasi-identifier tuple) has fewer than K members — the standard
# k-anonymity criterion (Sweeney 2002, public recipe).  Quasi-identifiers
# here: nation x market segment x $1000 account-balance band, the classic
# demographic-ish triple the customer table offers.

_KANON_THRESHOLDS = (2, 5, 10, 25)


def _kanon_oracle() -> str:
    ks = ", ".join(f"({k})" for k in _KANON_THRESHOLDS)
    return f"""
    WITH cls AS (
        SELECT c_nationkey, c_mktsegment,
               (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                + 100000) // 100000 AS bal_band,
               COUNT(*) AS n
        FROM customer GROUP BY 1, 2, 3
    ),
    ks AS (SELECT * FROM (VALUES {ks}) AS v(k_threshold))
    SELECT CAST(k_threshold AS BIGINT) AS k_threshold,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN n < k_threshold THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below_k,
           CAST(SUM(CASE WHEN n < k_threshold THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST((SUM(CASE WHEN n < k_threshold THEN n ELSE 0 END) * 1000000)
                // SUM(n) AS BIGINT) AS at_risk_ppm
    FROM ks CROSS JOIN cls
    GROUP BY 1
    """


@register(
    "q_k_anonymity",
    oracle=_kanon_oracle(),
    tags=("audit", "privacy", "k-anonymity", "curation"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over (nation, segment, $1000 balance band): for
    each threshold K in {2, 5, 10, 25}, how many equivalence classes are
    smaller than K and how many rows they hold (absolute + ppm) — the
    publish-gate number a privacy review asks for before a slice of a
    curated corpus is released (k-anonymity per Sweeney 2002; the
    quasi-identifier banding is the audit's own coarsening knob).

    Shape: one map-side-combinable groupBy over a BOUNDED key domain
    (25 nations x 5 segments x 11 bands, ~1.4k classes max), then a
    4-threshold conditional aggregate over that broadcast metadata
    relation — the threshold sweep never rescans the table.  The balance
    band shifts cents non-negative before integer division so Spark's
    truncating `div` and DuckDB's `//` agree (the repo's
    shift-to-nonnegative doctrine); all outputs exact BIGINTs.  At
    100 TB the class relation stays catalog-bounded, so the audit is one
    scan + one metadata pass regardless of corpus size."""
    cls = (
        t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                "(cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)"
                " + 100000) div 100000"
            ).alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ks = spark.createDataFrame(
        [(k,) for k in _KANON_THRESHOLDS], "k_threshold long"
    )
    return (
        ks.crossJoin(F.broadcast(cls))
        .groupBy("k_threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("n") < F.col("k_threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_classes_below_k"),
            F.sum(
                F.when(F.col("n") < F.col("k_threshold"), F.col("n"))
                .otherwise(0)
            )
            .cast("long")
            .alias("rows_at_risk"),
            F.expr(
                "cast((sum(case when n < k_threshold then n else 0 end)"
                " * 1000000) div sum(n) as bigint)"
            ).alias("at_risk_ppm"),
        )
    )


# --------------------------------------------------------------------------
# l-diversity privacy audit (the k-anonymity companion)
# --------------------------------------------------------------------------
#
# k-anonymity bounds re-identification but not attribute disclosure: a
# class of 50 rows that all share ONE sensitive value is 50-anonymous yet
# leaks the attribute completely (the homogeneity attack).  Distinct
# l-diversity (Machanavajjhala et al. 2007, ICDE — public recipe) closes
# that gap: every class must carry >= L distinct sensitive values.  Here
# the quasi-identifier pair is (nation, segment) and the sensitive
# attribute is the SAME $1000 balance band q_k_anonymity bands — the two
# audits compose into one release gate over one attribute partition.

_LDIV_THRESHOLDS = (2, 3, 5, 10)
_BAL_BAND_SQL = (
    "(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
    " + 100000) // 100000"
)


def _ldiv_oracle() -> str:
    ls = ", ".join(f"({v})" for v in _LDIV_THRESHOLDS)
    return f"""
    WITH bands AS (
        SELECT c_nationkey, c_mktsegment, {_BAL_BAND_SQL} AS bal_band,
               COUNT(*) AS n
        FROM customer GROUP BY 1, 2, 3
    ),
    cls AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS l_div
        FROM bands GROUP BY 1, 2
    ),
    ls AS (SELECT * FROM (VALUES {ls}) AS v(l_threshold))
    SELECT CAST(l_threshold AS BIGINT) AS l_threshold,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN l_div < l_threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_classes_below_l,
           CAST(SUM(CASE WHEN l_div < l_threshold THEN n ELSE 0 END)
                AS BIGINT) AS rows_at_risk,
           CAST((SUM(CASE WHEN l_div < l_threshold THEN n ELSE 0 END)
                 * 1000000) // SUM(n) AS BIGINT) AS at_risk_ppm,
           CAST(MIN(l_div) AS BIGINT) AS worst_class_diversity
    FROM ls CROSS JOIN cls
    GROUP BY 1
    """


@register(
    "q_l_diversity",
    oracle=_ldiv_oracle(),
    tags=("audit", "privacy", "l-diversity", "curation"),
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity audit over quasi-identifier (nation, segment)
    with the $1000 balance band as the sensitive attribute: for each
    threshold L in {2, 3, 5, 10}, how many equivalence classes carry
    fewer than L distinct sensitive values and how many rows sit in them
    (absolute + ppm), plus the corpus-wide worst class diversity — the
    homogeneity-attack gate k-anonymity alone cannot close (a large
    class with one balance band passes every K yet discloses the
    attribute).  Shares q_k_anonymity's banding verbatim so the two
    release gates audit the same attribute partition.

    Shape: distinct counting WITHOUT a count-distinct expansion — the
    (QI, band) relation is one map-side-combinable groupBy (bounded:
    25 nations x 5 segments x 11 bands), the per-class diversity is a
    second groupBy counting its rows, and the 4-threshold sweep runs on
    that ~125-row broadcast metadata relation.  Every output is an
    exact BIGINT (the ppm is integer cross-multiplication // division,
    the shift-to-nonnegative banding doctrine of q_k_anonymity); at
    100 TB the class relation stays catalog-bounded, so the audit is
    one scan + two metadata passes regardless of corpus size."""
    bands = (
        t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                "(cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)"
                " + 100000) div 100000"
            ).alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    cls = bands.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("l_div"),
    )
    ls = spark.createDataFrame(
        [(v,) for v in _LDIV_THRESHOLDS], "l_threshold long"
    )
    return (
        ls.crossJoin(F.broadcast(cls))
        .groupBy("l_threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("l_div") < F.col("l_threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_classes_below_l"),
            F.sum(
                F.when(F.col("l_div") < F.col("l_threshold"), F.col("n"))
                .otherwise(0)
            )
            .cast("long")
            .alias("rows_at_risk"),
            F.expr(
                "cast((sum(case when l_div < l_threshold then n else 0 end)"
                " * 1000000) div sum(n) as bigint)"
            ).alias("at_risk_ppm"),
            F.min("l_div").cast("long").alias("worst_class_diversity"),
        )
    )


# --------------------------------------------------------------------------
# t-closeness privacy audit (the distributional third gate)
# --------------------------------------------------------------------------
#
# l-diversity counts distinct sensitive values but not their SKEW: a class
# with bands {1: 990 rows, 2..11: 1 row each} is 11-diverse yet still
# discloses band 1 with 99% confidence (the skewness attack).  t-closeness
# (Li, Li & Venkatasubramanian 2007, ICDE — public recipe) bounds the
# DISTANCE between each class's sensitive distribution and the corpus-wide
# one.  This audit uses the total-variation distance — the standard
# equal-ground-distance instance of the paper's EMD — because it is exact
# in integer arithmetic: TVD_ppm(c) = 500000 * SUM_b |cnt_cb*N - cnt_b*n_c|
# // (n_c * N), every term a BIGINT cross-multiplication (valid to
# N < ~3e9 rows per audited slice; beyond that the band-count relation —
# already catalog-bounded — would carry DECIMAL(38) products instead).
# Bands a class lacks still contribute |0 - cnt_b*n_c| — TVD is over the
# full support, which is why the class x band frame is completed first.

_TCLOSE_THRESHOLDS_PPM = (100000, 200000, 300000)  # t = 0.1 / 0.2 / 0.3


def _tclose_oracle() -> str:
    ts = ", ".join(f"({v})" for v in _TCLOSE_THRESHOLDS_PPM)
    return f"""
    WITH cb AS (
        SELECT c_nationkey, c_mktsegment, {_BAL_BAND_SQL} AS bal_band,
               CAST(COUNT(*) AS BIGINT) AS cnt_cb
        FROM customer GROUP BY 1, 2, 3
    ),
    cls AS (
        SELECT c_nationkey, c_mktsegment, CAST(SUM(cnt_cb) AS BIGINT) AS n_c
        FROM cb GROUP BY 1, 2
    ),
    corpus_b AS (
        SELECT bal_band, CAST(SUM(cnt_cb) AS BIGINT) AS cnt_b FROM cb
        GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cnt_b) AS BIGINT) AS n FROM corpus_b),
    full_grid AS (
        SELECT c.c_nationkey, c.c_mktsegment, c.n_c, b.bal_band, b.cnt_b,
               COALESCE(x.cnt_cb, 0) AS cnt_cb
        FROM cls c CROSS JOIN corpus_b b
        LEFT JOIN cb x ON x.c_nationkey = c.c_nationkey
                      AND x.c_mktsegment = c.c_mktsegment
                      AND x.bal_band = b.bal_band
    ),
    tvd AS (
        SELECT c_nationkey, c_mktsegment, n_c,
               CAST((500000 * SUM(abs(cnt_cb * t.n - cnt_b * n_c)))
                    // (n_c * t.n) AS BIGINT) AS tvd_ppm
        FROM full_grid CROSS JOIN tot t
        GROUP BY 1, 2, 3, t.n
    ),
    ts AS (SELECT * FROM (VALUES {ts}) AS v(t_ppm))
    SELECT CAST(t_ppm AS BIGINT) AS t_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN tvd_ppm > t_ppm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_above_t,
           CAST(SUM(CASE WHEN tvd_ppm > t_ppm THEN n_c ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST((SUM(CASE WHEN tvd_ppm > t_ppm THEN n_c ELSE 0 END)
                 * 1000000) // SUM(n_c) AS BIGINT) AS at_risk_ppm,
           CAST(MAX(tvd_ppm) AS BIGINT) AS worst_class_tvd_ppm
    FROM ts CROSS JOIN tvd
    GROUP BY 1
    """


@register(
    "q_t_closeness",
    oracle=_tclose_oracle(),
    tags=("audit", "privacy", "t-closeness", "curation"),
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (total-variation instance) over the same
    (nation, segment) quasi-identifiers and $1000 balance bands as
    q_k_anonymity / q_l_diversity — the third release gate, catching the
    skewness attack the other two pass: per threshold t in {0.1, 0.2,
    0.3} (ppm), how many classes sit FARTHER than t from the corpus-wide
    band distribution, the rows they hold, and the worst class distance.
    All integers: the per-class TVD is the cross-multiplied
    500000 * Σ_b |cnt_cb*N - cnt_b*n_c| // (n_c*N), with absent bands
    contributing their full corpus mass (TVD runs over the complete
    support, hence the completed class x band grid).

    Shape: ONE scan into the bounded (class x band) count relation
    (~125 x 11), then every following step — corpus marginals, grid
    completion, per-class fold, 3-threshold sweep — is broadcast
    metadata arithmetic; at 100 TB the audit is one scan + metadata
    passes, like its two siblings."""
    cb = (
        t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                "(cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)"
                " + 100000) div 100000"
            ).alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_cb"))
    )
    cb = persist_tracked(cb)
    cls = cb.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt_cb").cast("long").alias("n_c")
    )
    corpus_b = cb.groupBy("bal_band").agg(
        F.sum("cnt_cb").cast("long").alias("cnt_b")
    )
    tot = corpus_b.agg(F.sum("cnt_b").cast("long").alias("n"))
    grid = (
        cls.crossJoin(F.broadcast(corpus_b))
        .join(
            cb.withColumnRenamed("cnt_cb", "cnt_cb_raw"),
            ["c_nationkey", "c_mktsegment", "bal_band"],
            "left",
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_c",
            "cnt_b",
            F.coalesce("cnt_cb_raw", F.lit(0)).cast("long").alias("cnt_cb"),
        )
    )
    tvd = (
        grid.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "n_c", "n")
        .agg(
            F.expr(
                "cast((500000 * sum(abs(cnt_cb * n - cnt_b * n_c)))"
                " div (n_c * n) as bigint)"
            ).alias("tvd_ppm")
        )
    )
    ts = spark.createDataFrame(
        [(v,) for v in _TCLOSE_THRESHOLDS_PPM], "t_ppm long"
    )
    return (
        ts.crossJoin(F.broadcast(tvd))
        .groupBy("t_ppm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("tvd_ppm") > F.col("t_ppm"), 1).otherwise(0))
            .cast("long")
            .alias("n_classes_above_t"),
            F.sum(
                F.when(F.col("tvd_ppm") > F.col("t_ppm"), F.col("n_c"))
                .otherwise(0)
            )
            .cast("long")
            .alias("rows_at_risk"),
            F.expr(
                "cast((sum(case when tvd_ppm > t_ppm then n_c else 0 end)"
                " * 1000000) div sum(n_c) as bigint)"
            ).alias("at_risk_ppm"),
            F.max("tvd_ppm").cast("long").alias("worst_class_tvd_ppm"),
        )
    )
