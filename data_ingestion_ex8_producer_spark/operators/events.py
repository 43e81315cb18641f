"""Event-time windowing over the ``events`` table — batch twins of the
Structured Streaming queries in ``streaming/events.py``.

``F.window`` / ``F.session_window`` work identically on batch DataFrames, so
the driver-scored batch results here pin the exact same grouping semantics the
streaming pipeline produces per micro-batch (SIGMOD'18 Structured Streaming
model: a streaming query result == the batch query over the prefix).

DuckDB oracles rebuild the windows arithmetically: tumbling/sliding via
``time_bucket`` (both engines align windows to the epoch), sessions via the
classic lag + gap-flag + cumulative-sum session-id construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ._util import t


@register(
    "q_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("events", "window", "bench"),
    bench=True,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type."""
    win = F.window("ts", "1 hour")
    return (
        t(spark, sf_dir, "events")
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_sliding_window",
    oracle="""
    WITH slid AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes'
                 AS window_start,
               value
        FROM events
        CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM slid
    GROUP BY 1, 2
    """,
    tags=("events", "window"),
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in two
    overlapping windows.  The oracle expands each event into its two windows
    explicitly; Spark's window() does the same expansion internally."""
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        t(spark, sf_dir, "events")
        .groupBy(win)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS new_session,
               event_id
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '10 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("events", "session"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 10-minute inactivity gap per user.  Spark's
    session_window end = last event + gap; the oracle reproduces that with the
    lag/cumsum sessionization idiom."""
    win = F.session_window("ts", "10 minutes")
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", win)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_event_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    """,
    tags=("events", "dedup"),
)
def q_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct over a projected key set — the batch twin of streaming
    dropDuplicates (which additionally bounds state with a watermark)."""
    return t(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@register(
    "q_enrich_events",
    oracle="""
    SELECT n.n_name,
           e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, e.event_type
    ORDER BY n.n_name, e.event_type
    """,
    tags=("events", "join"),
)
def q_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment shape (events joined to dimension tables),
    run in batch: broadcast the dims, aggregate by enriched keys."""
    ev = t(spark, sf_dir, "events")
    cust = F.broadcast(t(spark, sf_dir, "customer"))
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("total_value"),
        )
        .orderBy("n_name", "event_type")
    )


@register(
    "q_time_series_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
               CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
        FROM events
    ),
    hours AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour_start
        FROM bounds
    ),
    actual AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT h.hour_start,
           COALESCE(a.n_events, 0) AS n_events,
           CAST(a.n_events IS NULL AS BOOLEAN) AS is_gap
    FROM hours h LEFT JOIN actual a ON h.hour_start = a.hour_start
    """,
    tags=("events", "timeseries", "gapfill"),
)
def q_time_series_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated dense hour spine left-joined to
    the actual hourly counts, so silent empty hours become explicit zero
    rows.  The spine generation (sequence + explode of an aggregated
    min/max) is one tiny row exploded — no data-volume cost at any scale."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")
    )
    actual = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.count(F.lit(1)).alias("n_actual")
    )
    return hours.join(actual, "hour_start", "left").select(
        "hour_start",
        F.coalesce(F.col("n_actual"), F.lit(0)).alias("n_events"),
        F.col("n_actual").isNull().alias("is_gap"),
    )


@register(
    "q_session_window_dynamic",
    oracle="""
    WITH gapped AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN INTERVAL '30 minutes'
                    ELSE INTERVAL '10 minutes' END AS gap
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts >= MAX(ts + gap) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id
                                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                                            AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_session,
               ts + gap AS this_end
        FROM gapped
    ),
    numbered AS (
        SELECT user_id, ts, this_end,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(this_end) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("events", "session", "dynamic-gap"),
)
def q_session_window_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC per-event gap (purchases hold the
    session open 30 min, everything else 10): sessions are the union of
    overlapping [ts, ts+gap) intervals.  The oracle reproduces interval-union
    semantics with a running-max window (new session iff the event starts at
    or after every previous interval's end)."""
    gap = F.when(F.col("event_type") == "purchase", "30 minutes").otherwise(
        "10 minutes"
    )
    win = F.session_window("ts", gap)
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", win)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_multi_grain_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                THEN CAST(date_trunc('hour', ts) AS TIMESTAMP) END AS hour_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    HAVING GROUPING(date_trunc('day', ts)) = 0
    """,
    tags=("events", "rollup", "timeseries"),
)
def q_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hourly AND daily aggregates
    of the event stream in ONE pass (ROLLUP over two time truncations;
    day-level subtotal rows carry NULL hour_start).  The continuous-aggregate
    pattern for time-series stores, expressed as a single Expand+aggregate."""
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    return (
        t(spark, sf_dir, "events")
        .rollup(day.alias("day_start"), hour.alias("hour_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("total_value"),
        )
        .filter(F.col("day_start").isNotNull())
    )
