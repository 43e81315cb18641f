"""Scale-pattern operators: plans written the way they must be written at
100 TB — salted two-phase aggregation for skewed keys, exact percentiles,
positional explode, and the array-function battery.

The salted variants return IDENTICAL results to their naive forms (the
oracle is the plain SQL), so the pattern's correctness is driver-verified,
not just asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ._util import t

_SALT_BUCKETS = 16


@register(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "salting"),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a LOW-cardinality (hence maximally
    skewed) key: phase 1 aggregates on (key, salt) spreading each hot key
    over 16 reducers, phase 2 merges the partials.  Result is identical to
    the naive groupBy (the oracle IS the naive query); only the shuffle
    distribution differs.  Every aggregate here must be decomposable
    (count->sum, sum->sum, max->max)."""
    li = t(spark, sf_dir, "lineitem").withColumn(
        "__salt", (F.crc32(F.col("l_orderkey").cast("string")) % _SALT_BUCKETS)
    )
    partial = (
        li.groupBy("l_returnflag", "__salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("l_quantity").cast("decimal(12,4)")).alias("pq"),
            F.max("l_extendedprice").alias("pm"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pn").alias("n_rows"),
            F.sum("pq").cast("double").alias("sum_qty"),
            F.max("pm").alias("max_price"),
        )
    )


@register(
    "q_salted_join",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
               AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY o_orderstatus
    """,
    tags=("join", "skew", "salting"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted (hot-key-replicated) join: the fact side gets a deterministic
    salt derived from its row identity, the dimension side is exploded once
    per salt bucket, and the join key becomes (key, salt) — spreading any
    single hot customer over 16 reducers.

    The oracle is the PLAIN join: salting is a physical rewrite that must be
    invisible in the result, and the correctness gate proves exactly that.
    This is the manual fallback for skew Spark's AQE skew-join can't fix —
    a single key too hot for any one reducer even after AQE splitting (AQE
    splits partitions, but one key lives in one partition per join).  At
    100 TB the salt count scales with the hottest key's row share, and only
    hot keys (found via approx freq) get salted — salting everything, as
    here, is the didactic worst case."""
    salts = 16
    fact = t(spark, sf_dir, "orders").withColumn(
        "__salt_f", (F.crc32(F.col("o_orderkey").cast("string")) % salts).cast("int")
    )
    dim = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .withColumn("__salt_d", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
        .withColumn("__salt_d", F.col("__salt_d").cast("int"))
    )
    return (
        fact.join(
            dim,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("__salt_f") == F.col("__salt_d")),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.sum(F.col("o_totalprice").cast("decimal(12,4)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont: both linearly interpolate on the sorted values, and the
    interpolation arithmetic is IEEE-identical for identical inputs).
    At scale prefer approx_percentile (KLL/GK sketch, one pass, mergeable) —
    engine-specific output, so the exact form carries the oracle."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, len(ts))) AS INTEGER) AS pos,
           unnest(ts) AS token
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
          FROM documents WHERE doc_id < 20) d
    """,
    tags=("explode", "array"),
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token stream with 0-based positions (oracle zips a
    parallel range() unnest — DuckDB 1.0 has no WITH ORDINALITY)."""
    from ..functions.text import tokens

    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(tokens()).alias("pos", "token"))
    )


@register(
    "q_array_funcs",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
                  FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           ts[1] AS first_token,
           ts[len(ts)] AS last_token,
           CAST(len(ts) AS INTEGER) AS n_tokens,
           list_sort(ts[1:5]) AS head_sorted,
           list_contains(ts, 'data') AS has_data,
           CAST(nullif(list_position(ts, 'the'), 0) AS INTEGER) AS first_the,
           array_to_string(ts[1:3], '-') AS head_joined,
           list_reverse(ts[1:3]) AS head_reversed
    FROM toks
    """,
    tags=("scalar", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery: indexing, slice, sort, containment, position,
    join, reverse — all Catalyst array expressions.  Both engines return 0
    for a missing element's position; normalized to NULL on both sides."""
    from ..functions.text import tokens

    ts = tokens()
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.element_at(ts, 1).alias("first_token"),
            F.element_at(ts, -1).alias("last_token"),
            F.size(ts).alias("n_tokens"),
            F.sort_array(F.slice(ts, 1, 5)).alias("head_sorted"),
            F.array_contains(ts, "data").alias("has_data"),
            F.nullif(F.array_position(ts, "the").cast("int"), F.lit(0)).alias("first_the"),
            F.array_join(F.slice(ts, 1, 3), "-").alias("head_joined"),
            F.reverse(F.slice(ts, 1, 3)).alias("head_reversed"),
        )
    )


@register(
    "q_approx_percentile",
    oracle=None,  # sketch (GK/KLL) results are engine-specific; rows-only
    tags=("agg", "approx", "percentile"),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: the one-pass mergeable-sketch quantile — the scale
    path q_percentiles' exact form replaces at 100 TB (exact percentile
    needs a full sort per group)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias(
                "price_quantiles"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Time-bucketed proximity self-join (the band-join scale pattern)
# --------------------------------------------------------------------------

_PROX_WINDOW_US = 300_000_000  # +/- 5 minutes, exact integer microseconds


@register(
    "q_event_proximity_pairs",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(ts) AS t_us
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
    )
    SELECT a.user_id,
           a.event_id AS event_id_a,
           b.event_id AS event_id_b,
           a.event_type AS type_a,
           b.event_type AS type_b,
           CAST(b.t_us - a.t_us AS BIGINT) AS dt_us
    FROM e a JOIN e b
      ON b.user_id = a.user_id
     AND b.event_id > a.event_id
     AND abs(b.t_us - a.t_us) <= {_PROX_WINDOW_US}
    """,
    tags=("events", "join", "temporal", "scale-pattern"),
)
def q_event_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal proximity self-join: all same-user event pairs within
    +/- 5 minutes — the primitive behind co-occurrence mining, duplicate-
    click detection, and cross-device stitching.  The oracle states the
    intent as a naive theta self-join (|dt| <= w), which no engine can
    hash; the builder runs the TIME-BUCKETED BAND JOIN every production
    stream processor uses instead: bucket = epoch_us div w, each left row
    probes buckets {{b-1, b, b+1}}, so the join is a plain EQUI-join on
    (user_id, bucket) and the theta predicate only ever evaluates on
    candidates from adjacent 5-minute cells.  Each qualifying pair
    matches on exactly ONE probe bucket (b's own), so no dedup step is
    needed.  All arithmetic is exact BIGINT microseconds (unix_micros ==
    DuckDB epoch_us; the signed dt is reported raw — never floor-divided,
    where the two engines' negative-division conventions differ).

    Scale shape: candidate volume is bounded by per-(user, 5-min-cell)
    density — 3 cells per probe — instead of per-user history squared;
    the equi-join shuffles on the uniform (user_id, bucket) composite
    key.  A user parked in one hot cell is the q_key_skew_profile
    surveillance case, and the remedy (salt the hot cell) composes with
    q_salted_join's pattern above."""
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.expr("unix_micros(ts)").alias("t_us"),
        )
        .withColumn("bucket", F.expr(f"t_us div {_PROX_WINDOW_US}"))
    )
    probes = e.select(
        F.col("user_id"),
        F.col("event_id").alias("event_id_a"),
        F.col("event_type").alias("type_a"),
        F.col("t_us").alias("t_us_a"),
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("bucket"),
    )
    right = e.select(
        "user_id",
        "bucket",
        F.col("event_id").alias("event_id_b"),
        F.col("event_type").alias("type_b"),
        F.col("t_us").alias("t_us_b"),
    )
    return (
        probes.join(right, ["user_id", "bucket"])
        .filter(
            (F.col("event_id_b") > F.col("event_id_a"))
            & (
                F.abs(F.col("t_us_b") - F.col("t_us_a"))
                <= F.lit(_PROX_WINDOW_US)
            )
        )
        .select(
            "user_id",
            "event_id_a",
            "event_id_b",
            "type_a",
            "type_b",
            (F.col("t_us_b") - F.col("t_us_a")).cast("long").alias("dt_us"),
        )
    )


# --------------------------------------------------------------------------
# Z-order (Morton) layout cells — the multi-dimensional clustering key
# --------------------------------------------------------------------------

_Z_BITS = 16  # bits kept per dimension
_Z_CELL_SHIFT = 16  # keep the top 16 bits of the 32-bit Morton key


def _sql_morton(x: str, y: str) -> str:
    """DuckDB expression interleaving the low 16 bits of x (even bit
    positions) and y (odd positions) into a 32-bit Morton key."""
    terms = []
    # CAST to BIGINT: DuckDB's << on INTEGER overflows at shift 31.
    for i in range(_Z_BITS):
        terms.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _morton(x, y):
    """Spark twin of :func:`_sql_morton` (same unrolled arithmetic)."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z + F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i
        )
        z = z + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i + 1
        )
    return z


@register(
    "q_zorder_layout",
    oracle=f"""
    WITH k AS (
        SELECT (o_custkey & 65535) AS x,
               (date_diff('day', DATE '1992-01-01', o_orderdate) & 65535)
                 AS y
        FROM orders
    ),
    z AS (
        SELECT x, y,
               {_sql_morton('x', 'y')} >> {_Z_CELL_SHIFT} AS zcell
        FROM k
    )
    SELECT CAST(zcell AS BIGINT) AS zcell,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(x) AS BIGINT) AS min_cust,
           CAST(MAX(x) AS BIGINT) AS max_cust,
           CAST(MIN(y) AS BIGINT) AS min_day,
           CAST(MAX(y) AS BIGINT) AS max_day,
           CAST(MAX(x) - MIN(x) + 1 AS BIGINT) AS cust_span,
           CAST(MAX(y) - MIN(y) + 1 AS BIGINT) AS day_span
    FROM z GROUP BY zcell
    """,
    tags=("layout", "zorder", "clustering", "pruning"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering cells over orders(custkey, orderdate) —
    the multi-dimensional data-layout key behind Delta/Iceberg OPTIMIZE
    ZORDER (Morton 1966): interleaving the two dimensions' bits makes
    z-contiguous cells compact in BOTH dimensions at once, so per-file
    min/max indexes prune selective filters on EITHER column.  The report
    is exactly what a table optimizer reads: per 16-bit z-cell (a 256 x 256-wide
    macro-grid over custkey x order-day), the row count and both
    dimensions' min/max spans — narrow spans = effective file skipping.
    A date-linear layout would show day_span ~ 1 but cust_span ~ the whole
    customer domain; z-cells bound both.

    Exactness: the Morton key is 32 unrolled shift/mask/add terms,
    generated from ONE Python loop into both engines' expressions —
    pure BIGINT, no float anywhere (FLOAT_QUALS Class A by
    construction).

    Scale shape: a scan-stage integer projection (whole-stage codegen,
    no join, no explode) into a map-side-combinable groupBy on a <= 65536
    key domain.  At 100 TB this same key feeds
    ``repartitionByRange(zcell, zkey)`` before the write — the layout
    pass is one shuffle; THIS report stays a single metadata-sized
    aggregate at any corpus size."""
    k = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").bitwiseAND(F.lit(65535)).alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .bitwiseAND(F.lit(65535))
        .alias("y"),
    )
    z = k.select(
        "x",
        "y",
        F.shiftright(_morton(F.col("x"), F.col("y")), _Z_CELL_SHIFT).alias("zcell"),
    )
    return z.groupBy("zcell").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("x").cast("long").alias("min_cust"),
        F.max("x").cast("long").alias("max_cust"),
        F.min("y").cast("long").alias("min_day"),
        F.max("y").cast("long").alias("max_day"),
        (F.max("x") - F.min("x") + 1).cast("long").alias("cust_span"),
        (F.max("y") - F.min("y") + 1).cast("long").alias("day_span"),
    )
