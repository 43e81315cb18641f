"""Star-schema parquet source (the driver-provided TPC-H-ish testdata).

At 100 TB these tables are directories of many parquet files (possibly
partitioned); ``spark.read.parquet`` handles both the single-file test layout
and a partitioned production layout identically, and Catalyst pushes filters
and projections into the scan (verify with ``.explain``: ``PushedFilters`` /
``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor: region/nation are
# fixed-cardinality (5 / 25 rows) by construction.
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in STAR_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {STAR_TABLES}")
    if name == "events":
        # Without this a TIMESTAMP(NANOS) file fails the read outright; with
        # it, nanos arrive as long and every other encoding is unaffected.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", _normalize_event_ts(df))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _normalize_event_ts(df: DataFrame):
    """Normalize ``events.ts`` to TimestampType regardless of how the parquet
    writer encoded it.  Generators have shipped it as TIMESTAMP(NANOS) (read
    as long under ``nanosAsLong`` — floor to micros with exact integer
    division; double division would risk off-by-one-us), TIMESTAMP(MICROS)
    without tz (reads as TIMESTAMP_NTZ — reinterpret in the session zone,
    pinned to UTC in :mod:`..session`), or plain TIMESTAMP."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return F.expr("timestamp_micros(ts div 1000)")
    return F.col("ts").cast("timestamp")
