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
        # events.parquet stores ts as TIMESTAMP(NANOS); Spark has no nanosecond
        # timestamp type, so read nanos as long and floor to microseconds with
        # exact integer division (double division would risk off-by-one-us).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
