"""SparkSession factory.

One place to encode the 100 TB posture: AQE on (runtime shuffle-partition
coalescing + skew-join splitting), Arrow for any Python-side exchange,
UTC session time zone (determinism across engines), and s3a credentials wired
from the same env vars the reference reads (``settings.py:11-14``), including a
custom endpoint for MinIO-style deployments (``AWS_ENDPOINT_URL``).

On the local[32] test box the only memory knob that matters is driver memory;
on a real cluster the same builder is used with master/memory supplied by the
cluster manager.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import EngineConfig, load_config


def build_session(
    app_name: str = "data_ingestion_ex8_producer_spark",
    config: EngineConfig | None = None,
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cfg = config or load_config()
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.getenv("SPARK_MASTER") and "SPARK_ENV_LOADED" not in os.environ:
        builder = builder.master(f"local[{cfg.local_cores}]")

    conf: dict[str, str] = {
        # In local mode the driver JVM IS the executor: the 1g default heap
        # starves 32 task threads (a 10x-corpus probe OOMed in a banded join
        # under it).  12g is still <10% of the test box; a real cluster
        # overrides via spark-submit / cluster manager.
        "spark.driver.memory": os.getenv("SPARK_GRAFT_DRIVER_MEM", "12g"),
        # Right-size shuffles for the deployment; AQE coalesces downward at runtime.
        "spark.sql.shuffle.partitions": str(cfg.shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Deterministic timestamp semantics across Spark and the DuckDB oracle.
        "spark.sql.session.timeZone": "UTC",
        # Arrow for pandas UDF / toPandas exchange (the only sanctioned Python path).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Files: 128 MiB split target is the right default for 100 TB of parquet.
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.ui.enabled": os.getenv("SPARK_GRAFT_UI", "false"),
    }

    # s3a wiring from the reference's env surface (settings.py:11-14).
    if cfg.aws_access_key_id:
        conf["spark.hadoop.fs.s3a.access.key"] = cfg.aws_access_key_id
    if cfg.aws_secret_access_key:
        conf["spark.hadoop.fs.s3a.secret.key"] = cfg.aws_secret_access_key
    if cfg.aws_endpoint_url:
        conf["spark.hadoop.fs.s3a.endpoint"] = cfg.aws_endpoint_url
        conf["spark.hadoop.fs.s3a.path.style.access"] = "true"
    if cfg.aws_default_region:
        conf["spark.hadoop.fs.s3a.endpoint.region"] = cfg.aws_default_region

    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
