"""SparkSession factory.

Centralizes the engine configuration so every entry point (tests, bench,
driver contract, ETL jobs) runs with the same semantics:

- ``spark.sql.session.timeZone=UTC`` — fixture timestamps are tz-naive;
  pinning UTC keeps ``hour()`` / ``to_date()`` oracle-stable vs DuckDB
  (SURVEY.md §7.3).
- AQE on (coalesce partitions + skew-join) — at 100 TB the runtime re-plan
  is what keeps shuffle partition sizing and skewed join keys from
  becoming manual tuning problems.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster this would be ~2-3x total cores (AQE coalesces down).
- Arrow enabled — all Python-side exchange (Pandas UDFs, createDataFrame)
  goes through Arrow batches, never per-row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

APP_NAME = "serverless-etl-reporting-pipeline-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    In local mode there is a single JVM, so ``spark.driver.memory`` is the
    only memory knob; it must be set before the JVM starts (first call
    wins for an existing session).
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
