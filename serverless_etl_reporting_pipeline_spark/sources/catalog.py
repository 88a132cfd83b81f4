"""Catalog layer (SURVEY.md §2.1 S9): the Spark-native replacement for
the reference's Glue-crawler + Athena catalog
(`pipeline/terraform_s3/main.tf:65-146`, `athena_queries.sql:7-13`).

Where the reference re-runs a crawler to discover schema and partitions,
Spark's catalog registers external Parquet locations directly
(`CREATE TABLE ... USING PARQUET LOCATION`) and recovers Hive-style
partitions with `MSCK REPAIR TABLE` — same operational contract, no
inference service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serverless_etl_reporting_pipeline_spark.sources.reader import TABLES, table_path


def create_external_table(
    spark: SparkSession, name: str, location: str, partitioned: bool = False
) -> None:
    """Register an existing Parquet location as a catalog table. For a
    Hive-partitioned layout, recover the partitions (≙ crawler re-run)."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} USING PARQUET LOCATION '{location}'")
    if partitioned:
        spark.sql(f"MSCK REPAIR TABLE {name}")


def register_star_schema(spark: SparkSession, sf_dir: str, database: str = "lake") -> None:
    """Catalog the whole fixture star schema under a database, so the
    SQL surface (`spark.sql`, SHOW TABLES, DESCRIBE) works by name."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for t in TABLES:
        create_external_table(spark, f"{database}.{t}", table_path(sf_dir, t))


def show_tables(spark: SparkSession, database: str = "lake") -> DataFrame:
    return spark.sql(f"SHOW TABLES IN {database}")


def describe_table(spark: SparkSession, qualified_name: str) -> DataFrame:
    return spark.sql(f"DESCRIBE TABLE {qualified_name}")
