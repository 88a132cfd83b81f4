"""JDBC source (SURVEY.md §2.1 S1/S2): the reference's MySQL extract
(`pipeline/ETL/extract.py:84-109`) re-expressed as Spark JDBC reads.

Two improvements over the reference:

- the incremental predicate pushes down with microsecond precision and
  a validated identifier (the reference interpolates a second-precision
  watermark with a +1s bump — boundary rows can be lost). The predicate
  text is still assembled by string formatting — JDBC's `query` option
  has no bind-parameter channel — but the timestamp comes from
  `datetime.strftime` (shape-safe) and `ts_col` must match a strict
  identifier regex, so no attacker-controlled text can reach the SQL;
- reads are partitioned (`partitionColumn`/`numPartitions`) so a large
  extract parallelizes across executors instead of one connection.

These builders are exercised LIVE against embedded Apache Derby (the
jars Spark bundles for its Hive metastore double as a real JDBC
database): tests/test_etl.py round-trips write → full read →
partitioned read → microsecond-watermark incremental read. The same
plans execute against MySQL/Postgres/etc. with that driver jar on the
classpath.
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

_IDENTIFIER = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
):
    """Reader for a whole table; with `partition_column` (numeric) the
    scan splits into `num_partitions` range-partitioned queries."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def jdbc_incremental_query(
    spark: SparkSession,
    url: str,
    base_query: str,
    ts_col: str,
    watermark: datetime | None,
    driver: str | None = None,
) -> "DataFrame":
    """Incremental extract via the JDBC `query` option: the full
    join+project SQL executes on the source DB (like extract.py's
    MySQL-side join), with a strictly-greater watermark predicate —
    microsecond precision, no +1s bump, no lost boundary rows.

    The predicate is built by string formatting (the JDBC `query`
    option offers no bind parameters), so both injected pieces are
    constrained: the timestamp is rendered by `strftime` from a
    `datetime` (cannot contain SQL), and `ts_col` must match a strict
    `[A-Za-z_][A-Za-z0-9_]*` identifier (optionally table-qualified) —
    anything else raises before any SQL is assembled.
    """
    query = base_query
    if watermark is not None:
        if not _IDENTIFIER.match(ts_col):
            raise ValueError(f"ts_col is not a plain column identifier: {ts_col!r}")
        ts = watermark.strftime("%Y-%m-%d %H:%M:%S.%f")
        # Dialect portability, verified against live embedded Derby:
        # the alias must start with a letter (leading-underscore
        # identifiers are rejected, ERROR 42X01), and the watermark is
        # rendered as the JDBC timestamp escape {ts '...'} — drivers
        # rewrite it into their own literal syntax, unlike the ANSI
        # TIMESTAMP '...' form which Derby rejects outright.
        query = f"SELECT * FROM ({base_query}) incr WHERE {ts_col} > {{ts '{ts}'}}"
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    if driver:
        reader = reader.option("driver", driver)
    return reader.load()
