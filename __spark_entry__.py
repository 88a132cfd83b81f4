"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` exposes every implemented operator from SURVEY.md §2 (one
callable per corpus entry); ``oracle_sql()`` pairs each with the DuckDB
SQL the driver uses for the differential correctness check.

The real implementation lives in ``serverless_etl_reporting_pipeline_spark/``; this module
only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serverless_etl_reporting_pipeline_spark.plans import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "j01_flagship_daily_nation"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (fact ⋈ broadcast dims → agg → sort) on sf0.001."""
    return REGISTRY[FLAGSHIP].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
