"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
)
spark_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(spark_entry)


def test_entry_returns_rows(spark):
    df = spark_entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["year", "region", "nation", "line_count", "revenue", "avg_line_revenue"]


def test_queries_and_oracles_consistent():
    qs = spark_entry.queries()
    oracles = spark_entry.oracle_sql()
    assert len(qs) >= 39
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_every_query_callable_signature(spark, sf_dir):
    qs = spark_entry.queries()
    # spot-check one runs through the public contract
    df = qs["a01_totals"](spark, sf_dir)
    assert df.count() == 1
