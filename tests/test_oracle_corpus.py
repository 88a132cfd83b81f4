"""Differential oracle tests: every registry query vs DuckDB at sf0.001.

This mirrors the driver's t2 check (SURVEY.md §5.1): row count + column
names + order-insensitive values must match exactly.
"""

from __future__ import annotations

import pytest

from serverless_etl_reporting_pipeline_spark.plans import REGISTRY
from tools.oracle_check import compare, duck_connect, type_check


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    df = q.builder(spark, sf_dir)
    rows = df.collect()
    if q.oracle is None:
        # rows-only contract: must run and be deterministic across reruns
        again = q.builder(spark, sf_dir).collect()
        assert sorted(map(str, rows)) == sorted(map(str, again))
        return
    rel = duck.sql(q.oracle)
    duck_cols = list(rel.columns)
    duck_types = [str(t) for t in rel.types]
    duck_rows = rel.fetchall()
    ok, msg, _ = compare(rows, duck_rows, df.columns, duck_cols)
    assert ok, f"{name}: {msg}"
    # The driver hashes types alongside values: an oracle column DuckDB
    # widened to HUGEINT/DECIMAL is a driver hash mismatch even when every
    # value above compared equal (r4: c07/k01/k02).
    bad = type_check(df.dtypes, duck_cols, duck_types)
    assert not bad, f"{name}: oracle type divergence: {bad}"


def test_type_check_flags_driver_hash_classes():
    """Pin the r4 lesson: HUGEINT/DECIMAL diverge, integer widths don't."""
    spark_dtypes = [("a", "bigint"), ("b", "int"), ("c", "double")]
    assert type_check(spark_dtypes, ["a"], ["HUGEINT"])  # uncast sum(BIGINT)
    assert type_check(spark_dtypes, ["c"], ["DECIMAL(18,3)"])
    assert type_check(spark_dtypes, ["a"], ["VARCHAR"])
    assert not type_check(spark_dtypes, ["b"], ["BIGINT"])  # width-only: green
    assert not type_check(spark_dtypes, ["a"], ["INTEGER"])
    assert not type_check(spark_dtypes, ["c"], ["DOUBLE"])
    assert not type_check(spark_dtypes, ["zzz"], ["HUGEINT"])  # unknown col skipped
