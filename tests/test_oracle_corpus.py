"""Differential oracle tests: every registry query vs DuckDB at sf0.001.

This mirrors the driver's t2 check (SURVEY.md §5.1): row count + column
names + order-insensitive values must match exactly.
"""

from __future__ import annotations

import pytest

from serverless_etl_reporting_pipeline_spark.plans import REGISTRY
from tools.oracle_check import compare, duck_connect


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
    rel = duck.execute(q.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    ok, msg, _ = compare(rows, duck_rows, df.columns, duck_cols)
    assert ok, f"{name}: {msg}"
