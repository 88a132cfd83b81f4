"""Physical-plan lint over the whole registry — the automated version of
'.explain and iterate until it's the plan you'd want'.

At 100 TB a CartesianProduct or BroadcastNestedLoopJoin in a corpus
query is an outage, not a slow query; and a scan that reads every column
for a narrow projection wastes IO cluster-wide. These asserts keep
regressions out as the corpus grows.
"""

from __future__ import annotations

import re

import pytest

from serverless_etl_reporting_pipeline_spark.plans import REGISTRY


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_no_cartesian_or_nested_loop_joins(spark, sf_dir):
    bad = []
    for name, q in sorted(REGISTRY.items()):
        plan = _plan(spark, q.builder(spark, sf_dir))
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            bad.append(name)
    assert not bad, f"unbounded join strategies in: {bad}"


def test_flagship_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, REGISTRY["j01_flagship_daily_nation"].builder(spark, sf_dir))
    # 4 joins (orders, customer, nation, region) — all broadcast-hash at
    # fixture scale, none sort-merge (the fact side must not shuffle)
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 4
    assert "SortMergeJoin" not in plan


def test_scans_prune_columns(spark, sf_dir):
    """Narrow projections must reach the parquet reader as narrow
    ReadSchema — lineitem has 16 columns; these queries need ≤ 4."""
    for name, max_cols in [("a01_totals", 2), ("p01_projection_filter", 4)]:
        plan = _plan(spark, REGISTRY[name].builder(spark, sf_dir))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert schemas, f"{name}: no ReadSchema in plan"
        for s in schemas:
            assert len(s.split(",")) <= max_cols, f"{name}: fat scan: {s}"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, REGISTRY["p03_high_value_topk"].builder(spark, sf_dir))
    assert re.search(r"PushedFilters: \[.*GreaterThan", plan), plan[:500]


def test_topk_plans_take_ordered(spark, sf_dir):
    """orderBy+limit must plan TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, REGISTRY["p03_high_value_topk"].builder(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", ["a02_revenue_by_nation", "a04_daily_revenue"])
def test_aggregates_are_partial_final(spark, sf_dir, name):
    """Group-bys must plan map-side partial + final HashAggregate."""
    plan = _plan(spark, REGISTRY[name].builder(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize(
    "name",
    [
        "t19_decontamination",  # eval-split shingle set is benchmark-sized
        "e04_dq_checks",  # customer dim broadcasts under the fact scan
        "v08_label_cohesion",  # labels x dims centroid frame broadcasts
        "t14_tfidf_top_terms",  # vocabulary-sized df frame broadcasts
    ],
)
def test_small_side_broadcasts(spark, sf_dir, name):
    """The small side of each new-query join must broadcast — the fact/
    corpus side never shuffles for it."""
    plan = _plan(spark, REGISTRY[name].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join\n{plan[:800]}"
    assert "SortMergeJoin" not in plan, f"{name}: unexpected sort-merge join"


@pytest.mark.parametrize("name", ["v02_top_similar_pairs", "v07_embedding_neardup"])
def test_allpairs_vector_ops_never_collect_vectors(spark, sf_dir, name, monkeypatch):
    """The exact all-pairs ops must use the block-grid path: building
    the plan may run scalar actions (count) but must NEVER collect
    vector rows to the driver — a driver OOM at 100 TB."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):
        raise AssertionError(f"{name} builder collected rows driver-side")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom, raising=False)
    df = REGISTRY[name].builder(spark, sf_dir)  # must not raise
    assert df is not None
