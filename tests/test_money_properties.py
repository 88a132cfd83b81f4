"""Property tests (hypothesis) for the exact-money discipline and
keep-first dedup determinism — the two semantics-drift risks SURVEY.md
§7.3 flags for pandas→Spark ports."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.functions.money import money_avg, money_sum
from serverless_etl_reporting_pipeline_spark.operators.text import exact_dedup

amounts = st.lists(
    st.decimals(min_value=Decimal("-99999.99"), max_value=Decimal("99999.99"), places=2),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(amounts)
def test_money_sum_is_exact_and_partition_independent(spark, xs):
    """money_sum must equal the exact decimal sum no matter how the data
    is partitioned — the property plain float sum() lacks."""
    want = float(sum(xs))
    df = spark.createDataFrame([(float(x),) for x in xs], "total double")
    one = df.coalesce(1).agg(money_sum("total").alias("s")).collect()[0]["s"]
    many = df.repartition(7).agg(money_sum("total").alias("s")).collect()[0]["s"]
    assert one == many
    assert abs(one - want) < 1e-9


@settings(max_examples=5, deadline=None)
@given(amounts)
def test_money_avg_rounds_to_cent(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "total double")
    got = df.agg(money_avg("total").alias("a")).collect()[0]["a"]
    cents_total = sum(int(x * 100) for x in xs)
    n = len(xs)
    # HALF_UP at cent scale, away from zero — matches Spark/DuckDB round
    q = Decimal(cents_total) / Decimal(n)
    want = float(q.quantize(Decimal("1"), rounding="ROUND_HALF_UP")) / 100.0
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 1000)), min_size=1, max_size=50))
def test_exact_dedup_keeps_lowest_id(spark, rows):
    """keep-first is deterministic by lowest id regardless of input
    order/partitioning (pandas keep='first' depends on row order —
    transform.py:30-37)."""
    df = spark.createDataFrame([(k, i) for i, (k, _) in enumerate(rows)], "k int, id int")
    out = exact_dedup(df.repartition(5), ["k"], "id").collect()
    want = {}
    for i, (k, _) in enumerate(rows):
        want.setdefault(k, i)
    assert {r["k"]: r["id"] for r in out} == want
