"""Report layer tests (generate_report.py semantics: metrics + HTML)."""

from __future__ import annotations

from serverless_etl_reporting_pipeline_spark.etl import RAW_TRANSACTIONS_SCHEMA, clean_transactions
from serverless_etl_reporting_pipeline_spark.report import daily_metrics, render_html


def _transactions(spark):
    rows = [
        (1, "2024-03-01 10:00:00", 1000, 1, 1, "Truck A", "d", 1, 5, "card"),
        (2, "2024-03-01 11:00:00", 3000, 1, 1, "Truck A", "d", 1, 5, "card"),
        (3, "2024-03-01 12:00:00", 1000, 2, 2, "Truck B", "d", 0, 3, "cash"),
    ]
    return clean_transactions(spark.createDataFrame(rows, schema=RAW_TRANSACTIONS_SCHEMA))


def test_metrics(spark):
    m = daily_metrics(_transactions(spark))
    assert m["total_transactions"] == 3
    assert m["total_revenue"] == 50.0
    assert m["best_group"] == "Truck A"
    assert m["worst_group"] == "Truck B"
    # 2% card fee on 40.00 of card revenue (generate_report.py:120-131)
    assert m["card_fees"] == 0.80
    assert m["net_revenue"] == 49.20
    assert m["by_method"]["card"]["pct_of_revenue"] == 80.0


def test_metrics_empty(spark):
    empty = _transactions(spark).filter("total > 1e9")
    m = daily_metrics(empty)
    assert m["empty"] is True


def test_html_render(spark):
    html = render_html(daily_metrics(_transactions(spark)), title="T3 Daily")
    assert "T3 Daily" in html and "Truck A" in html and "49.20" in html
    assert render_html({"empty": True}).count("No transactions") == 1


def test_dashboard_panels(spark):
    """Dashboard layer: conjunctive filter + cached panel aggregations
    (dashboard.py:36-343 semantics)."""
    from datetime import date

    from pyspark.sql import functions as F

    from serverless_etl_reporting_pipeline_spark.report.dashboard import Dashboard, filtered_frame

    tx = _transactions(spark).withColumn("date", F.to_date("at"))
    flt = filtered_frame(
        tx,
        start=date(2024, 3, 1),
        end=date(2024, 3, 1),
        trucks=["Truck A"],
        methods=["card"],
    )
    dash = Dashboard(flt)
    try:
        head = dash.headline().collect()[0]
        assert head["transactions"] == 2
        assert head["total_revenue"] == 40.0
        assert head["avg_transaction"] == 20.0
        by_truck = dash.by_column("truck_name").collect()
        assert [r["truck_name"] for r in by_truck] == ["Truck A"]
        trend = dash.daily_trend().collect()
        assert len(trend) == 1 and trend[0]["revenue"] == 40.0
        assert dash.top_days(1).collect()[0]["revenue"] == 40.0
        latest = dash.latest(1).collect()
        assert latest[0]["transaction_id"] == 2  # newest first
    finally:
        dash.close()
