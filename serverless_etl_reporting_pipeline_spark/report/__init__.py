from serverless_etl_reporting_pipeline_spark.report.metrics import daily_metrics
from serverless_etl_reporting_pipeline_spark.report.html import render_html

__all__ = ["daily_metrics", "render_html"]
