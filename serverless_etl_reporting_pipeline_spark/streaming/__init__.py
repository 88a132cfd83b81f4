from serverless_etl_reporting_pipeline_spark.streaming.ingest import available_now_ingest
from serverless_etl_reporting_pipeline_spark.streaming.windows import windowed_counts

__all__ = ["available_now_ingest", "windowed_counts"]
