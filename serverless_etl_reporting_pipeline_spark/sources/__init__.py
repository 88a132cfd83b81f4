from serverless_etl_reporting_pipeline_spark.sources.reader import TABLES, load_table, register_views
from serverless_etl_reporting_pipeline_spark.sources.schemas import SCHEMAS

__all__ = ["TABLES", "SCHEMAS", "load_table", "register_views"]
