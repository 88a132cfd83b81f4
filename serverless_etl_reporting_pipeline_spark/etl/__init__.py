from serverless_etl_reporting_pipeline_spark.etl.extract import FileWatermarkStore, incremental_extract
from serverless_etl_reporting_pipeline_spark.etl.transform import RAW_TRANSACTIONS_SCHEMA, clean_transactions, duplicate_report
from serverless_etl_reporting_pipeline_spark.etl.dims import extract_dims
from serverless_etl_reporting_pipeline_spark.etl.pipeline import run_pipeline

__all__ = [
    "FileWatermarkStore",
    "incremental_extract",
    "RAW_TRANSACTIONS_SCHEMA",
    "clean_transactions",
    "duplicate_report",
    "extract_dims",
    "run_pipeline",
]
