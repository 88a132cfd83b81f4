"""spark-graft: a PySpark-native analytics engine.

Brand-new engine providing the query and data-processing capabilities of
``Lorenzo-O114/serverless-etl-reporting-pipeline`` (see SURVEY.md), re-expressed
Spark-first (DataFrame / Spark SQL / Catalyst / Structured Streaming) and
extended with LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns). Designed for 100 TB scale, tested locally.
"""

from serverless_etl_reporting_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
