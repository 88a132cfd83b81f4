"""Query corpus: every SURVEY.md §2 operator as a named, oracle-checked query.

Importing this package populates the registry from all corpus modules.
"""

from serverless_etl_reporting_pipeline_spark.plans.base import REGISTRY, Query, query

# corpus modules register themselves on import
from serverless_etl_reporting_pipeline_spark.plans import analytics  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import relational  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import windows  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import text  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import vectors  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import streams  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import multimodal  # noqa: F401, E402

__all__ = ["REGISTRY", "Query", "query"]
