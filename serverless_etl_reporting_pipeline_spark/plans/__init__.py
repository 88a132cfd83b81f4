"""Query corpus: every SURVEY.md §2 operator as a named, oracle-checked query.

Importing this package populates the registry from all corpus modules.
"""

from serverless_etl_reporting_pipeline_spark.plans.base import REGISTRY, Query, query

# corpus modules register themselves on import. Registration ORDER is
# deliberate: the driver's differential oracle verifies the first 50
# registry entries per round, so the groups that have not yet received a
# driver-verified correctness row (round 1 covered analytics/relational/
# windows/t01-t04) register first this round; the already-driver-green
# relational set rotates to the tail and stays covered by the local
# mirror (tools/oracle_check.py) plus tests/test_oracle_corpus.py.
from serverless_etl_reporting_pipeline_spark.plans import text  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import vectors  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import multimodal  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import streams  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import lakehouse  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import analytics  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import windows  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import relational  # noqa: F401, E402

__all__ = ["REGISTRY", "Query", "query"]
