"""Query corpus: every SURVEY.md §2 operator as a named, oracle-checked query.

Importing this package populates the registry from all corpus modules.
"""

from serverless_etl_reporting_pipeline_spark.plans.base import REGISTRY, Query, query

# corpus modules register themselves on import.
from serverless_etl_reporting_pipeline_spark.plans import text  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import vectors  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import multimodal  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import streams  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import lakehouse  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import analytics  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import windows  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import relational  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import curation  # noqa: F401, E402

# Registry ORDER is deliberate: the driver's differential oracle verifies
# the first 50 registry entries per round. Rotation policy: queries with
# no driver-verified row from the most recent correctness run
# (CORRECTNESS_r02 covered the t/v/m/s/e/a01-a11 block) float to the
# front — that is p06/j06/j07, the r01-only relational/windows/a12-a18
# block, and anything newly added this round. The rotated-out r02-green
# block stays covered by the local mirror (tools/oracle_check.py) plus
# tests/test_oracle_corpus.py.
_R02_CHECKED = frozenset(
    [f"t{i:02d}" for i in range(1, 20)]
    + [f"v{i:02d}" for i in range(1, 9)]
    + [f"m{i:02d}" for i in range(1, 5)]
    + [f"s{i:02d}" for i in range(1, 4)]
    + [f"e{i:02d}" for i in range(1, 6)]
    + [f"a{i:02d}" for i in range(1, 12)]
)


def _rotate() -> None:
    entries = list(REGISTRY.items())
    REGISTRY.clear()
    for name, q in entries:
        if name.split("_", 1)[0] not in _R02_CHECKED:
            REGISTRY[name] = q
    for name, q in entries:
        if name not in REGISTRY:
            REGISTRY[name] = q


_rotate()

__all__ = ["REGISTRY", "Query", "query"]
