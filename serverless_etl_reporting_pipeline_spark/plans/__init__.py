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
from serverless_etl_reporting_pipeline_spark.plans import skewed  # noqa: F401, E402

# Registry ORDER is deliberate: the driver's differential oracle verifies
# the first 50 registry entries per round. Rotation policy: queries with
# no driver-verified row from the most recent correctness run float to
# the front. CORRECTNESS_r03 covered the a12-a18/w/j/p/o/d block plus
# t01-t12/t14-t16 — so this round floats the r2-only-checked block
# (t13, t17-t19, e, m, s, v, a01-a11) and everything newly added
# (c-group, k-group, the reworked v04) into the first 50. The
# rotated-out r03-green block stays covered by the local mirror
# (tools/oracle_check.py) plus tests/test_oracle_corpus.py.
_R03_CHECKED = frozenset(
    [f"a{i:02d}" for i in range(12, 19)]
    + [f"w{i:02d}" for i in range(1, 8)]
    + [f"j{i:02d}" for i in range(1, 8)]
    + [f"p{i:02d}" for i in range(1, 7)]
    + [f"o{i:02d}" for i in range(1, 4)]
    + [f"d{i:02d}" for i in range(1, 6)]
    + [f"t{i:02d}" for i in range(1, 13) ]
    + ["t14", "t15", "t16"]
)


def _rotate() -> None:
    entries = list(REGISTRY.items())
    REGISTRY.clear()
    for name, q in entries:
        if name.split("_", 1)[0] not in _R03_CHECKED:
            REGISTRY[name] = q
    for name, q in entries:
        if name not in REGISTRY:
            REGISTRY[name] = q


_rotate()

__all__ = ["REGISTRY", "Query", "query"]
