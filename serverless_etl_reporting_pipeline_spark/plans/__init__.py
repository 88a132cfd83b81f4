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
from serverless_etl_reporting_pipeline_spark.plans import sketches  # noqa: F401, E402
from serverless_etl_reporting_pipeline_spark.plans import pipeline  # noqa: F401, E402

# Registry ORDER is deliberate: the driver's differential oracle verifies
# the first 50 registry entries per round. Rotation policy for round 7:
#   1. _PRIORITY first — every query ADDED this round (v14, x05, e08,
#      v15/v16: the IVF ingest-assignment kernel behind streaming/ivf.py
#      and the Lloyd quantizer-refresh step),
#      every query whose CODE or ORACLE changed this round (x01: null-
#      propagating key + oracle h-filter; v11: semdedup degenerate-input
#      guards; pipe01/pipe02: the shared annotate_batch/mixture_report
#      refactors; x03: the _kmin_sets extraction; v12: probe_band_index split
#      for the streaming vector-dedup twin), then the round-6
#      verdict's mandatory cohort: the 28 queries whose last driver row
#      is round 4 (a01-a11, c01-c06, c09, e01-e05, s01-s03, w08, w09 —
#      code untouched since; sf0.01-verified every round). 39 slots.
#   2. The remaining 11 slots float the oldest r5-era greens
#      (registration order) into the window; v08/t13/t17/t18/t19/t01
#      and the rest defer to round 8.
# CORPUS POLICY (round-7 verdict ask #8): the query corpus is feature-
# complete at 127 entries. New queries are capped at ~5 per round so the
# 50-slot driver window re-verifies every query within ~2.5 rounds;
# freed slots go to rotation cadence, oldest driver row first.
# Deferred queries stay covered every round by tools/oracle_check.py
# (full registry at sf0.01 pre-commit) and the spark.sql conformance test.
_R4_ERA = frozenset(
    [f"a{i:02d}" for i in range(1, 12)]
    + [f"c{i:02d}" for i in range(1, 7)]
    + ["c09"]
    + [f"e{i:02d}" for i in range(1, 6)]
    + [f"s{i:02d}" for i in range(1, 4)]
    + ["w08", "w09"]
)

_PRIORITY = (
    # added this round
    "v14", "x05", "e08", "v15", "v16",
    # code/oracle changed this round (x03: _kmin_sets extraction)
    "x01", "v11", "pipe01", "pipe02", "x03", "v12",
    # late-r7 shingles() short-doc guard (operators/text.py): every
    # registry consumer of the changed expression rotates in — direct
    # (t07/t15/t19/t24) and via minhash._shingle_sets (t09/t11/t20/c08);
    # pipe01/pipe02 (via funnel.shingle_set) and c02 are already above
    "t07", "t15", "t19", "t24", "t09", "t11", "t20", "c08",
    # late-r7 sketch review: per-split (not per-batch) Arrow partials +
    # count fold (x01), bounded Misra-Gries summary (x02); x03/x05
    # (_kmin_sets) are already above
    "x02",
) + tuple(sorted(_R4_ERA))

# oldest r5-era greens (last driver row round 5, code untouched):
# float as many as fit the remaining window slots
_R5_ERA_TAIL = (
    "m01", "m02", "m03", "m04",
    "v01", "v02", "v03", "v04", "v05", "v06", "v07", "v08",
    "t13", "t17", "t18", "t19", "t01",
)


def _rotate() -> None:
    entries = list(REGISTRY.items())
    REGISTRY.clear()
    for want in _PRIORITY + _R5_ERA_TAIL:
        for name, q in entries:
            if name.split("_", 1)[0] == want:
                REGISTRY[name] = q
    for name, q in entries:
        if name not in REGISTRY:
            REGISTRY[name] = q


_rotate()

__all__ = ["REGISTRY", "Query", "query"]
