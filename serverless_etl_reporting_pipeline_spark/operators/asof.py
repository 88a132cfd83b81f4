"""Distributed as-of (backward) join — the time-series lookup operator
the reference's stack has no equivalent for (SURVEY.md §2.3 notes only
equi-joins exist; as-of is the canonical extension for event streams).

Semantics: for every left row, attach the payload of the LATEST right
row with the same key and ``right_ts <= left_ts`` (inclusive), or nulls
if none exists — i.e. DuckDB's ``ASOF LEFT JOIN`` with a backward
direction, which is exactly what the oracle uses.

Physical strategy: tag both sides, union them, and run one per-key
event-time-ordered window computing ``last(payload, ignoreNulls)`` over
an unbounded-preceding ROWS frame; keep only left rows. Cost profile at
100 TB: ONE shuffle on the key (no O(|L|·|R|) range-join blowup, no
per-row binary search), linear per-partition state, and the shuffle can
be pre-paid entirely by bucketing both tables on the key
(sources/lake.py write_bucketed). Right rows sort before left rows at
equal timestamps, which is what makes the bound inclusive.

Caller contract: right must be unique per (key, right_ts) — pre-dedupe
with a groupBy (as j06 does with max(event_id)) or the tie is
nondeterministic in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: left columns + latest-at-or-before payload columns.

    ``payload_cols`` are right-side columns to carry (must not clash with
    left column names — alias on the right side first; include the right
    timestamp itself if the match time is wanted downstream).
    """
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns clash with left columns: {sorted(clash)}")
    left_only = [c for c in left.columns if c not in on]

    # The payload travels as ONE struct so the latest right row wins
    # atomically — per-column last(ignorenulls) would skip a legitimately
    # NULL payload value and stitch together columns from different right
    # rows (diverging from ASOF semantics).
    payload_type = T.StructType([right.schema[p] for p in payload_cols])
    l2 = left.select(
        *on,
        *left_only,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_p"),
    )
    r2 = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*payload_cols).alias("_p"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l2.unionByName(r2).select(
        *on,
        *left_only,
        "_side",
        F.last("_p", ignorenulls=True).over(w).alias("_p"),
    )
    return filled.filter(F.col("_side") == 1).select(*on, *left_only, "_p.*")
