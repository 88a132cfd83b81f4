"""Stream-stream event-time joins (SURVEY.md §2.9 extension).

The batch interval join (operators/rangejoin.py, j07) has a true
streaming twin: Structured Streaming buffers both sides in watermarked
state and emits matches as they arrive. The event-time range condition
is what BOUNDS the state — without it (or without watermarks) the
buffers grow forever; with both, rows are evicted as soon as the
watermark proves no future match can exist. This is the always-on
version of "clicks within 5 minutes before each error".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    span_seconds: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner stream-stream join: same ``key`` and
    ``left_ts - span_seconds <= right_ts <= left_ts`` (inclusive).

    Both inputs are streaming frames; column names (other than ``key``)
    must not clash. Watermarks on BOTH sides plus the range predicate
    let Spark evict buffered rows once
    ``watermark(left) > right_ts + span_seconds`` — state is
    O(rows per watermark horizon), the only shape that runs forever.
    """
    l = left.withColumn(left_ts, F.col(left_ts).cast("timestamp")).withWatermark(
        left_ts, watermark
    )
    r = right.withColumn(right_ts, F.col(right_ts).cast("timestamp")).withWatermark(
        right_ts, watermark
    )
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {span_seconds} SECONDS"))
        & (r[right_ts] <= l[left_ts])
    )
    return l.join(r, cond, "inner").drop(r[key])
