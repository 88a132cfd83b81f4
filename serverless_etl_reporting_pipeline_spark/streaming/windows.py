"""Streaming windowed aggregation + custom stateful operator
(SURVEY.md §2.9; north-star custom stateful ops).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "1 hour") -> DataFrame:
    """Tumbling event-time window with watermark (append-safe).

    Watermarks require TIMESTAMP (not NTZ); the cast is identity under
    the engine's pinned UTC session timezone.
    """
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose key was already seen, with
    state bounded by the event-time watermark (`dropDuplicatesWithinWatermark`).

    The streaming twin of the batch dedup family (t01/d02): an unbounded
    `dropDuplicates` on a stream would grow key-state forever; the
    watermark bound makes state size O(keys per watermark horizon) — the
    only shape that survives an always-on 100 TB/day ingest. Duplicates
    arriving within the horizon are dropped; a duplicate arriving after
    its original's watermark expiry is treated as new (documented
    at-least-once-per-horizon semantics).
    """
    keyed = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark("ts", watermark)
    return keyed.dropDuplicatesWithinWatermark(keys or ["event_id"])


RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
)


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + value sum across micro-batches. This is the
    pattern for operators Spark lacks natively (arbitrary per-key state
    machines) — state lives in the checkpoint, Arrow-batched per group.

    Kernel nested + local imports so cloudpickle ships it by value
    (workers need not import this package).
    """

    def update_running(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield _pd.DataFrame({"user_id": [key[0]], "events_seen": [n], "value_sum": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
