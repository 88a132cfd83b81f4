"""Event-stream corpus: windowed aggregations in batch form
(SURVEY.md §2.9). `window()` / `session_window()` are the same operators
Structured Streaming uses — running them in batch keeps them
oracle-checkable; `streaming/` wires the identical plans behind
readStream + watermark + AvailableNow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.functions.money import money_sum
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table


@query(
    "s01_tumbling_1h",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling 1h window agg — streaming operator in batch form (SURVEY.md §2.9)",
)
def s01_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "s02_sliding_1h_15m",
    oracle="""
    SELECT ws AS window_start, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM (
        SELECT value,
               date_trunc('hour', ts)
                 + to_minutes(CAST((minute(ts) // 15) * 15 AS BIGINT))
                 - to_minutes(CAST(k * 15 AS BIGINT)) AS ws,
               ts
        FROM events, UNNEST(generate_series(0, 3)) AS u(k)
    )
    WHERE ts >= ws AND ts < ws + INTERVAL 60 MINUTE
    GROUP BY ws
    """,
    doc="sliding 1h/15m window agg — each event in 4 overlapping epoch-aligned windows",
)
def s02_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "s03_session_window_30m",
    oracle="""
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    )
    GROUP BY user_id, session_id
    """,
    doc="session_window(30m) — gap-based sessions; oracle is the lag/cumsum batch formulation "
    "(sessions split when gap >= 30m, matching session_window's half-open [start, last+30m) semantics)",
)
def s03_session_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("total_value"))
        .select(F.col("user_id"), F.col("w.start").alias("session_start"), "n_events", "total_value")
    )
