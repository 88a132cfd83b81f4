"""Skew-mitigation corpus queries (k-group): the salted two-phase
aggregate and salted replicated join from operators/skew.py, driven over
the `events` table so the 100×-scale skew claim has driver-verified
artifacts (VERDICT r3 §next-round #6).

Salting changes EXECUTION shape only — the results must be identical to
the plain groupBy/join, which is exactly what the oracles state. To keep
the hash compare immune to the salt-dependent combine order, every
aggregated measure is exact integer arithmetic: `value` doubles become
1e-2-quantized integer cents BEFORE aggregation (functions/money.py
discipline), counts/min/max are exact by construction.

At 100 TB: AQE's skew-join splitting (on in session.py) covers shuffle
joins; these operators cover what AQE cannot — skewed AGGREGATION keys
and broadcast-impossible skewed joins — at the cost of `salts`× dim
replication, which is the documented trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.skew import salted_agg, salted_join
from serverless_etl_reporting_pipeline_spark.functions.money import duck_metric, metric
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table


@query(
    "k01_salted_user_rollup",
    oracle=f"""
    -- NaN value = corrupt telemetry: the event still counts, its
    -- measurement is NULL (the metric contract)
    SELECT user_id,
           CAST(sum(CAST(round(({duck_metric('value')}) * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
           CAST(count(event_id) AS BIGINT) AS count_event_id,
           max(ts) AS max_ts
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="two-phase salted aggregation over the event stream's user key — the "
    "hot-key-proof form of a per-user rollup: phase 1 aggregates on "
    "(user_id, salt) with map-side combine and an even shuffle, phase 2 merges "
    "the ≤salts partials per user. A user holding 20% of a 100 TB stream "
    "bounds any single reducer to 1/salts of the hot key. Results are "
    "salt-invariant because every measure is exact integer math "
    "(operators/skew.py salted_agg)",
)
def k01_salted_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(metric("value") * 100).cast("bigint").alias("value_cents"),
    )
    out = salted_agg(
        ev,
        keys=["user_id"],
        aggs={"value_cents": "sum", "event_id": "count", "ts": "max"},
        salts=16,
    )
    return out.select(
        "user_id",
        F.col("sum_value_cents"),
        F.col("count_event_id").cast("bigint").alias("count_event_id"),
        "max_ts",
    ).orderBy("user_id")


@query(
    "k02_salted_nation_activity",
    oracle=f"""
    SELECT c.c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(({duck_metric('e.value')}) * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    ORDER BY nationkey
    """,
    doc="salted replicated join: the event fact stream joins the customer dim on "
    "a (potentially hot) user key with the fact side salted and the dim side "
    "exploded across all 8 salt values, turning one hot shuffle partition into "
    "8 even ones (operators/skew.py salted_join — the broadcast-impossible-dim "
    "escape hatch; with a broadcastable dim, j01's plain broadcast is the "
    "right plan). Join results are row-identical to the plain join, stated "
    "directly by the oracle; the rollup keeps integer-cents exactness",
)
def k02_salted_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.round(metric("value") * 100).cast("bigint").alias("value_cents"),
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    joined = salted_join(ev, dim, on=["user_id"], salts=8)
    return (
        joined.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("value_cents").alias("sum_value_cents"),
        )
        .orderBy("nationkey")
    )
