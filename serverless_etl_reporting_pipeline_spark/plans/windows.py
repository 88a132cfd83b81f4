"""Window-function corpus (SURVEY.md §2.8).

The reference has no window functions; these are the principled upgrades
of its hand patterns: share-of-total (athena_queries.sql:31), per-group
argmax (athena_queries.sql:139-146), moving average / lag-delta /
running total over the daily-revenue trend (dashboard.py:143-152), and
gap-based sessionization of the events stream.

Scale notes: every window here partitions by a real key (event_type,
user_id) or runs over an already-aggregated tiny frame — no whole-table
single-partition windows over raw data. Money values ride through the
windows as exact integer cents (functions/money.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.functions.money import duck_metric, duck_sum, metric, cents, money_sum
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table

# o_orderdate IS NOT NULL in BOTH engines: a NULL date has no place on
# a time axis, and the engines disagree on where it would sit in the
# window's ORDER BY (Spark nulls-first vs DuckDB NULLS LAST) — so every
# running/moving/lag frame over the daily series would silently shift
# by one row around it (r8 degenerate-input sweep, TPC-H extension)
_DUCK_DAILY_CENTS = """
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS d_cents
        FROM orders
        WHERE o_orderdate IS NOT NULL
        GROUP BY 1
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.sum(cents("o_totalprice")).alias("d_cents"))
    )


@query(
    "w01_top1_hour_per_type",
    oracle="""
    SELECT event_type, peak_hour, transactions
    FROM (
        SELECT event_type,
               CAST(hour(ts) AS INT) AS peak_hour,
               count(*) AS transactions,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY count(*) DESC, CAST(hour(ts) AS INT)
               ) AS rn
        FROM events
        GROUP BY event_type, hour(ts)
    )
    WHERE rn = 1
    """,
    doc="per-group argmax via row_number — upgrade of athena_queries.sql:139-146 / generate_report.py:98-101",
)
def w01_top1_hour_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy("event_type", F.hour("ts").alias("peak_hour")).agg(
        F.count("*").alias("transactions")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("transactions"), F.asc("peak_hour"))
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "peak_hour", "transactions")
    )


@query(
    "w02_share_of_total",
    oracle="""
    SELECT status,
           rev_cents / 100.0 AS revenue,
           round(rev_cents * 10000.0 / sum(rev_cents) OVER ()) / 100.0 AS pct_of_total
    FROM (
        SELECT o_orderstatus AS status,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders
        GROUP BY o_orderstatus
    )
    """,
    doc="share-of-total window — upgrade of athena_queries.sql:31 scalar subquery",
)
def w02_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    grouped = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.sum(cents("o_totalprice")).alias("rev_cents")
    )
    w = Window.partitionBy()
    return grouped.select(
        "status",
        (F.col("rev_cents") / 100.0).alias("revenue"),
        (F.round(F.col("rev_cents") * 10000.0 / F.sum("rev_cents").over(w)) / 100.0).alias("pct_of_total"),
    )


@query(
    "w03_moving_avg_daily",
    oracle=f"""
    SELECT order_date,
           d_cents / 100.0 AS revenue,
           round(avg(d_cents) OVER (
               ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           )) / 100.0 AS ma7
    FROM ({_DUCK_DAILY_CENTS})
    """,
    doc="7-row moving average over daily trend — planned extension of dashboard.py:143-152",
)
def w03_moving_avg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(spark, sf_dir)
    w = Window.orderBy("order_date").rowsBetween(-6, 0)
    return daily.select(
        "order_date",
        (F.col("d_cents") / 100.0).alias("revenue"),
        (F.round(F.avg("d_cents").over(w)) / 100.0).alias("ma7"),
    )


@query(
    "w04_lag_delta_daily",
    oracle=f"""
    SELECT order_date,
           d_cents / 100.0 AS revenue,
           (d_cents - lag(d_cents) OVER (ORDER BY order_date)) / 100.0 AS delta_vs_prev
    FROM ({_DUCK_DAILY_CENTS})
    """,
    doc="lag/delta day-over-day — window upgrade (SURVEY.md §2.8)",
)
def w04_lag_delta_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(spark, sf_dir)
    w = Window.orderBy("order_date")
    return daily.select(
        "order_date",
        (F.col("d_cents") / 100.0).alias("revenue"),
        ((F.col("d_cents") - F.lag("d_cents").over(w)) / 100.0).alias("delta_vs_prev"),
    )


@query(
    "w05_running_total_by_month",
    oracle="""
    SELECT ym,
           m_cents / 100.0 AS revenue,
           sum(m_cents) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_revenue
    FROM (
        -- NULL dates excluded: no place on the time axis, and the
        -- engines disagree on its cumulative-frame position (see
        -- _DUCK_DAILY_CENTS)
        SELECT strftime(o_orderdate, '%Y-%m') AS ym,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m_cents
        FROM orders
        WHERE o_orderdate IS NOT NULL
        GROUP BY 1
    )
    """,
    doc="running total (cumulative frame) — SURVEY.md §2.8 frame-spec note",
)
def w05_running_total_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(F.sum(cents("o_totalprice")).alias("m_cents"))
    )
    w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "ym",
        (F.col("m_cents") / 100.0).alias("revenue"),
        (F.sum("m_cents").over(w) / 100.0).alias("running_revenue"),
    )


@query(
    "w06_sessionization",
    oracle=f"""
    -- NaN value = corrupt telemetry: the event still sessionizes and
    -- counts, its measurement is NULL (the metric contract)
    SELECT user_id,
           count(DISTINCT session_id) AS sessions,
           count(*) AS events,
           {duck_sum(f"({duck_metric('value')})")} AS total_value
    FROM (
        SELECT user_id, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            -- ts IS NOT NULL: a session needs an event time (the s03
            -- contract; a kept NULL ts would float to opposite ends of
            -- the lag frame per engine — Spark nulls-first vs DuckDB
            -- NULLS LAST — and change the session count)
            FROM events WHERE ts IS NOT NULL
        )
    )
    GROUP BY user_id
    """,
    doc="gap-based sessionization (lag + cumsum) — batch form of session_window "
    "(SURVEY.md §2.9); NULL event times excluded on both engines",
)
def w06_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap in exact microseconds — second-truncating casts would disagree
    # with the oracle on sub-second boundaries (ntz→timestamp is identity
    # under the pinned UTC session timezone)
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.lag(micros).over(wo)
    with_new = events.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    )
    with_session = with_new.withColumn(
        "session_id", F.sum("is_new").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_session.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("sessions"),
        F.count("*").alias("events"),
        money_sum(metric("value")).alias("total_value"),
    )


@query(
    "w08_event_debounce",
    # Timestamps compare as exact microsecond values in both engines;
    # the 300-second threshold is integer arithmetic on epoch µs.
    oracle="""
    SELECT user_id, event_type, ts, event_id
    FROM (
        SELECT user_id, event_type, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        -- ts IS NOT NULL: an event without a time cannot participate
        -- in time-windowed dedup (and would shift every lag frame it
        -- lands in — nulls-first vs NULLS LAST per engine)
        FROM events WHERE ts IS NOT NULL
    )
    WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 300000000
    ORDER BY user_id, event_type, ts, event_id
    """,
    doc="time-windowed event dedup (debounce): keep an event only if the same "
    "user's previous event of the same type is more than 5 minutes older "
    "(NULL event times excluded on both engines) — the "
    "double-click / retry / at-least-once-delivery compaction every event "
    "pipeline runs (streaming form: dropDuplicatesWithinWatermark, tested in "
    "streaming/). One lag window keyed by (user, type): a single shuffle, "
    "per-key ordering inside partitions, no global sort at scale",
)
def w08_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_type", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts"))
        # interval arithmetic (not unix_micros: ts is TIMESTAMP_NTZ) —
        # exact µs comparison, identical to the oracle's epoch_us gap
        .filter(F.col("prev_ts").isNull() | F.expr("ts > prev_ts + INTERVAL 300 SECONDS"))
        .select("user_id", "event_type", "ts", "event_id")
        .orderBy("user_id", "event_type", "ts", "event_id")
    )


@query(
    "w09_diversified_topk",
    oracle="""
    SELECT orderkey, custkey, totalprice
    FROM (
        SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 2
    ORDER BY totalprice DESC, orderkey
    LIMIT 20
    """,
    doc="diversified top-k: global top-20 orders by value with at most 2 per "
    "customer — the per-source/per-domain result diversification rule of search "
    "and sampling pipelines (same shape caps per-domain docs in a corpus "
    "sample). One window shuffle keyed by the diversity key, then a global "
    "top-k over the per-key survivors (TakeOrderedAndProject, never a full "
    "sort); WindowGroupLimit prunes rn > 2 before the window sort at scale",
)
def w09_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(20)
    )


@query(
    "w07_nation_revenue_quartiles",
    oracle="""
    SELECT nation,
           rev_cents / 100.0 AS revenue,
           ntile(4) OVER (ORDER BY rev_cents DESC, nation) AS quartile,
           round(percent_rank() OVER (ORDER BY rev_cents DESC, nation) * 10000) / 10000.0 AS pct_rank
    FROM (
        SELECT n_name AS nation,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    )
    """,
    doc="ranking windows (ntile quartiles + percent_rank) over the per-nation aggregate — "
    "runs on the 25-row grouped result, never the raw facts (SURVEY.md §2.8)",
)
def w07_nation_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    grouped = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(cents("o_totalprice")).alias("rev_cents"))
    )
    w = Window.orderBy(F.desc("rev_cents"), F.asc("nation"))
    return grouped.select(
        "nation",
        (F.col("rev_cents") / 100.0).alias("revenue"),
        F.ntile(4).over(w).alias("quartile"),
        (F.round(F.percent_rank().over(w) * 10000) / 10000.0).alias("pct_rank"),
    )


@query(
    "w10_daily_ohlc",
    # Pure ANSI (also Spark-SQL-conformant): open/close come from
    # first_value/last_value with an explicit (ts, event_id) tie-break —
    # deterministic even under equal timestamps — and every emitted
    # price is exact integer cents.
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(round(value * 100) AS BIGINT) AS cents, ts, event_id
        -- an OHLC bar needs a NUMBER: NULL and NaN measurements are
        -- excluded from the bars (and their n_events) on both engines
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    w AS (
        SELECT event_type, day, cents,
               -- cents in the tie-break: a duplicated event_id with a
               -- conflicting value must still yield ONE deterministic
               -- open/close on both engines (r10 duplicate-id hunt)
               -- NULLS FIRST written out (r10 ADVICE): the upstream
               -- NULL/NaN filter makes the default orders coincide
               -- today, but Spark sorts NULLS FIRST and DuckDB NULLS
               -- LAST — pin it so the tie-break never silently depends
               -- on that filter staying in place (the d02 pattern)
               first_value(cents) OVER (
                   PARTITION BY event_type, day
                   ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST,
                            cents ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS open_c,
               last_value(cents) OVER (
                   PARTITION BY event_type, day
                   ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST,
                            cents ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS close_c
        FROM e
    )
    SELECT event_type, day,
           CAST(min(open_c) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(min(close_c) AS BIGINT) AS close_cents,
           CAST(count(*) AS BIGINT) AS n_events
    FROM w
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    doc="OHLC / candlestick downsampling: per (event_type, day) the opening value "
    "(first by ts, event_id), high, low, closing value (last), and count — the "
    "canonical time-series roll-up that turns a raw event stream into fixed-"
    "period bars for dashboards and feature windows. Scale shape: ONE keyed "
    "window + aggregate sharing the same (event_type, day) shuffle — Catalyst "
    "reuses the partitioning, no global sort (SURVEY.md §2.8)",
)
def w10_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    e = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        cents("value").alias("cents"),
        "ts",
        "event_id",
    )
    # cents joins the tie-break: a DUPLICATED event_id carrying a
    # conflicting value (the r10 duplicate-id hunt) would otherwise make
    # open/close nondeterministic — (ts, event_id) no longer names one
    # row, and each engine picked its own "first"
    # asc_nulls_first explicitly (Spark's asc default, but the oracle
    # pins NULLS FIRST too — the tie-break must not depend on the
    # upstream NULL/NaN filter; see the oracle comment)
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy(
            F.asc_nulls_first("ts"),
            F.asc_nulls_first("event_id"),
            F.asc_nulls_first("cents"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    withoc = e.select(
        "event_type", "day", "cents",
        F.first("cents").over(w).alias("open_c"),
        F.last("cents").over(w).alias("close_c"),
    )
    return (
        withoc.groupBy("event_type", "day")
        .agg(
            F.min("open_c").cast("bigint").alias("open_cents"),
            F.max("cents").cast("bigint").alias("high_cents"),
            F.min("cents").cast("bigint").alias("low_cents"),
            F.min("close_c").cast("bigint").alias("close_cents"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy("event_type", "day")
    )
