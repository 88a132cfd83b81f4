"""Athena analytics corpus (reference `pipeline/athena_queries.sql`)
re-expressed over the fixture star schema.

Role mapping (FIXTURES.md §2): `orders`+`lineitem` ≙ the transactions
fact; `customer`/`nation`/`region` ≙ dims; `o_orderdate` ≙ `at`;
`events` carries the time-of-day axis (order dates are date-only).

All money aggregates use exact integer-cents arithmetic (see
`functions/money.py`) so results are order-independent and hash-stable
vs the DuckDB oracle. Aggregations are low-cardinality group-bys: at
100 TB they execute as partial (map-side) + final HashAggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.functions.money import metric, cents, duck_avg, duck_metric, duck_sum, money_avg, money_sum
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table


def _rev():
    """Line-level revenue, the corpus' `total`."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_DUCK_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "a01_totals",
    oracle=f"""
    SELECT {duck_sum(_DUCK_REV)} AS total_revenue,
           count(*) AS total_transactions,
           {duck_avg('l_extendedprice')} AS avg_price
    FROM lineitem
    """,
    doc="A1 ungrouped multi-agg — athena_queries.sql:18-23",
)
def a01_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        money_sum(_rev()).alias("total_revenue"),
        F.count("*").alias("total_transactions"),
        money_avg("l_extendedprice").alias("avg_price"),
    )


def _fact_with_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation, dims broadcast.

    The reference denormalizes this at extract time (extract.py:86-101);
    Spark-first we keep the fact normalized and broadcast the small dims
    so the big side never shuffles (J1).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )


@query(
    "a02_revenue_by_nation",
    oracle=f"""
    SELECT nation,
           total_transactions,
           rev_cents / 100.0 AS total_revenue,
           avg_transaction_value,
           round(rev_cents * 10000.0 / sum(rev_cents) OVER ()) / 100.0 AS revenue_percentage
    FROM (
        SELECT n_name AS nation,
               count(*) AS total_transactions,
               CAST(sum(CAST(round(({_DUCK_REV}) * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
               {duck_avg(_DUCK_REV)} AS avg_transaction_value
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    )
    """,
    doc="A2 + A10 share-of-total — athena_queries.sql:25-34 (scalar subquery → window)",
)
def a02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = _fact_with_nation(spark, sf_dir).select(F.col("n_name").alias("nation"), _rev().alias("rev"))
    grouped = fact.groupBy("nation").agg(
        F.count("*").alias("total_transactions"),
        F.sum(cents(F.col("rev"))).alias("rev_cents"),
        money_avg("rev").alias("avg_transaction_value"),
    )
    # share-of-total as a window over the 25-row aggregate (cheap even at
    # 100 TB: the window runs on the grouped result, not the fact)
    w = Window.partitionBy()
    return grouped.select(
        "nation",
        "total_transactions",
        (F.col("rev_cents") / 100.0).alias("total_revenue"),
        "avg_transaction_value",
        (F.round(F.col("rev_cents") * 10000.0 / F.sum("rev_cents").over(w)) / 100.0).alias("revenue_percentage"),
    )


@query(
    "a03_revenue_by_status",
    oracle=f"""
    SELECT o_orderstatus AS status,
           count(*) AS transactions,
           {duck_sum('o_totalprice')} AS revenue,
           {duck_avg('o_totalprice')} AS avg_value
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="A3 group-by payment method analog — athena_queries.sql:36-44",
)
def a03_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("transactions"),
        money_sum("o_totalprice").alias("revenue"),
        money_avg("o_totalprice").alias("avg_value"),
    )


@query(
    "a04_daily_revenue",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(month(o_orderdate) AS INT) AS month,
           CAST(day(o_orderdate) AS INT) AS day,
           count(*) AS transactions,
           {duck_sum('o_totalprice')} AS daily_revenue,
           {duck_avg('o_totalprice')} AS avg_transaction
    FROM orders
    GROUP BY 1, 2, 3
    """,
    doc="A4 composite time key — athena_queries.sql:49-59; partition cols via P9",
)
def a04_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            F.dayofmonth("o_orderdate").alias("day"),
        ).agg(
            F.count("*").alias("transactions"),
            money_sum("o_totalprice").alias("daily_revenue"),
            money_avg("o_totalprice").alias("avg_transaction"),
        )
    )


@query(
    "a05_hourly_events",
    oracle=f"""
    -- NaN value = corrupt telemetry: the event still counts, its
    -- measurement is NULL (functions/money.py metric contract)
    SELECT CAST(hour(ts) AS INT) AS hour_of_day,
           count(*) AS transactions,
           {duck_sum(f"({duck_metric('value')})")} AS revenue
    FROM events
    GROUP BY 1
    """,
    doc="A5 group-by derived expr HOUR(at) — athena_queries.sql:61-68 (events carry time-of-day)",
)
def a05_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.hour("ts").alias("hour_of_day")).agg(
        F.count("*").alias("transactions"),
        money_sum(metric("value")).alias("revenue"),
    )


@query(
    "a06_day_of_week",
    oracle=f"""
    SELECT strftime(o_orderdate, '%A') AS day_of_week,
           count(*) AS transactions,
           {duck_sum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1
    """,
    doc="A5 DATE_FORMAT('%W') weekday — athena_queries.sql:70-77; F3",
)
def a06_day_of_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.date_format("o_orderdate", "EEEE").alias("day_of_week")).agg(
        F.count("*").alias("transactions"),
        money_sum("o_totalprice").alias("revenue"),
    )


@query(
    "a07_daily_nation_revenue",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(month(o_orderdate) AS INT) AS month,
           CAST(day(o_orderdate) AS INT) AS day,
           n_name AS nation,
           count(*) AS transactions,
           {duck_sum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2, 3, 4
    """,
    doc="A6 two-dim group — athena_queries.sql:82-92 best-truck-by-day analog",
)
def a07_daily_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            F.dayofmonth("o_orderdate").alias("day"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.count("*").alias("transactions"),
            money_sum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "a08_distinct_by_segment",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           count(DISTINCT c_nationkey) AS num_nations,
           count(*) AS customers,
           {duck_sum('c_acctbal')} AS total_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="A7 COUNT(DISTINCT) within groups — athena_queries.sql:94-101",
)
def a08_distinct_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.countDistinct("c_nationkey").alias("num_nations"),
        F.count("*").alias("customers"),
        money_sum("c_acctbal").alias("total_balance"),
    )


@query(
    "a09_priority_impact",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           count(DISTINCT o_custkey) AS num_customers,
           count(*) AS transactions,
           {duck_avg('o_totalprice')} AS avg_transaction,
           {duck_sum('o_totalprice')} AS total_revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="A7 fsa-rating impact analog — athena_queries.sql:103-112",
)
def a09_priority_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").alias("num_customers"),
        F.count("*").alias("transactions"),
        money_avg("o_totalprice").alias("avg_transaction"),
        money_sum("o_totalprice").alias("total_revenue"),
    )


@query(
    "a10_avg_daily_revenue",
    oracle="""
    SELECT round(avg(d_cents)) / 100.0 AS avg_daily_revenue
    FROM (
        SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS d_cents
        FROM orders
        GROUP BY CAST(o_orderdate AS DATE)
    )
    """,
    doc="A9 two-level agg (agg of agg) — dashboard.py:126-127",
)
def a10_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.to_date("o_orderdate").alias("d_date"))
        .agg(F.sum(cents("o_totalprice")).alias("d_cents"))
        .agg((F.round(F.avg("d_cents")) / 100.0).alias("avg_daily_revenue"))
    )


@query(
    "a11_conditional_share",
    oracle="""
    SELECT round(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 10000.0 / count(*)) / 100.0 AS purchase_pct,
           CAST(sum(CASE WHEN contains(lower(event_type), 'purchase')
                         THEN CAST(round(value * 2.0) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS purchase_fees,
           count(*) AS total_events
    FROM events
    """,
    doc="A10 conditional share + A13/P11 card-fee pattern — dashboard.py:130-132, generate_report.py:120-131",
)
def a11_conditional_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # fee = 2% of value ⇒ fee-cents = round(value * 2.0), exact integers
    fee_cents = F.when(
        F.lower("event_type").contains("purchase"), F.round(F.col("value") * 2.0).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    is_purchase = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    return events.agg(
        (F.round(F.sum(is_purchase) * 10000.0 / F.count(F.lit(1))) / 100.0).alias("purchase_pct"),
        (F.sum(fee_cents) / 100.0).alias("purchase_fees"),
        F.count("*").alias("total_events"),
    )


@query(
    "a12_watermark_bounds",
    oracle="""
    SELECT min(o_orderdate) AS first_at,
           max(o_orderdate) AS last_at,
           count(*) AS total_rows
    FROM orders
    """,
    doc="A12 min/max watermark agg — extract.py:142, transform.py:62",
)
def a12_watermark_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.min("o_orderdate").alias("first_at"),
        F.max("o_orderdate").alias("last_at"),
        F.count("*").alias("total_rows"),
    )


@query(
    "a13_rollup_year_month",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(month(o_orderdate) AS INT) AS month,
           count(*) AS transactions,
           {duck_sum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP (1, 2)
    -- HAVING pins Spark's zero-rows -> zero-groups semantics: the SQL
    -- standard (and DuckDB) emit a count-0 grand-total row from EMPTY
    -- input; Spark's rollup/cube/groupingSets emit nothing. No-op on
    -- any non-empty input (every emitted group has count >= 1).
    HAVING count(*) > 0
    """,
    doc="rollup — free-in-Spark upgrade noted at SURVEY.md §2.4 (subtotals + grand total in one pass)",
)
def a13_rollup_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            "o_totalprice",
        )
        .rollup("year", "month")
        .agg(
            F.count("*").alias("transactions"),
            money_sum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "a14_pivot_status",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) / 100.0 AS status_f,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) / 100.0 AS status_o,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) / 100.0 AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="pivot (dashboard cross-tab analog) — SURVEY.md §2.4 note",
)
def a14_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(cents("o_totalprice")) / 100.0)
    )
    return pivoted.select(
        "priority",
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
        F.col("P").alias("status_p"),
    )


@query(
    "a15_cube_status_priority",
    oracle=f"""
    SELECT o_orderstatus AS status,
           o_orderpriority AS priority,
           count(*) AS transactions,
           {duck_sum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE (1, 2)
    -- HAVING pins Spark's zero-rows -> zero-groups semantics: the SQL
    -- standard (and DuckDB) emit a count-0 grand-total row from EMPTY
    -- input; Spark's rollup/cube/groupingSets emit nothing. No-op on
    -- any non-empty input (every emitted group has count >= 1).
    HAVING count(*) > 0
    """,
    doc="cube — the one-pass cross-tab-with-totals upgrade of the dashboard's "
    "truck x payment-method panels (SURVEY.md §2.4 closing note)",
)
def a15_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
        .cube("status", "priority")
        .agg(
            F.count("*").alias("transactions"),
            money_sum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "a16_grouping_sets",
    oracle="""
    SELECT o_orderstatus AS status,
           o_orderpriority AS priority,
           count(*) AS transactions,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    -- HAVING pins Spark's zero-rows -> zero-groups semantics: the SQL
    -- standard (and DuckDB) emit a count-0 grand-total row from EMPTY
    -- input; Spark's rollup/cube/groupingSets emit nothing. No-op on
    -- any non-empty input (every emitted group has count >= 1).
    HAVING count(*) > 0
    """,
    doc="explicit GROUPING SETS (per-status, per-priority, grand total in ONE pass over "
    "the facts — three dashboard panels for one scan+shuffle; Spark 4 DataFrame "
    "groupingSets API, SURVEY.md §2.4 closing note)",
)
def a16_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
        .groupingSets([["status"], ["priority"], []], "status", "priority")
        .agg(
            F.count("*").alias("transactions"),
            money_sum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "a17_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(pc) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(sum(pc * (100 - dp)) AS BIGINT) / 10000.0 AS sum_disc_price,
           CAST(sum(pc * (100 - dp) * (100 + tp)) AS BIGINT) / 1000000.0 AS sum_charge,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) / count(*) AS avg_qty,
           CAST(sum(pc) AS BIGINT) / count(*) / 100.0 AS avg_price,
           CAST(sum(dp) AS BIGINT) / count(*) / 100.0 AS avg_disc,
           count(*) AS count_order
    FROM (
        SELECT l_returnflag, l_linestatus, l_quantity,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
               CAST(round(l_discount * 100) AS BIGINT) AS dp,
               CAST(round(l_tax * 100) AS BIGINT) AS tp
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    )
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shape pricing summary: the canonical partial+final multi-agg over the "
    "fact table, all money math as exact integer cents (discount/tax as integer "
    "hundredths) so every sum is order-independent and hash-exact cross-engine",
)
def a17_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    pc = cents("l_extendedprice")
    dp = F.round(F.col("l_discount") * 100).cast("bigint")
    tp = F.round(F.col("l_tax") * 100).cast("bigint")
    cutoff = F.lit("1998-09-02").cast(li.schema["l_shipdate"].dataType)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            (F.sum(pc) / 100.0).alias("sum_base_price"),
            (F.sum(pc * (100 - dp)) / 10000.0).alias("sum_disc_price"),
            (F.sum(pc * (100 - dp) * (100 + tp)) / 1000000.0).alias("sum_charge"),
            (F.sum(qty) / n).alias("avg_qty"),
            (F.sum(pc) / n / 100.0).alias("avg_price"),
            (F.sum(dp) / n / 100.0).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "a18_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0
               AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-shape shipping priority: selective dim filter, fact-fact join, "
    "HIGH-cardinality groupBy (one group per order) feeding TakeOrderedAndProject — "
    "the physical shape where per-group state dwarfs the result; exact cents math",
)
def a18_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1996-03-15").cast(orders.schema["o_orderdate"].dataType)
    pc = cents("l_extendedprice")
    dp = F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < cutoff), customer.c_custkey == orders.o_custkey)
        .join(li.filter(F.col("l_shipdate") > cutoff), F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(pc * (100 - dp)) / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "a19_funnel_cohorts",
    # Pure ANSI (also Spark-SQL-conformant): min-aggregates, an
    # equi-join with an inequality residual, interval arithmetic, and a
    # micro-quantized rate — no engine-private functions.
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase
        FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.signup_ts
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT CAST(date_trunc('week', signup_ts) AS DATE) AS cohort_week,
           CAST(count(*) AS BIGINT) AS n_signups,
           CAST(sum(CASE WHEN first_purchase IS NOT NULL
                          AND first_purchase <= signup_ts + INTERVAL 7 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           round(sum(CASE WHEN first_purchase IS NOT NULL
                           AND first_purchase <= signup_ts + INTERVAL 7 DAY
                          THEN 1 ELSE 0 END) * 1000000.0 / count(*)) / 1000000.0
               AS conv_rate
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    GROUP BY 1 ORDER BY 1
    """,
    doc="conversion funnel by signup cohort week: first signup per user, first "
    "purchase at-or-after it, converted = within 7 days; weekly cohort counts and "
    "micro-quantized conversion rate. Scale shape: two map-side-combined min-"
    "aggregates keyed on user_id, one user-key equi-join (inequality stays a "
    "residual filter, not a range join), then a low-cardinality cohort aggregate "
    "— the product-analytics staple the reference's Athena SQL cannot express "
    "without a self-join per funnel step",
)
def a19_funnel_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s.select("user_id", "signup_ts"), "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    conv = F.col("first_purchase").isNotNull() & (
        F.col("first_purchase") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAY")
    )
    converted = F.sum(F.when(conv, 1).otherwise(0)).cast("bigint")
    return (
        s.join(p, "user_id", "left")
        .groupBy(F.date_trunc("week", "signup_ts").cast("date").alias("cohort_week"))
        .agg(
            F.count("*").cast("bigint").alias("n_signups"),
            converted.alias("n_converted"),
            (F.round(converted * 1000000.0 / F.count("*")) / 1000000.0).alias("conv_rate"),
        )
        .orderBy("cohort_week")
    )


@query(
    "a20_retention_matrix",
    # Pure ANSI (also Spark-SQL-conformant): min-aggregate cohorts, an
    # integer day-difference bucketed to week offsets, count(DISTINCT)
    # per cell, micro-quantized rates.
    oracle="""
    WITH s AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users FROM s GROUP BY 1
    ),
    act AS (
        SELECT DISTINCT s.cohort_week, e.user_id,
               CAST(floor(date_diff('day', CAST(s.cohort_week AS TIMESTAMP), e.ts) / 7.0) AS INT)
                   AS week_offset
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.ts >= CAST(s.cohort_week AS TIMESTAMP)
    )
    SELECT act.cohort_week, act.week_offset,
           sizes.cohort_users,
           CAST(count(*) AS BIGINT) AS active_users,
           round(count(*) * 1000000.0 / sizes.cohort_users) / 1000000.0 AS retention
    FROM act JOIN sizes ON act.cohort_week = sizes.cohort_week
    GROUP BY act.cohort_week, act.week_offset, sizes.cohort_users
    ORDER BY act.cohort_week, act.week_offset
    """,
    doc="cohort retention matrix: users bucketed by signup cohort week, each cell = "
    "distinct users active in week N after their cohort start, as count and rate — "
    "the companion table to a19's conversion funnel and the other product-analytics "
    "staple Athena users hand-roll. Scale shape: one user-keyed min-aggregate, one "
    "user-keyed equi-join back over the activity stream (cohort frame is "
    "users-sized — AQE picks the join strategy), a DISTINCT on (cohort, user, "
    "offset), and a cell-level aggregate — no self-join per week column",
)
def a20_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
    )
    sizes = s.groupBy("cohort_week").agg(F.count("*").cast("bigint").alias("cohort_users"))
    cw_ts = F.col("cohort_week").cast("timestamp")
    act = (
        ev.join(s, "user_id")
        .filter(F.col("ts") >= cw_ts)
        .select(
            "cohort_week",
            "user_id",
            F.floor(F.datediff(F.col("ts").cast("date"), F.col("cohort_week")) / 7.0)
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        act.join(sizes, "cohort_week")
        .groupBy("cohort_week", "week_offset", "cohort_users")
        .agg(
            F.count("*").cast("bigint").alias("active_users"),
            (F.round(F.count("*") * 1000000.0 / F.col("cohort_users")) / 1000000.0).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )
