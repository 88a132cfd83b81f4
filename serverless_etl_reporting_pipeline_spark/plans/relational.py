"""Relational operator corpus: joins, filters/projections, sorts/top-k,
distinct/dedup, set ops, scalar functions (SURVEY.md §2.1-2.3, §2.5-2.7).

Design-for-scale notes:
- dims (nation/region/customer at fixture scale) are broadcast — the fact
  side never shuffles for these joins;
- every top-k is ORDER BY + LIMIT, which Spark plans as
  TakeOrderedAndProject (per-partition heap, no global sort);
- LIMIT queries carry a unique tie-breaker so results are deterministic
  across engines;
- money aggregates use exact integer-cents arithmetic (functions/money.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.functions.money import cents, duck_avg, duck_sum, money_avg, money_sum
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table

# ---------------------------------------------------------------- joins


@query(
    "j01_flagship_daily_nation",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           r_name AS region,
           n_name AS nation,
           count(*) AS line_count,
           {duck_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
           {duck_avg('l_extendedprice * (1 - l_discount)')} AS avg_line_revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2, 3
    """,
    doc="J1 flagship: fact ⋈ broadcast dims → agg → sort — extract.py:86-107 + README.md:241-249",
)
def j01_flagship_daily_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.year("o_orderdate").alias("year"),
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.count("*").alias("line_count"),
            money_sum(rev).alias("revenue"),
            money_avg(rev).alias("avg_line_revenue"),
        )
        .orderBy(F.desc("revenue"))
    )


@query(
    "j02_year_filtered_join",
    oracle=f"""
    SELECT n_name AS nation,
           count(*) AS orders_1996,
           {duck_sum('o_totalprice')} AS revenue_1996
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1996
    GROUP BY n_name
    """,
    doc="J2 join + partition filter — README.md:241-249 (year pruning at the scan)",
)
def j02_year_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.filter(F.year("o_orderdate") == 1996)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("orders_1996"),
            money_sum("o_totalprice").alias("revenue_1996"),
        )
    )


@query(
    "j03_left_join_keep_empty",
    oracle="""
    SELECT n_nationkey AS nationkey,
           n_name AS nation,
           count(c_custkey) AS customer_count,
           coalesce(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT), 0) / 100.0 AS total_balance
    FROM nation
    LEFT JOIN customer ON n_nationkey = c_nationkey
    GROUP BY 1, 2
    """,
    doc="J3 left outer dim→fact, zero-sales groups kept — athena_queries.sql:124-134",
)
def j03_left_join_keep_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left")
        .groupBy(
            F.col("n_nationkey").alias("nationkey"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.count("c_custkey").alias("customer_count"),
            (F.coalesce(F.sum(cents("c_acctbal")), F.lit(0)) / 100.0).alias("total_balance"),
        )
    )


@query(
    "j04_semi_join_active_customers",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    doc="left-semi join (EXISTS) — generalization of IN-list filter P6, SURVEY.md §2.3 note",
)
def j04_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
    )


@query(
    "j05_anti_join_inactive_customers",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left-anti join (NOT EXISTS) — SURVEY.md §2.3 note; incremental-dedup building block",
)
def j05_anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
    )


# ------------------------------------------------- projections / filters


@query(
    "p01_projection_filter",
    oracle="""
    SELECT p_partkey AS partkey, p_name AS name, p_retailprice AS retailprice
    FROM part
    WHERE p_size > 25
    """,
    doc="P1 projection + P7 comparison predicate — extract.py:87-97; pushdown: PushedFilters on the scan",
)
def p01_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_size") > 25).select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_name").alias("name"),
        F.col("p_retailprice").alias("retailprice"),
    )


@query(
    "p02_cleaning_filters",
    oracle=f"""
    SELECT count(*) AS surviving_rows,
           {duck_sum('l_quantity')} AS total_qty,
           {duck_sum('l_extendedprice')} AS total_price
    FROM lineitem
    WHERE l_quantity IS NOT NULL
      AND l_quantity <> 0
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
    """,
    doc="P2 null + P3 inequality + P5 between + P6 in-list — transform.py:15-16, dashboard.py:98-109",
)
def p02_cleaning_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity").isNotNull())
        .filter(F.col("l_quantity") != 0)
        .filter(F.col("l_returnflag").isin("A", "R"))
        .filter(F.col("l_shipdate").between("1995-01-01 00:00:00", "1996-12-31 23:59:59"))
        .agg(
            F.count("*").alias("surviving_rows"),
            money_sum("l_quantity").alias("total_qty"),
            money_sum("l_extendedprice").alias("total_price"),
        )
    )


@query(
    "p03_high_value_topk",
    oracle="""
    SELECT o_orderkey AS orderkey, o_totalprice AS totalprice, o_orderstatus AS status
    FROM orders
    WHERE o_totalprice > 450000
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="P7/O3/O4 high-value top-k — athena_queries.sql:149-157 (tie-break: o_orderkey)",
)
def p03_high_value_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 450000)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderstatus").alias("status"),
        )
    )


@query(
    "p04_time_derivations",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           CAST(hour(ts) AS INT) AS event_hour,
           strftime(ts, '%A') AS day_name,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="P9 computed time columns — load.py:45-47, dashboard.py:47-49; F1-F4",
)
def p04_time_derivations(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.to_date("ts").alias("event_date"),
        F.hour("ts").alias("event_hour"),
        F.date_format("ts", "EEEE").alias("day_name"),
    ).agg(F.count("*").alias("n_events"))


@query(
    "p05_scalar_string_funcs",
    oracle="""
    SELECT lower(p_type) AS type_lower,
           count(*) AS parts,
           CAST(sum(length(p_name)) AS BIGINT) AS name_chars,
           CAST(sum(CAST(round(p_retailprice * 2.0) AS BIGINT)) AS BIGINT) / 100.0 AS fee_sum
    FROM part
    WHERE contains(lower(p_brand), 'brand')
    GROUP BY 1
    """,
    doc="F5-F7/F10 lower/contains/length/arith — generate_report.py:120-131, transform.py:21",
)
def p05_scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # 2% fee on retailprice ⇒ fee-cents = round(price * 2.0)
    fee_cents = F.round(F.col("p_retailprice") * 2.0).cast("bigint")
    return (
        part.filter(F.lower("p_brand").contains("brand"))
        .groupBy(F.lower("p_type").alias("type_lower"))
        .agg(
            F.count("*").alias("parts"),
            F.sum(F.length("p_name")).cast("bigint").alias("name_chars"),
            (F.sum(fee_cents) / 100.0).alias("fee_sum"),
        )
    )


# the lone-surrogate escape patterns (p06's shared contract, and the
# ReDoS-linearity inventory in tests/test_operators.py): applied AFTER
# escaped-backslash pairs are stripped to a placeholder, every match is
# a real JSON \uXXXX escape. Lookaround-free so DuckDB's RE2 runs the
# identical bytes; no nested quantifiers, so the scan is linear. The
# (?i) flag is itself an engine-divergence hazard (Java folds ASCII
# only, RE2 folds Unicode — Kelvin-sign K matches (?i)k in RE2 alone),
# but every letter here (u, d, hex a-f) has ZERO non-ASCII simple-fold
# partners (enumerated r12 over all assigned code points), so the flag
# is parity-safe in exactly these patterns. Don't reuse (?i) with k/s
# classes without re-checking.
LONE_SURROGATE_HI = r"(?i)\\ud[89ab][0-9a-f]{2}"
LONE_SURROGATE_LO = r"(?i)\\ud[c-f][0-9a-f]{2}"
LONE_SURROGATE_PAIR = r"(?i)\\ud[89ab][0-9a-f]{2}\\ud[c-f][0-9a-f]{2}"


@query(
    "p06_json_extraction",
    # The ADVERSARIAL-JSON contract (r11 hunt; the r8 json_valid guard
    # handled merely-malformed payloads). Three parser-divergence
    # classes found by probing Spark's Jackson against DuckDB's yyjson,
    # each pinned by a guard written on BOTH engines:
    #   1. RESOURCE BOUND: payloads with > 256 raw opening brackets
    #      ('{' or '[', strings included — a byte-level bound, cheap
    #      and engine-free) are adversarial and treated as
    #      unparseable. Jackson stops at nesting 1000 while yyjson is
    #      unbounded, so without the shared bound a depth-1500 payload
    #      extracts on one engine only; a 100 TB ingest wants the DoS
    #      bound anyway.
    #   2. MALFORMED ESCAPES: a lone UTF-16 surrogate escape
    #      ("\\ud800" with no low mate) is accepted by lenient Jackson
    #      and rejected by yyjson's validator. The guard is a count-
    #      based, backslash-parity-exact detector written VERBATIM on
    #      both engines (the bracket-bound precedent; r11 ADVICE — the
    #      old lookaround rlike false-positived on the ESCAPED-
    #      backslash text "\\\\ud800", valid JSON): strip escaped-
    #      backslash pairs with a non-backslash placeholder (so every
    #      surviving backslash starts a real escape, and a stripped
    #      pair cannot create false high/low adjacency), then the
    #      payload has a lone surrogate iff count(high escapes) !=
    #      count(adjacent high+low pairs) or count(low escapes) !=
    #      count(pairs) — equality holds iff every escape sits in an
    #      adjacent pair (greedy non-overlap pairs <= min(hi, lo), and
    #      pairs = hi = lo forces each escape paired). All patterns
    #      are lookaround-free, so RE2 (DuckDB) runs the same bytes,
    #      and linear-scan (no nested quantifiers — the r11 ReDoS
    #      class stays closed; pinned in test_operators).
    #   3. INTEGER LITERALS ONLY: DuckDB TRY_CAST('7.0' AS INT) = 7
    #      while Spark try_cast gives NULL — k contributes only when
    #      it is an optionally-signed integer literal (the oracle's
    #      regex guard mirrors Spark's strict string->int domain;
    #      overflow is NULL on both).
    oracle=r"""
    SELECT event_type,
           CAST(sum(TRY_CAST(CASE WHEN regexp_matches(trim(k), '^[+-]?[0-9]+$')
                                  THEN trim(k) END AS INT)) AS BIGINT) AS k_sum,
           count(*) AS n
    FROM (
        SELECT event_type,
               CASE WHEN length(props) - length(replace(replace(props, '{', ''), '[', '')) <= 256
                         AND json_valid(props)
                         AND len(regexp_extract_all(replace(props, '\\', '!'), '(?i)\\ud[89ab][0-9a-f]{2}'))
                             = len(regexp_extract_all(replace(props, '\\', '!'), '(?i)\\ud[89ab][0-9a-f]{2}\\ud[c-f][0-9a-f]{2}'))
                         AND len(regexp_extract_all(replace(props, '\\', '!'), '(?i)\\ud[c-f][0-9a-f]{2}'))
                             = len(regexp_extract_all(replace(props, '\\', '!'), '(?i)\\ud[89ab][0-9a-f]{2}\\ud[c-f][0-9a-f]{2}'))
                    THEN json_extract_string(props, '$.k') END AS k
        FROM events
    )
    GROUP BY event_type
    """,
    doc="JSON scalar extraction (props payload) with the adversarial-input "
    "contract — beyond reference surface (SURVEY.md §2.7 note)",
)
def p06_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # raw opening-bracket count: the shared parser-resource bound
    brackets = F.length("props") - F.length(
        F.translate("props", "{[", "")
    )
    # lone-surrogate escapes: the count-based parity-exact guard (see
    # the contract note above) — escaped-backslash pairs stripped to a
    # placeholder first so "\\ud800" (escaped backslash + text, valid
    # JSON) is NOT flagged while a real lone "\ud800" escape is
    stripped = F.replace(F.col("props"), F.lit("\\\\"), F.lit("!"))
    hi = F.regexp_count(stripped, F.lit(LONE_SURROGATE_HI))
    lo = F.regexp_count(stripped, F.lit(LONE_SURROGATE_LO))
    pr = F.regexp_count(stripped, F.lit(LONE_SURROGATE_PAIR))
    lone_surrogate = (hi != pr) | (lo != pr)
    k = F.when(
        (brackets <= 256) & ~F.coalesce(lone_surrogate, F.lit(False)),
        F.expr("get_json_object(props, '$.k')"),
    )
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            # the same literal integer guard the oracle writes (space-
            # trim + signed-digits regex), so the two engines share one
            # contract instead of two cast implementations
            F.sum(
                F.expr(
                    "try_cast(CASE WHEN trim(k) RLIKE '^[+-]?[0-9]+$' "
                    "THEN trim(k) END AS INT)"
                )
            ).alias("k_sum"),
            F.count("*").alias("n"),
        )
    )


# ------------------------------------------------------- sorts / top-k


@query(
    "o01_topk_revenue_days",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           count(*) AS transactions,
           {duck_sum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY revenue DESC, order_date
    LIMIT 10
    """,
    doc="O4 top-k after agg — dashboard.py:296-300 (TakeOrderedAndProject)",
)
def o01_topk_revenue_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.count("*").alias("transactions"),
            money_sum("o_totalprice").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("order_date"))
        .limit(10)
    )


@query(
    "o02_argmax_nation",
    oracle=f"""
    SELECT n_name AS nation, {duck_sum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, nation
    LIMIT 1
    """,
    doc="O5 argmax (best truck) — generate_report.py:98-101",
)
def o02_argmax_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(money_sum("o_totalprice").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
        .limit(1)
    )


@query(
    "o03_latest_orders",
    oracle="""
    SELECT o_orderkey AS orderkey, o_orderdate AS orderdate, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 100
    """,
    doc="O4 latest-100 preview — dashboard.py:341-343 (tie-break: o_orderkey)",
)
def o03_latest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(100)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


# ------------------------------------------- distinct / dedup / set ops


@query(
    "d01_distinct_projection",
    oracle="""
    SELECT DISTINCT c_mktsegment AS segment, c_nationkey AS nationkey
    FROM customer
    """,
    doc="D1 dim extraction via distinct — partition_transactions.py:14-18",
)
def d01_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    ).distinct()


@query(
    "d02_dedup_keep_first",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM (
        SELECT event_id, user_id, event_type, value,
               -- value joins the tie-break (NULLS FIRST = Spark's asc
               -- default): a duplicated event_id with a conflicting
               -- value must keep ONE deterministic row (r10 dup hunt)
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY event_id, value ASC NULLS FIRST) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    doc="D2 keyed dedup keep-first, deterministic by lowest id — transform.py:30-37 (SURVEY.md §7.3)",
)
def d02_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # value joins the tie-break: a duplicated event_id carrying a
    # conflicting value (r10 duplicate-id hunt) would otherwise make the
    # kept row nondeterministic; rows identical in every OUTPUT column
    # may still tie — either pick yields the same output row
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "event_id", F.col("value").asc_nulls_first()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "d03_union_all",
    oracle=f"""
    SELECT status, count(*) AS n, {duck_sum('price')} AS total
    FROM (
        SELECT 'open' AS status, o_totalprice AS price FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT 'finished' AS status, o_totalprice AS price FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY status
    """,
    doc="D3 union all — generate_report.py:57 (pd.concat)",
)
def d03_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    opened = orders.filter(F.col("o_orderstatus") == "O").select(
        F.lit("open").alias("status"), F.col("o_totalprice").alias("price")
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.lit("finished").alias("status"), F.col("o_totalprice").alias("price")
    )
    return (
        opened.unionByName(finished)
        .groupBy("status")
        .agg(F.count("*").alias("n"), money_sum("price").alias("total"))
    )


@query(
    "d04_except_customers",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    doc="EXCEPT — free-in-Spark set op (SURVEY.md §2.6 note)",
)
def d04_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey")).distinct()
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey")).distinct()
    return y95.exceptAll(y96)


@query(
    "d05_intersect_customers",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    doc="INTERSECT — free-in-Spark set op (SURVEY.md §2.6 note)",
)
def d05_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey")).distinct()
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey")).distinct()
    return y95.intersect(y96)


@query(
    "j06_asof_prior_view",
    oracle="""
    WITH v AS (
        SELECT user_id, ts AS view_ts, max(event_id) AS prior_view_id
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, v.prior_view_id,
           epoch_us(p.ts) - epoch_us(v.view_ts) AS gap_us
    FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND v.view_ts <= p.ts
    ORDER BY p.event_id
    """,
    doc="as-of (backward) join: each purchase matched to the user's latest view at-or-"
    "before it — union + last(ignoreNulls) window, ONE key shuffle, no range-join "
    "blowup (operators/asof.py; oracle = DuckDB native ASOF LEFT JOIN)",
)
def j06_asof_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.operators.asof import asof_backward_join

    events = load_table(spark, sf_dir, "events")
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(F.max("event_id").alias("prior_view_id"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_backward_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="view_ts",
        payload_cols=["prior_view_id", "view_ts"],
    )
    # gap as exact microseconds: a difference of epochs is timezone-shift
    # invariant, so the ntz->timestamp cast is oracle-safe in any session tz
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("view_ts").cast("timestamp")
    )
    return joined.select(
        "event_id", "user_id", "ts", "prior_view_id", gap.alias("gap_us")
    ).orderBy("event_id")


@query(
    "j07_interval_click_context",
    oracle="""
    SELECT error_id,
           count(*) AS n_clicks,
           max(click_id) AS last_click_id
    FROM (SELECT event_id AS error_id, user_id, ts FROM events WHERE event_type = 'error') e
    JOIN (SELECT event_id AS click_id, user_id, ts AS cts FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id
     AND c.cts >= e.ts - INTERVAL 5 MINUTE
     AND c.cts <= e.ts
    GROUP BY error_id
    ORDER BY error_id
    """,
    doc="interval (range) join: clicks within 5 min before each error, same user — "
    "time-bucket fan-out + equi-join on (key, bucket), never a nested-loop plan "
    "(operators/rangejoin.py; plan asserted in test_plan_quality)",
)
def j07_interval_click_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.operators.rangejoin import interval_join

    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    pairs = interval_join(
        errors, clicks, on=["user_id"], left_ts="ts", right_ts="cts",
        lower_us=-5 * 60 * 1_000_000, upper_us=0,
    )
    return (
        pairs.groupBy("error_id")
        .agg(F.count("*").alias("n_clicks"), F.max("click_id").alias("last_click_id"))
        .orderBy("error_id")
    )
