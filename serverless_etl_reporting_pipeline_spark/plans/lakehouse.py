"""Lakehouse/CDC corpus over the `events` table: SCD2 history building,
incremental merge-upsert, and histogram profiling.

The reference's whole ETL is the degenerate form of these: its
watermarked extract + append (`pipeline/ETL/extract.py:36-81`,
`load.py:50-56`) only ever *adds* rows. A real lake also needs the
update path — keyed upsert (MERGE INTO semantics) and slowly-changing-
dimension history — expressed here as pure DataFrame ops so they run on
plain parquet without a table format. (With Delta/Iceberg the same
logical plans drive `MERGE INTO`; see sources/lake.py for the
compaction/atomicity caveats of plain parquet.)

Determinism discipline matches the rest of the corpus: window
tie-breaks on `event_id`, timestamps compared as exact µs values,
`value` doubles pass through untouched (no re-aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.functions.money import duck_metric, metric
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table

# Merge watermarks (events span 2024-01-01 .. 2024-01-30; these split the
# signup stream so all three change classes actually occur at sf0.01:
# 44 inserted / 59 updated / 27 unchanged)
_MERGE_W1 = "2024-01-03"
_MERGE_W2 = "2024-01-06"


@query(
    "e01_scd2_history",
    # ts IS NOT NULL on BOTH sides: a version row needs a valid_from,
    # and a NULL event time inside the lead-window's ORDER BY would
    # otherwise sit at opposite ends of the frame per engine (Spark
    # nulls-first vs DuckDB NULLS LAST — the w03/w04/w05 class, found
    # by the r9 doctored NULL-ts purchase rows).
    oracle="""
    SELECT user_id, event_id, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM events
    WHERE event_type = 'purchase' AND ts IS NOT NULL
    ORDER BY user_id, valid_from
    """,
    doc="SCD2 history build: each purchase event becomes a versioned state row with "
    "[valid_from, valid_to) derived from the next event per user (lead window), "
    "open-ended row flagged current — the standard slowly-changing-dimension "
    "construction; events without a timestamp cannot be versioned and are "
    "excluded explicitly (both engines). One shuffle keyed by user_id; per-user "
    "sort inside partitions; no global sort at scale (the ORDER BY here is "
    "presentation only)",
)
def e01_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("ts").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


@query(
    "e02_merge_upsert",
    # The oracle states the POST-MERGE invariant directly (latest state
    # per key as of W2, classified by whether the key existed at W1 /
    # changed in (W1, W2]); the Spark side actually performs the merge:
    # base snapshot ⟗ delta batch, newest row wins.
    oracle=f"""
    WITH scoped AS (
        SELECT user_id, event_id, value, ts
        FROM events
        WHERE event_type = 'signup' AND ts <= TIMESTAMP '{_MERGE_W2}'
    ),
    latest AS (
        SELECT user_id, event_id, value, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM scoped
    ),
    flags AS (
        SELECT user_id,
               max(CASE WHEN ts <= TIMESTAMP '{_MERGE_W1}' THEN 1 ELSE 0 END) AS has_base,
               max(CASE WHEN ts > TIMESTAMP '{_MERGE_W1}' THEN 1 ELSE 0 END) AS has_delta
        FROM scoped
        GROUP BY user_id
    )
    SELECT l.user_id,
           l.event_id AS last_event_id,
           l.value AS last_value,
           l.ts AS last_ts,
           CASE WHEN has_delta = 0 THEN 'unchanged'
                WHEN has_base = 1 THEN 'updated'
                ELSE 'inserted' END AS change_type
    FROM latest l JOIN flags USING (user_id)
    WHERE rn = 1
    ORDER BY user_id
    """,
    doc="incremental merge-upsert (MERGE INTO semantics on plain DataFrames): base = "
    "latest signup state per user at W1, delta = latest in (W1, W2], full-outer join "
    "on the key, newest row wins, change classified inserted/updated/unchanged — the "
    "CDC compaction step the reference's append-only load lacks. Scale shape: one "
    "keyed window per side + one equi-join on the merge key; at 100 TB base and delta "
    "shuffle once each on user_id and AQE picks broadcast when the delta is small",
)
def e02_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    # NTZ literals (r11): casting the string to session-zoned
    # "timestamp" coerces every comparison against the NTZ ts column
    # through the session zone — self-consistent, but DST-fragile;
    # parsing straight to TIMESTAMP_NTZ removes the coercion entirely
    w1, w2 = (
        F.lit(_MERGE_W1).cast("timestamp_ntz"),
        F.lit(_MERGE_W2).cast("timestamp_ntz"),
    )

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    base = latest(ev.filter(F.col("ts") <= w1)).select(
        "user_id",
        F.col("event_id").alias("b_event_id"),
        F.col("value").alias("b_value"),
        F.col("ts").alias("b_ts"),
    )
    delta = latest(ev.filter((F.col("ts") > w1) & (F.col("ts") <= w2))).select(
        "user_id",
        F.col("event_id").alias("d_event_id"),
        F.col("value").alias("d_value"),
        F.col("ts").alias("d_ts"),
    )
    merged = base.join(delta, "user_id", "full_outer")
    take_delta = F.col("d_event_id").isNotNull()
    change = (
        F.when(~take_delta, "unchanged")
        .when(F.col("b_event_id").isNotNull(), "updated")
        .otherwise("inserted")
    )
    return merged.select(
        "user_id",
        F.when(take_delta, F.col("d_event_id")).otherwise(F.col("b_event_id")).alias("last_event_id"),
        F.when(take_delta, F.col("d_value")).otherwise(F.col("b_value")).alias("last_value"),
        F.when(take_delta, F.col("d_ts")).otherwise(F.col("b_ts")).alias("last_ts"),
        change.alias("change_type"),
    ).orderBy("user_id")


@query(
    "e03_value_histogram",
    # bucket = least(floor(value / 25), 19): a double divide of exact
    # parquet doubles + floor — IEEE-identical in both engines; counts
    # and min/max pass the raw doubles through with no re-aggregation.
    oracle="""
    SELECT CAST(least(floor(value / 25), 19) AS INT) AS bucket,
           count(*) AS n_events,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    -- a NaN measurement has no bucket (floor(NaN) routes through each
    -- engine's own NaN ordering — divergent) and is excluded; NULL
    -- keeps its NULL-bucket row on both engines
    WHERE value IS NULL OR NOT isnan(value)
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="fixed-width histogram of event values (20 buckets of width 25, top bucket "
    "open) — the dashboard/profiling primitive; single map-side-combined hash "
    "aggregate, no sort until the 20-row result",
)
def e03_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNull() | ~F.isnan("value")
    )
    bucket = F.least(F.floor(F.col("value") / 25), F.lit(19)).cast("int")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("bucket")
    )


@query(
    "e04_dq_checks",
    # One conditional-aggregate pass over orders ⟕ customer, unpivoted to
    # (check_name, metric) rows — the deequ/dbt-style data-quality gate a
    # lake pipeline runs before publishing a partition. Every metric is
    # an exact integer count.
    oracle="""
    WITH j AS (
        SELECT o.o_custkey, o.o_orderstatus, o.o_totalprice, c.c_custkey
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT 'distinct_statuses' AS check_name, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS metric FROM j
    UNION ALL
    SELECT 'negative_totalprice', CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM j
    UNION ALL
    SELECT 'null_custkey', CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM j
    UNION ALL
    SELECT 'orphan_orders', CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM j
    UNION ALL
    SELECT 'row_count', CAST(count(*) AS BIGINT) FROM j
    ORDER BY check_name
    """,
    doc="data-quality constraint checks (row count, null keys, referential orphans via "
    "left join, domain cardinality, value bounds) as one conditional-aggregate pass + "
    "stack() unpivot — the pre-publish validation gate; dims broadcast, single fact scan",
)
def e04_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    j = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left"
    )
    agg = j.agg(
        F.count("*").alias("row_count"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias("orphan_orders"),
        F.countDistinct("o_orderstatus").alias("distinct_statuses"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("negative_totalprice"),
    )
    return agg.selectExpr(
        """stack(5,
            'distinct_statuses', CAST(distinct_statuses AS BIGINT),
            'negative_totalprice', CAST(negative_totalprice AS BIGINT),
            'null_custkey', CAST(null_custkey AS BIGINT),
            'orphan_orders', CAST(orphan_orders AS BIGINT),
            'row_count', CAST(row_count AS BIGINT)
        ) AS (check_name, metric)"""
    ).orderBy("check_name")


@query(
    "e05_order_percentiles",
    # Spark `percentile` and DuckDB `quantile_cont` implement the same
    # linear-interpolation definition ((1-g)·a + g·b on the sorted
    # values); inputs are the raw parquet doubles, so the interpolated
    # values agree to the last bit and the 1e-4 round is belt-and-braces.
    # NaN amounts are treated as missing (the metric contract): both
    # engines' percentile SILENTLY returns NaN for a NaN input — unlike
    # the money path's cents cast, which fail-stops loudly on both
    # engines — so this is the one site where a corrupt amount would
    # surface unnoticed as a p50/p90/p99 value (r9 ADVICE boundary,
    # decided corpus-wide in round 10; see PARITY.md NaN policy).
    oracle=f"""
    SELECT o_orderpriority,
           round(quantile_cont({duck_metric('o_totalprice')}, 0.5) * 10000) / 10000.0 AS p50,
           round(quantile_cont({duck_metric('o_totalprice')}, 0.9) * 10000) / 10000.0 AS p90,
           round(quantile_cont({duck_metric('o_totalprice')}, 0.99) * 10000) / 10000.0 AS p99
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="exact per-group percentiles (p50/p90/p99 of order value by priority) — the "
    "latency/value distribution profiling primitive; exact sort-based percentile here, "
    "approx_percentile is the documented 100 TB fallback (single-pass sketch, no sort)",
)
def e05_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # NaN amounts are missing measurements (the metric contract):
    # percentile would otherwise silently surface NaN as p50/p90/p99
    pct = F.percentile(metric("o_totalprice"), [0.5, 0.9, 0.99])
    return (
        orders.groupBy("o_orderpriority")
        .agg(pct.alias("p"))
        .select(
            "o_orderpriority",
            (F.round(F.col("p")[0] * 10000) / 10000.0).alias("p50"),
            (F.round(F.col("p")[1] * 10000) / 10000.0).alias("p90"),
            (F.round(F.col("p")[2] * 10000) / 10000.0).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "e06_point_in_time_version",
    # DuckDB's native ASOF LEFT JOIN is the oracle for the library's
    # union+window as-of operator; arg_max/max_by break the (user, ts)
    # tie identically on both sides, and `value` doubles are carried
    # untouched (no re-aggregation), so the hash compare is exact.
    oracle="""
    WITH s0 AS (
        SELECT user_id, ts AS valid_from,
               arg_max(value, event_id) AS state_value,
               max(event_id) AS state_event_id
        FROM events WHERE event_type = 'signup'
        GROUP BY 1, 2
    ),
    s AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY valid_from) AS INT) AS version
        FROM s0
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           s.version, s.state_event_id, s.state_value, s.valid_from
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.valid_from <= p.ts
    ORDER BY p.event_id
    """,
    doc="point-in-time SCD2 read (time travel on a versioned dimension): each "
    "purchase is resolved against the signup-state VERSION that was current at "
    "its event time — e01 builds the history, this query reads it as of a fact "
    "timestamp, which is the lakehouse `FOR TIMESTAMP AS OF` lookup a plain "
    "equi-join gets wrong (it would see future versions). One key shuffle via "
    "the union+window as-of operator (operators/asof.py), no range-join blowup; "
    "facts before the first version keep NULL state (left semantics)",
)
def e06_point_in_time_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.operators.asof import asof_backward_join

    ev = load_table(spark, sf_dir, "events")
    # ONE user_id exchange for the whole state build (guide §2.4): the
    # explicit repartition keys the shuffle by user_id alone, which
    # satisfies both the (user_id, valid_from) aggregate's clustering
    # AND the version window's partitioning — before r14 the groupBy
    # shuffled on (user_id, ts) and the window re-shuffled everything
    # on user_id (2 Exchanges of the state rows). The trade: the
    # exchange now carries raw signup rows instead of map-side-combined
    # groups — a wash here because (user_id, ts) signup pairs are
    # near-unique, so partial aggregation collapsed almost nothing.
    states = (
        ev.filter(F.col("event_type") == "signup")
        .repartition(F.col("user_id"))
        .groupBy("user_id", F.col("ts").alias("valid_from"))
        .agg(
            F.max_by("value", "event_id").alias("state_value"),
            F.max("event_id").alias("state_event_id"),
        )
        .withColumn(
            "version",
            F.row_number().over(Window.partitionBy("user_id").orderBy("valid_from")),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_backward_join(
        purchases,
        states,
        on=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        payload_cols=["version", "state_event_id", "state_value", "valid_from"],
    )
    return joined.select(
        "event_id", "user_id", "ts", "version", "state_event_id", "state_value", "valid_from"
    ).orderBy("event_id")


@query(
    "e07_snapshot_diff",
    # Pure ANSI (also Spark-SQL-conformant). Both snapshots derive from
    # the orders table with deterministic modular filters, and payloads
    # compare as exact integer cents — no float comparison anywhere.
    oracle="""
    WITH prev AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 10 = 7 THEN 500 ELSE 0 END AS price_cents
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    cur AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders WHERE o_orderkey % 10 <> 5
    )
    SELECT coalesce(prev.o_orderkey, cur.o_orderkey) AS o_orderkey,
           CASE WHEN prev.o_orderkey IS NULL THEN 'added'
                WHEN cur.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           prev.price_cents AS prev_cents,
           cur.price_cents AS cur_cents
    FROM prev FULL JOIN cur ON prev.o_orderkey = cur.o_orderkey
    WHERE prev.o_orderkey IS NULL OR cur.o_orderkey IS NULL
          OR prev.price_cents <> cur.price_cents
    ORDER BY o_orderkey
    """,
    doc="snapshot diff / change data feed: two keyed snapshots (previous simulated by "
    "modular filters + an integer-cents price bump) full-outer merged into "
    "added/removed/changed rows, unchanged dropped — the table_changes()/CDF read "
    "that turns plain parquet snapshots into an incremental downstream feed, "
    "complementing e02's merge (which APPLIES changes) and e01's SCD2 (which "
    "HISTORIZES them). Scale shape: ONE primary-key shuffle for the full-outer "
    "join; the change filter is computed inline, no second pass",
)
def e07_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    prev = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        F.col("o_orderkey").alias("pk"),
        (cents + F.when(F.col("o_orderkey") % 10 == 7, 500).otherwise(0)).alias("prev_cents"),
    )
    cur = orders.filter(F.col("o_orderkey") % 10 != 5).select(
        F.col("o_orderkey").alias("ck"), cents.alias("cur_cents")
    )
    j = prev.join(cur, prev.pk == cur.ck, "full_outer")
    change = (
        F.when(F.col("pk").isNull(), "added")
        .when(F.col("ck").isNull(), "removed")
        .otherwise("changed")
    )
    return (
        j.filter(
            F.col("pk").isNull()
            | F.col("ck").isNull()
            | (F.col("prev_cents") != F.col("cur_cents"))
        )
        .select(
            F.coalesce("pk", "ck").alias("o_orderkey"),
            change.alias("change_type"),
            "prev_cents",
            "cur_cents",
        )
        .orderBy("o_orderkey")
    )


_SCD2_W = "2024-01-24"  # ~80% of the 2024-01-01..2024-01-30 event span


@query(
    "e08_scd2_incremental_apply",
    # The oracle IS e01's full rebuild over ALL purchase events — the
    # hash match proves the incremental apply (persisted base history +
    # delta batch) reproduces the from-scratch SCD2 table bit-for-bit
    # (the pipe02 discipline, applied to the lakehouse family).
    oracle="""
    -- ts IS NOT NULL: a NULL event time matches neither side of the
    -- watermark split (base ts <= W, delta ts > W) — unroutable by a
    -- CDC feed, the same contract s04 pins on the streamed form
    SELECT user_id, event_id, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM events
    WHERE event_type = 'purchase' AND ts IS NOT NULL
    ORDER BY user_id, valid_from
    """,
    doc=f"INCREMENTAL SCD2 apply: the e01 history is built once from the base "
    f"snapshot (ts <= {_SCD2_W}) and PERSISTED; the delta batch (ts > "
    f"{_SCD2_W}) then (1) CLOSES each touched user's open row at the user's "
    "first delta timestamp, (2) chains the delta rows into new versions with "
    "one window over the delta alone, and (3) leaves every untouched row "
    "byte-identical — no history rewrite for unaffected users, the MERGE-"
    "style partial update an append-only lake cannot do. Correctness rests "
    "on the watermark regime (every delta ts follows every base ts), exactly "
    "a CDC feed's contract. Scale shape: base history built once "
    "(amortized across delta batches), delta scans carry the pushed "
    "watermark filter, the close-row join is keyed on user_id against an "
    "aggregate-sized first-delta-ts frame, and work ∝ delta + touched rows",
)
def e08_scd2_incremental_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # NTZ literal — see e02's note (session-zone coercion removed)
    wm = F.lit(_SCD2_W).cast("timestamp_ntz")
    base = ev.filter(F.col("ts") <= wm)
    delta = ev.filter(F.col("ts") > wm)

    # persisted base state: the e01 construction over the base snapshot
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    base_hist = base.select(
        "user_id", "event_id", "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).persist()

    # the incremental apply: work ∝ delta + touched current rows. The
    # windowed delta is persisted because it feeds TWO consumers — the
    # close-row frame's first-delta-ts aggregate and the new-version
    # union branch; before r14 each consumer re-scanned and re-shuffled
    # the delta separately (2 parquet scans + 2 user_id exchanges of
    # the same rows; column pruning makes the two exchanges unequal, so
    # ReuseExchange cannot merge them). One cached pass is the same
    # discipline base_hist/pipe02 already follow (guide §2.4 — share
    # the exchange). min(valid_from) ≡ min(ts) over the delta, and the
    # cache preserves the window's user_id partitioning, so d_first
    # adds NO further exchange.
    new_rows = delta.select(
        "user_id", "event_id", "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).persist()
    d_first = new_rows.groupBy("user_id").agg(F.min("valid_from").alias("_first_dts"))
    closed = (
        base_hist.filter("is_current")
        .join(d_first, "user_id", "left")
        .select(
            "user_id", "event_id", "value", "valid_from",
            F.coalesce("_first_dts", "valid_to").alias("valid_to"),
            F.col("_first_dts").isNull().alias("is_current"),
        )
    )
    return (
        base_hist.filter(~F.col("is_current"))
        .unionByName(closed)
        .unionByName(new_rows)
        .orderBy("user_id", "valid_from")
    )
