"""Sketch corpus queries (x-group): deterministic approximate
cardinality and candidate-pruned heavy hitters (operators/sketch.py).

The reference answers both questions with exact full-shuffle SQL
(`pipeline/athena_queries.sql:27` COUNT(DISTINCT ip),
`dashboard.py:188` value_counts) — fine at GB scale, the dominant
shuffle at 100 TB. These queries run the sketch forms whose outputs are
still exact integers, so the driver hash-checks them like any other
query: the approximation lives in how little data moves, not in
nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.sketch import (
    HASH_SPACE,
    frequent_keys,
    kmv_sketch,
    kmv_sketch_grouped,
)
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table

_KMV_K = 256


@query(
    "x01_kmv_distinct_users_days",
    # The oracle restates the sketch definition itself (k smallest
    # distinct 48-bit md5-prefix hashes), not the plain COUNT(DISTINCT):
    # both engines hash identical strings through md5, so kth_hash and
    # the integer-division estimate match bit-for-bit.
    oracle=f"""
    WITH keys AS (
        SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|' ||
                                   CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 12))::BIGINT AS h
        FROM events
    ),
    topk AS (
        -- `||` propagates NULL, so a NULL user_id yields h IS NULL:
        -- excluded from the sketch (matching the engine's h-filter)
        SELECT DISTINCT h FROM keys WHERE h IS NOT NULL ORDER BY h LIMIT {_KMV_K}
    ),
    sk AS (
        SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash FROM topk
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows,
           k_used,
           kth_hash,
           CAST(CASE WHEN k_used < {_KMV_K} THEN k_used
                     ELSE ({_KMV_K - 1} * {HASH_SPACE}) // kth_hash END AS BIGINT) AS est_distinct
    FROM sk
    """,
    doc="KMV distinct estimator over (user_id, activity day): k=256 minimum md5-prefix "
    "hashes → D ≈ (k-1)·2^48/h_(k), all integer math. Scale shape: map-only hash, "
    "Arrow per-split top-k partial (≤ splits·k survivors), tiny exact merge — replaces "
    "the exact COUNT(DISTINCT) full-key shuffle of athena_queries.sql:27 at 100 TB "
    "(operators/sketch.py kmv_sketch)",
)
def x01_kmv_distinct_users_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # null-PROPAGATING concat (not concat_ws, which silently drops NULL
    # parts): a NULL user_id nulls the whole key, so its hash is NULL and
    # the sketch's h-filter excludes the row on BOTH engines — matching
    # the oracle's `||`, which also propagates NULL
    key = F.concat(
        F.col("user_id").cast("string"), F.lit("|"), F.col("ts").cast("date").cast("string")
    )
    return kmv_sketch(ev, key, k=_KMV_K)


@query(
    "x03_kmv_distinct_by_type",
    # Same sketch definition as x01, partitioned by group: the oracle
    # ranks each group's distinct hashes and keeps rank ≤ k, so kth_hash
    # and the integer estimate agree bit-for-bit per group.
    oracle=f"""
    WITH keys AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS STRING)), 1, 12))::BIGINT AS h
        FROM events
        WHERE user_id IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM (SELECT DISTINCT event_type, h FROM keys)
    ),
    sk AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash
        FROM ranked WHERE rk <= {_KMV_K} GROUP BY 1
    ),
    n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows FROM events GROUP BY 1
    )
    SELECT n.event_type, n_rows, k_used, kth_hash,
           CAST(CASE WHEN k_used < {_KMV_K} THEN k_used
                     ELSE ({_KMV_K - 1} * {HASH_SPACE}) // kth_hash END AS BIGINT) AS est_distinct
    FROM n JOIN sk ON n.event_type IS NOT DISTINCT FROM sk.event_type
    ORDER BY n.event_type
    """,
    doc="per-group KMV: distinct users per event_type, one mergeable k=256 sketch per "
    "group. Scale shape: Arrow partial prunes each split to ≤k hashes per group "
    "BEFORE the shuffle, the rank/merge runs on pruned data, and only group-"
    "cardinality aggregates join — per-group COUNT(DISTINCT) without shuffling the "
    "key space (operators/sketch.py kmv_sketch_grouped)",
)
def x03_kmv_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return kmv_sketch_grouped(ev, ["event_type"], F.col("user_id"), k=_KMV_K).orderBy(
        "event_type"
    )


@query(
    "x02_frequent_users",
    # The oracle states the PLAIN exact form — the sketch only prunes
    # what gets shuffled; its answer is the true heavy-hitter set.
    oracle="""
    WITH n AS (SELECT count(*) AS n_rows FROM events)
    SELECT CAST(key_value AS BIGINT) AS user_id,
           cnt,
           round(cnt * 1000000.0 / n_rows) / 1000000.0 AS share
    FROM (
        -- user_id IS NOT NULL mirrors the engine's documented NULL-key
        -- exclusion (NULL keys never become candidates but still count
        -- in n_rows as threshold mass — note n counts ALL rows above)
        SELECT CAST(user_id AS STRING) AS key_value, CAST(count(*) AS BIGINT) AS cnt
        FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ), n
    WHERE cnt * 150 > n_rows
    ORDER BY cnt DESC, user_id
    """,
    doc="exact heavy hitters (users with > n/150 of all events) via Misra-Gries-style "
    "candidate pruning: Arrow per-split frequent-keys pass (capacity 512 ≥ T=150 gives "
    "the pigeonhole superset guarantee) → broadcast semi-join → exact recount+filter. "
    "Only candidate keys shuffle; the answer equals the plain groupBy, which is what "
    "the oracle asserts (operators/sketch.py frequent_keys)",
)
def x02_frequent_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hh = frequent_keys(ev, F.col("user_id"), threshold_denom=150, capacity=512)
    return (
        hh.select(
            F.col("key_value").cast("bigint").alias("user_id"),
            "cnt",
            (F.round(F.col("cnt") * 1000000.0 / F.col("n_rows")) / 1000000.0).alias("share"),
        )
        .orderBy(F.desc("cnt"), "user_id")
    )


_HIST_B = 4096
_QUANTILES_MICRO = (500000, 900000, 990000)  # p50 / p90 / p99


@query(
    "x04_histogram_quantiles",
    # Bucket = floor((v-lo)/(hi-lo)*B) with identical left-assoc double
    # arithmetic in both engines; thresholds are exact integer
    # ceil(q*n); bucket bounds re-derive from (lo, hi) with the same
    # expression shape, micro-rounded — every emitted column is integer.
    oracle=f"""
    WITH st AS (
        SELECT min(value) AS lo, max(value) AS hi,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    b AS (
        -- hi = lo (constant-value distribution): every row is bucket 0
        -- by CONTRACT — the raw expression is 0/0, where DuckDB's
        -- float-div-by-zero yields NULL (least would skip it and pick
        -- B-1) while Spark yields NaN; both engines pin 0 instead
        SELECT CASE WHEN hi = lo THEN 0
                    ELSE least({_HIST_B - 1},
                               CAST(floor((value - lo) / (hi - lo) * {_HIST_B}) AS INT))
               END AS bucket
        FROM events, st WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    h AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY bucket
    ),
    c AS (
        SELECT bucket, cnt,
               CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
        FROM h
    ),
    q AS (
        SELECT unnest([{", ".join(str(q) for q in _QUANTILES_MICRO)}]) AS q_micro
    )
    SELECT q_micro,
           st.n AS n_rows,
           c.bucket,
           c.cum AS cum_count,
           CAST(round((st.lo + c.bucket * ((st.hi - st.lo) / {_HIST_B}.0)) * 1000000) AS BIGINT) AS est_lo_micro,
           CAST(round((st.lo + (c.bucket + 1) * ((st.hi - st.lo) / {_HIST_B}.0)) * 1000000) AS BIGINT) AS est_hi_micro
    FROM c, q, st
    WHERE c.cum >= (q.q_micro * st.n + 999999) // 1000000
      AND c.cum - c.cnt < (q.q_micro * st.n + 999999) // 1000000
    ORDER BY q_micro
    """,
    doc=f"equi-width histogram quantile sketch (B={_HIST_B} buckets): p50/p90/p99 of "
    "event value located to a bucket interval — the mergeable approximate-quantile "
    "path next to e05's exact window percentiles. Scale shape: one 1-row min/max/"
    "count aggregate (driver sees 3 scalars, v01-style), then ONE map-side-combined "
    f"{_HIST_B}-key aggregate — no global sort, no per-key shuffle; the cumulative "
    "scan and threshold probe run on the bucket frame (bounded ≤B rows, w02 idiom). "
    "Error bound is the bucket width, reported explicitly as [est_lo, est_hi). "
    "SNAPSHOT SEMANTICS: lo/hi/n are collected at CALL time and baked into the "
    "returned plan as literals (the frequent_keys caveat) — call on an immutable "
    "snapshot, or re-call after mutating the table",
)
def x04_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    B = _HIST_B
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    lo, hi, n = ev.agg(
        F.min("value"), F.max("value"), F.count("*").cast("bigint")
    ).collect()[0]
    if n == 0:
        # zero-row input: no quantiles exist — the oracle's threshold
        # probe over an empty bucket frame is empty too
        return spark.createDataFrame(
            [],
            "q_micro bigint, n_rows bigint, bucket int, cum_count bigint, "
            "est_lo_micro bigint, est_hi_micro bigint",
        )
    # constant-value distribution (hi == lo): bucket 0 by contract —
    # the raw expression would be 0/0 (NaN here, NULL in DuckDB)
    bucket = (
        F.lit(0).cast("int")
        if hi == lo
        else F.least(
            F.lit(B - 1),
            F.floor((F.col("value") - F.lit(lo)) / F.lit(hi - lo) * B).cast("int"),
        )
    )
    h = ev.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    c = h.withColumn(
        "cum",
        F.sum("cnt").over(Window.partitionBy().orderBy("bucket")).cast("bigint"),
    )
    width = (hi - lo) / float(B)
    exploded = c.select(
        "bucket", "cnt", "cum",
        F.explode(F.array(*[F.lit(q).cast("bigint") for q in _QUANTILES_MICRO])).alias("q_micro"),
    )
    # integer DIV, mirroring the oracle's // — double division then floor
    # loses exactness above 2^53, i.e. at n ≳ 9e9 rows (the 100 TB regime)
    # the floor could disagree with the oracle by 1 and pick the wrong bucket
    t = F.expr(f"CAST((q_micro * {n}L + 999999) DIV 1000000 AS BIGINT)")
    return (
        exploded.filter((F.col("cum") >= t) & (F.col("cum") - F.col("cnt") < t))
        .select(
            "q_micro",
            F.lit(n).cast("bigint").alias("n_rows"),
            "bucket",
            F.col("cum").alias("cum_count"),
            F.round((F.lit(lo) + F.col("bucket") * F.lit(width)) * 1000000)
            .cast("bigint")
            .alias("est_lo_micro"),
            F.round((F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)) * 1000000)
            .cast("bigint")
            .alias("est_hi_micro"),
        )
        .orderBy("q_micro")
    )


@query(
    "x05_kmv_set_algebra",
    # The oracle restates the whole algebra: per-type k-min sets over
    # distinct (type, user-hash), pair enumeration by self-join, the
    # union sketch as rank <= k over the merged sets, and the integer
    # union/intersection estimators - bit-identical DIV arithmetic.
    oracle=f"""
    WITH keys AS (
        SELECT DISTINCT event_type AS g,
               ('0x' || substr(md5(CAST(user_id AS STRING)), 1, 12))::BIGINT AS h
        FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    kmin AS (
        SELECT g, h FROM (
            SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM keys
        ) WHERE rk <= {_KMV_K}
    ),
    gs AS (SELECT DISTINCT g FROM kmin),
    prs AS (SELECT x.g AS ga, y.g AS gb FROM gs x JOIN gs y ON x.g < y.g),
    tag AS (
        SELECT p.ga, p.gb, m.g, m.h
        FROM prs p JOIN kmin m ON m.g = p.ga OR m.g = p.gb
    ),
    per_h AS (
        SELECT ga, gb, h, count(DISTINCT g) = 2 AS in_both
        FROM tag GROUP BY 1, 2, 3
    ),
    uk AS (
        SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk FROM per_h
    ),
    sk AS (
        SELECT ga AS type_a, gb AS type_b,
               CAST(count(*) AS BIGINT) AS k_used,
               max(h) AS kth_hash,
               CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT) AS shared
        FROM uk WHERE rk <= {_KMV_K} GROUP BY 1, 2
    ),
    est AS (
        SELECT type_a, type_b, k_used, shared,
               CAST(CASE WHEN k_used < {_KMV_K} THEN k_used
                    ELSE ({_KMV_K - 1} * {HASH_SPACE}) // kth_hash END AS BIGINT) AS est_union
        FROM sk
    )
    SELECT type_a, type_b, k_used, shared, est_union,
           CAST(shared * est_union // k_used AS BIGINT) AS est_inter
    FROM est ORDER BY type_a, type_b
    """,
    doc="KMV set ALGEBRA: distinct-user union and intersection estimates for every "
    "event-type pair, computed purely from the per-type k=256 sketches "
    "(mergeability: topk(KA ∪ KB) = topk(A ∪ B); intersection via the standard "
    "shared-survivor ratio, all integer DIV). The audience-overlap question "
    "COUNT(DISTINCT) needs a full pass per pair to answer; here the sketch state "
    "is built once and every pair costs groups·k-row arithmetic. Scale shape: "
    "Arrow per-split k-min prune before the one sketch shuffle, group list is a "
    "driver-side aggregate collect, the (pair, group) map is the only broadcast "
    "(operators/sketch.py kmv_set_algebra)",
)
def x05_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.operators.sketch import kmv_set_algebra

    ev = load_table(spark, sf_dir, "events")
    return kmv_set_algebra(ev, "event_type", F.col("user_id"), k=_KMV_K)
