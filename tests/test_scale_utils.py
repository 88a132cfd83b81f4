"""Scale-path utilities: salted agg/join equivalence, JDBC reader
construction, catalog DDL, and Spark-SQL conformance of the oracle
corpus (the Athena-replacement surface)."""

from __future__ import annotations

import math
import os

import pytest

from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.skew import salted_agg, salted_join
from serverless_etl_reporting_pipeline_spark.plans import REGISTRY
from serverless_etl_reporting_pipeline_spark.sources.catalog import (
    describe_table,
    register_star_schema,
    show_tables,
)
from serverless_etl_reporting_pipeline_spark.sources.jdbc import jdbc_incremental_query, jdbc_table
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table, register_views


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: (r["sum_l_quantity"], r["count_l_orderkey"])
        for r in salted_agg(li, ["l_returnflag"], {"l_quantity": "sum", "l_orderkey": "count"}).collect()
    }
    want = {
        r["l_returnflag"]: (r["s"], r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("l_orderkey").alias("c"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert math.isclose(got[k][0], want[k][0], rel_tol=1e-9)


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        cust.withColumnRenamed("c_custkey", "k"),
        ["k"],
        salts=8,
    ).count()
    assert salted == plain


def test_jdbc_reader_construction(spark):
    r = jdbc_table(
        spark,
        "jdbc:mysql://example/db",
        "transactions",
        partition_column="transaction_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert r is not None  # reader builds; .load() needs a driver jar
    with pytest.raises(ValueError):
        jdbc_table(spark, "jdbc:mysql://example/db", "t", partition_column="id")
    with pytest.raises(Exception):
        # no driver in this container: the *plan* fails only at load()
        jdbc_incremental_query(
            spark, "jdbc:mysql://example/db", "SELECT 1 AS x", "at", None
        )
    with pytest.raises(ValueError, match="identifier"):
        # non-identifier ts_col must be rejected BEFORE SQL assembly
        from datetime import datetime

        jdbc_incremental_query(
            spark,
            "jdbc:mysql://example/db",
            "SELECT 1 AS x",
            "at; DROP TABLE t --",
            datetime(2024, 1, 1),
        )


def test_jdbc_live_roundtrip_derby(spark, tmp_path):
    """LIVE JDBC round-trip against embedded Apache Derby (bundled with
    Spark for the Hive metastore): write → full read → range-partitioned
    read → microsecond-watermark incremental read. Mirrors the
    reference's MySQL extract (pipeline/ETL/extract.py:84-109) with an
    exact strictly-greater boundary: a row AT the watermark is excluded,
    a row one microsecond later is included."""
    from datetime import datetime

    from serverless_etl_reporting_pipeline_spark.sources.jdbc import (
        jdbc_incremental_query,
        jdbc_table,
    )

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    wm = datetime(2024, 1, 1, 10, 0, 0, 123456)
    rows = [
        (1, "at-watermark", datetime(2024, 1, 1, 10, 0, 0, 123456), 10.5),
        (2, "one-us-later", datetime(2024, 1, 1, 10, 0, 0, 123457), 20.0),
        (3, "next-day", datetime(2024, 1, 2, 9, 30, 0), 30.25),
    ]
    df = spark.createDataFrame(
        rows, "id long, name string, updated_at timestamp, amount double"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "tx")
        .option("driver", drv)
        .mode("overwrite")
        .save()
    )

    back = jdbc_table(spark, url, "tx", driver=drv).load()
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)

    part = jdbc_table(
        spark, url, "tx", driver=drv,
        partition_column="id", num_partitions=3, lower_bound=1, upper_bound=4,
    ).load()
    assert part.rdd.getNumPartitions() == 3
    assert part.count() == len(rows)

    # Spark's JDBC writer creates case-sensitive (quoted) lowercase
    # columns on Derby; the base query re-aliases them to plain
    # identifiers exactly as a user's extract SQL would.
    base = 'SELECT "id" id, "name" name, "updated_at" updated_at, "amount" amount FROM tx'
    inc = jdbc_incremental_query(spark, url, base, "updated_at", wm, driver=drv)
    assert sorted(r["ID"] for r in inc.collect()) == [2, 3]


def test_csv_stage_roundtrip(spark, sf_dir, tmp_path):
    """S3 stage hand-off: declared-schema CSV read (no inference scan)."""
    from serverless_etl_reporting_pipeline_spark.sources.lake import read_csv_stage, write_csv_stage

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "stage")
    write_csv_stage(nation, path)
    back = read_csv_stage(spark, path, nation.schema)
    assert back.schema == nation.schema
    assert sorted(map(str, back.collect())) == sorted(map(str, nation.collect()))


@pytest.mark.parametrize("fmt", ["orc", "json"])
def test_interchange_roundtrip(spark, sf_dir, tmp_path, fmt):
    """ORC / JSON-lines interchange: declared-schema read, values
    preserved exactly."""
    from serverless_etl_reporting_pipeline_spark.sources.lake import read_interchange, write_interchange

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"stage_{fmt}")
    write_interchange(nation, path, fmt)
    back = read_interchange(spark, path, fmt, nation.schema)
    assert back.schema == nation.schema
    assert sorted(map(str, back.collect())) == sorted(map(str, nation.collect()))


def test_orc_scan_pushes_filters(spark, sf_dir, tmp_path):
    """ORC is a first-class pruned/pushdown scan, same as parquet."""
    from serverless_etl_reporting_pipeline_spark.sources.lake import read_interchange, write_interchange

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_interchange(orders, path, "orc")
    df = (
        read_interchange(spark, path, "orc", orders.schema)
        .filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_totalprice")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(o_totalprice" in plan
    assert "o_orderdate" not in plan.split("ReadSchema:")[1]


def test_events_ns_cache_cold_rebuild(spark, sf_dir):
    """The ns→µs events rewrite must rebuild from a cold cache (the
    driver's first run on a fresh box) and yield µs values identical to
    DuckDB's own ns→µs truncation of the source file."""
    import duckdb

    from serverless_etl_reporting_pipeline_spark.sources.reader import _normalized_events_path

    dst = _normalized_events_path(sf_dir)
    os.remove(dst)  # cold path
    events = load_table(spark, sf_dir, "events")
    n = events.count()
    assert os.path.exists(dst), "cache not rebuilt"
    want_n, want_min, want_max = duckdb.sql(
        f"SELECT count(*), min(ts), max(ts) FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert n == want_n
    got = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert got[0].replace(tzinfo=None) == want_min and got[1].replace(tzinfo=None) == want_max


def test_timestamp_queries_are_session_tz_invariant(spark, sf_dir):
    """The driver runs an UNPINNED session (no UTC timezone conf); every
    timestamp-touching query must give identical results in any session
    timezone — guaranteed by keeping event times NTZ end-to-end and only
    using tz-invariant derivations (verified here against a cloned
    session pinned to a hostile offset)."""
    hostile = spark.newSession()
    hostile.conf.set("spark.sql.session.timeZone", "America/New_York")
    for name in ["a04_daily_revenue", "a05_hourly_events", "a06_day_of_week",
                 "p04_time_derivations", "s01_tumbling_1h", "j06_asof_prior_view",
                 "w05_running_total_by_month", "w06_sessionization",
                 # r11: the watermark/merge-boundary family — their
                 # timestamp literals must parse tz-free (NTZ casts /
                 # functions/timelit.py ntz_lit; lit(datetime) or an
                 # LTZ cast would shift boundaries under this session)
                 "e02_merge_upsert", "e08_scd2_incremental_apply", "w10_daily_ohlc"]:
        q = REGISTRY[name]
        want = sorted(map(str, q.builder(spark, sf_dir).collect()))
        got = sorted(map(str, q.builder(hostile, sf_dir).collect()))
        assert got == want, f"{name}: result depends on session timezone"


def test_approx_aggregates_track_exact(spark, sf_dir):
    """Sketch-based scale-out variants (SURVEY.md §2.4 A7 note): HLL++
    distinct counts and t-digest-style percentiles replace their exact
    forms at 100 TB (bounded memory, one pass, mergeable partials) —
    assert they track the exact answers at fixture scale."""
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact_n"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_n"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx_p50"),
    ).collect()[0]
    assert abs(row["approx_n"] - row["exact_n"]) <= 0.05 * row["exact_n"]
    assert abs(row["approx_p50"] - row["exact_p50"]) <= 0.02 * abs(row["exact_p50"])


def test_bucketed_join_and_agg_avoid_shuffle(spark, sf_dir):
    """Tables bucketed on the join key must plan equi-joins and
    group-bys with ZERO Exchange — the write-once shuffle that makes
    repeated fact⋈fact joins viable at 100 TB."""
    from serverless_etl_reporting_pipeline_spark.sources.lake import write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "bk_orders", ["o_custkey"], num_buckets=8, sort_cols=["o_custkey"])
    write_bucketed(cust, "bk_customer", ["c_custkey"], num_buckets=8, sort_cols=["c_custkey"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
        bo, bc = spark.table("bk_orders"), spark.table("bk_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == orders.join(cust, orders.o_custkey == cust.c_custkey).count()

        agg = bo.groupBy("o_custkey").count()
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, "group-by on bucket key must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_orders")
        spark.sql("DROP TABLE IF EXISTS bk_customer")


def test_catalog_ddl(spark, sf_dir):
    register_star_schema(spark, sf_dir, database="lake_test")
    tables = {r["tableName"] for r in show_tables(spark, "lake_test").collect()}
    assert {"lineitem", "orders", "documents"} <= tables
    cols = {r["col_name"] for r in describe_table(spark, "lake_test.orders").collect()}
    assert "o_orderkey" in cols
    assert spark.sql("SELECT count(*) AS n FROM lake_test.nation").collect()[0]["n"] > 0


# Oracles that use DuckDB-only syntax (list lambdas/list_sum, strftime,
# generate_series-UNNEST, epoch_us, 3-arg regexp_replace flags, 1-arg
# encode) — they exist to drive DuckDB, not Spark. Everything else must
# parse AND agree.
_DUCK_ONLY = {
    "a06_day_of_week",
    "a20_retention_matrix",  # date_diff('day', ...) 3-arg form
    "c01_pii_scrub",
    "c02_bloom_decontamination",
    "c03_entropy_quality",
    "c04_domain_stats",
    "c05_weighted_sample",
    "c06_chargram_lm_score",
    "c07_sequence_packing",
    "c08_leakage_safe_split",
    "e05_order_percentiles",
    "j06_asof_prior_view",
    "m01_binary_metadata",
    "m03_frame_sample",
    "p04_time_derivations",
    "p06_json_extraction",
    "s02_sliding_1h_15m",
    "s03_session_window_30m",
    "t02_normalized_dedup_groups",
    "t03_token_stats",
    "t04_language_id",
    "t05_quality_score",
    "t06_fingerprint",
    "t07_ngram_jaccard_pairs",
    "t08_simhash",
    "t09_minhash_lsh_neardup",
    "t11_neardup_components",
    "t12_chunking",
    "t20_incremental_neardup",
    "t21_passage_dedup_stats",  # list_slice/array_to_string/len
    "t22_shard_plan",  # ::BIGINT and '0x' hex-string cast
    "t23_boilerplate_scrub",  # list_slice/list(ORDER BY)/FILTER
    "t24_contamination_ratio",  # UNNEST/generate_series shingles
    "t14_tfidf_top_terms",
    "t15_top_bigrams",
    "t16_quality_filter",
    "t17_repetition_ratio",
    "t19_decontamination",
    "v01_knn_bruteforce",
    "v02_top_similar_pairs",
    "v04_ann_lsh_topk",
    "v09_embedding_neardup_lsh",
    "v03_label_centroids",
    "v05_ann_ivf_topk",
    "v06_ann_rplsh_topk",
    "v07_embedding_neardup",
    "v08_label_cohesion",
    "w05_running_total_by_month",
    "w06_sessionization",
    "w08_event_debounce",
    "c10_temperature_mixture",  # // integer division
    "c11_mixture_sample",  # // integer division and ::BIGINT
    "c12_token_budget_mixture",  # // integer division, regexp_extract_all
    "pipe01_pretrain_funnel",  # UNNEST/regexp_extract_all/:// composition
    "pipe02_incremental_funnel",  # UNNEST/regexp_extract_all/::BIGINT///
    "pipe03_funnel_delta_probe",  # UNNEST/regexp_extract_all/::BIGINT///
    "e06_point_in_time_version",  # ASOF LEFT JOIN
    "v10_sq8_rerank",  # list_transform/list_zip
    "v11_semdedup",  # list_transform/list_zip/arg_min
    "v12_incremental_embedding_probe",  # list_transform/arg_min
    "v13_batch_knn",  # list_transform/list_zip
    "v14_ivf_persisted_probe",  # list_transform/list_zip
    "v15_ivf_assign_arrivals",  # list_transform/list_zip/UNNEST
    "v16_ivf_lloyd_refresh",  # list_transform/list_zip/UNNEST
    "x05_kmv_set_algebra",  # ::BIGINT / integer //
    "x01_kmv_distinct_users_days",  # ::BIGINT and '0x' hex-string cast
    "x03_kmv_distinct_by_type",  # ::BIGINT and // integer division
    "s05_kmv_streaming_drain",  # x03's oracle restated: ::BIGINT and //
    "x04_histogram_quantiles",  # unnest([...]) and // integer division
}


def test_oracle_sql_runs_on_spark_sql(spark, sf_dir):
    """The ANSI subset of the oracle corpus must ALSO run through
    spark.sql over registered views and agree with the DataFrame
    builders — proving the SQL entry point (Athena replacement) and the
    DataFrame API express the same queries."""
    register_views(spark, sf_dir)
    ran = 0
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None or name in _DUCK_ONLY:
            continue
        try:
            sql_rows = spark.sql(q.oracle).collect()
        except Exception:
            pytest.fail(f"{name}: oracle SQL failed to parse/run in Spark SQL "
                        f"— add to _DUCK_ONLY only if it uses DuckDB-only syntax")
        df_rows = q.builder(spark, sf_dir).collect()
        assert len(sql_rows) == len(df_rows), f"{name}: row count"

        def key(row):
            import decimal

            out = []
            for c in sorted(row.asDict()):
                v = row[c]
                if isinstance(v, decimal.Decimal):
                    v = float(v)  # spark.sql types bigint/1e2 as DECIMAL; the API gives double
                if isinstance(v, float):
                    v = round(v, 6)
                out.append((v is None, 0 if v is None else v))  # null-safe ordering
            return tuple(out)

        assert sorted(map(key, sql_rows)) == sorted(map(key, df_rows)), f"{name}: values"
        ran += 1
    assert ran >= 30, f"only {ran} oracle queries ran through spark.sql"


def test_aqe_splits_skewed_join_partitions(spark, sf_dir):
    """The session enables AQE skew-join; prove it actually engages: a
    sort-merge join with one hot key must show skew-split partitions
    ("skew=true") in the final adaptive plan when the skewed-partition
    thresholds are lowered to fixture scale. This is the runtime half of
    the skew story — k01/k02's salting covers the cases AQE can't
    (aggregation skew, broadcast-ineligible hot dims)."""
    skew_conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    }
    old = {k: spark.conf.get(k, None) for k in skew_conf}
    try:
        for k, v in skew_conf.items():
            spark.conf.set(k, v)
        # one hot key: ~half of all rows land on user 0
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 2_000).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        joined = left.join(right, "k")
        # execute THIS frame (count() would build a different QueryExecution
        # whose adaptive plan we could not inspect afterwards)
        assert len(joined.collect()) == 101_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
