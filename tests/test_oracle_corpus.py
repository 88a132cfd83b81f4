"""Differential oracle tests: every registry query vs DuckDB at sf0.001.

This mirrors the driver's t2 check (SURVEY.md §5.1): row count + column
names + order-insensitive values must match exactly.
"""

from __future__ import annotations

import pytest

from serverless_etl_reporting_pipeline_spark.plans import REGISTRY
from tools.oracle_check import compare, duck_connect, type_check


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    df = q.builder(spark, sf_dir)
    rows = df.collect()
    if q.oracle is None:
        # rows-only contract: must run and be deterministic across reruns
        again = q.builder(spark, sf_dir).collect()
        assert sorted(map(str, rows)) == sorted(map(str, again))
        return
    rel = duck.sql(q.oracle)
    duck_cols = list(rel.columns)
    duck_types = [str(t) for t in rel.types]
    duck_rows = rel.fetchall()
    ok, msg, _ = compare(rows, duck_rows, df.columns, duck_cols)
    assert ok, f"{name}: {msg}"
    # The driver hashes types alongside values: an oracle column DuckDB
    # widened to HUGEINT/DECIMAL is a driver hash mismatch even when every
    # value above compared equal (r4: c07/k01/k02).
    bad = type_check(df.dtypes, duck_cols, duck_types)
    assert not bad, f"{name}: oracle type divergence: {bad}"


def test_type_check_flags_driver_hash_classes():
    """Pin the r4 lesson: HUGEINT/DECIMAL diverge, integer widths don't."""
    spark_dtypes = [("a", "bigint"), ("b", "int"), ("c", "double")]
    assert type_check(spark_dtypes, ["a"], ["HUGEINT"])  # uncast sum(BIGINT)
    assert type_check(spark_dtypes, ["c"], ["DECIMAL(18,3)"])
    assert type_check(spark_dtypes, ["a"], ["VARCHAR"])
    assert not type_check(spark_dtypes, ["b"], ["BIGINT"])  # width-only: green
    assert not type_check(spark_dtypes, ["a"], ["INTEGER"])
    assert not type_check(spark_dtypes, ["c"], ["DOUBLE"])
    assert not type_check(spark_dtypes, ["zzz"], ["HUGEINT"])  # unknown col skipped


def test_x01_null_user_id_excluded_both_engines(spark, tmp_path):
    """r6 advisor's latent divergence, now pinned: concat_ws would
    silently DROP a NULL user_id (key collapses to the day string and
    the row stays in the sketch) while the oracle's `||` propagates
    NULL. The null-propagating F.concat key nulls the hash, so the row
    is excluded from the sketch on BOTH engines — differential on a
    doctored corpus the fixtures lack (no NULL user_ids at any sf)."""
    import datetime

    import duckdb

    from serverless_etl_reporting_pipeline_spark.sources.schemas import SCHEMAS

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, ts, 10, "view", 1.0, "{}"),
        (2, ts, None, "view", 2.0, "{}"),
        (3, ts, 11, "buy", 3.0, "{}"),
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    q = REGISTRY["x01_kmv_distinct_users_days"]
    df = q.builder(spark, str(tmp_path))
    got = df.collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    rel = con.sql(q.oracle)
    ok, msg, _ = compare(got, rel.fetchall(), df.columns, list(rel.columns))
    assert ok, msg
    # 3 raw rows, but only 2 sketch keys: the NULL-user row is excluded
    assert got[0]["n_rows"] == 3 and got[0]["k_used"] == 2 and got[0]["est_distinct"] == 2


def test_sweep_pins_fixture_schemas(tmp_path):
    """r9 verdict ask #6: the degenerate sweep derives empty/doctored
    table schemas from the base parquet at sweep time, so a silent
    fixture schema change could sail through. `_assert_base_schemas`
    pins the declared StructTypes against the on-disk files — green on
    the real fixtures, loud on a deliberately renamed column."""
    import shutil

    import duckdb

    from serverless_etl_reporting_pipeline_spark.sources.reader import TABLES
    from tools.degenerate_sweep import _assert_base_schemas

    base = "/root/testdata/sf0.001"
    _assert_base_schemas(base)  # the real fixtures must pass

    scratch = tmp_path / "drift"
    scratch.mkdir()
    for t in TABLES:
        shutil.copy(f"{base}/{t}.parquet", scratch / f"{t}.parquet")
    duckdb.sql(
        f"COPY (SELECT r_regionkey AS region_key, r_name FROM '{base}/region.parquet') "
        f"TO '{scratch}/region.parquet' (FORMAT PARQUET)"
    )
    with pytest.raises(AssertionError, match="schema drift"):
        _assert_base_schemas(str(scratch))


def test_e05_nan_amount_excluded_both_engines(spark, tmp_path):
    """The r10 NaN-policy decision, pinned: e05 is the one site where a
    NaN amount would SURFACE silently (percentile/quantile_cont return
    NaN on both engines instead of fail-stopping like the money path's
    cents cast), so it carries the metric guard — a NaN o_totalprice is
    a missing measurement, excluded from the percentile frame on BOTH
    engines. Differential on a doctored corpus the sweep can't carry
    (a NaN amount would fail-stop every other orders money query)."""
    import datetime
    import math

    import duckdb

    from serverless_etl_reporting_pipeline_spark.sources.schemas import SCHEMAS

    d = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, "O", 100.0, d, "1-URGENT"),
        (2, 1, "O", 200.0, d, "1-URGENT"),
        (3, 1, "O", float("nan"), d, "1-URGENT"),
        (4, 2, "F", 50.0, d, "5-LOW"),
    ]
    spark.createDataFrame(rows, SCHEMAS["orders"]).coalesce(1).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    q = REGISTRY["e05_order_percentiles"]
    df = q.builder(spark, str(tmp_path))
    got = df.collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    rel = con.sql(q.oracle)
    ok, msg, _ = compare(got, rel.fetchall(), df.columns, list(rel.columns))
    assert ok, msg
    urgent = next(r for r in got if r["o_orderpriority"] == "1-URGENT")
    # NaN excluded: p50 of {100, 200} is 150, and nothing is NaN
    assert urgent["p50"] == 150.0
    assert all(math.isfinite(r[c]) for r in got for c in ("p50", "p90", "p99"))


def test_degenerate_fixtures_crash_free_and_oracle_exact(spark):
    """The r8 degenerate-input sweep, pinned: queries that the doctored
    fixtures (empty/NULL/whitespace docs, zero-norm and quantizes-to-
    zero embeddings, out-of-scheme source ids, zero-variance domains,
    NULL event fields) used to CRASH — DIVIDE_BY_ZERO under ANSI, CAST_
    INVALID_INPUT, bytes(None) in Arrow kernels — must now run AND
    still match their DuckDB oracles bit-for-bit on that data."""
    from tools.degenerate_sweep import OUT, build_doctored
    from tools.oracle_check import compare, duck_connect

    dest = build_doctored("/root/testdata/sf0.001", f"{OUT}/sf_test")
    duck = duck_connect(dest)
    fixed = [
        "t05_quality_score",        # empty doc: char-length divisor
        "v08_label_cohesion",       # zero-norm vector: cosine divisor
        "c05_weighted_sample",      # out-of-scheme source: int cast
        "c09_domain_outliers",      # zero-variance domain: sqrt(var) divisor
        "m02_decode_features",      # NULL payload: bytes(None)
        "m03_frame_sample",
        "m04_resize",
        "t12_chunking",             # NULL doc excluded; empty chunk = md5('') both engines
        "t21_passage_dedup_stats",  # DuckDB array_to_string([]) is NULL: coalesced
        "t23_boilerplate_scrub",
        "p06_json_extraction",      # malformed JSON: NULL both engines, never strict-parse error
        "v16_ivf_lloyd_refresh",    # zero-norm rows excluded from retraining both engines
        # r9 doctored rows (NULL-ts purchases, zero-customer nations,
        # NULL custkeys in the d04/d05 year slice): the NULL-event-time
        # contract and the zero-row-group paths, pinned
        "e01_scd2_history",         # version rows need a valid_from: ts IS NOT NULL both engines
        "e08_scd2_incremental_apply",  # watermark split can't route NULL ts
        "s01_tumbling_1h",          # F.window drops NULL ts; oracle mirrors
        "s03_session_window_30m",   # session_window needs an event time
        "j03_left_join_keep_empty",  # zero-customer nations kept with count 0
        "d04_except_customers",     # NULL custkey as a set element, both engines
        "d05_intersect_customers",
        "w06_sessionization",       # sessions need an event time
        "w08_event_debounce",       # time-windowed dedup: NULL ts excluded
        # r9 corrupt-embedding rows (NULL vector, NULL label): NULL
        # vectors excluded from every kernel (_ids_vectors), NULL
        # labels neither train nor join the quantizer
        "v01_knn_bruteforce",
        "v11_semdedup",
        "v14_ivf_persisted_probe",
        "v15_ivf_assign_arrivals",
        "v16_ivf_lloyd_refresh",
        # r9 RAGGED rows (40- and 100-dim vectors in a 64-dim corpus):
        # off-dimension rows are corrupt like NULL — excluded from every
        # kernel/centroid/posting/assignment on both engines (the
        # query's dimension for single-query ops, the modal len for
        # pair/index ops); v03/v08 are REPORTS and surface the dims
        "v02_top_similar_pairs",
        "v05_ann_ivf_topk",
        "v07_embedding_neardup",
        "v08_label_cohesion",
        "v09_embedding_neardup_lsh",
        "v12_incremental_embedding_probe",
        "v13_batch_knn",
        # r9 NULL-COMPONENT row (a NULL inside a correct-length vector):
        # DuckDB list_sum would skip it (row kept, truncated dot) while
        # Arrow hands the kernels NaN (row dropped — or a garbage int8
        # score in v10's candidate cut). Contract: corrupt, excluded on
        # both engines (oracles' list_filter predicate; the kernels'
        # NaN-norm masks and the training paths' _has_corrupt_component).
        # r9 NON-FINITE components (NaN / +Inf rows 900008/900009):
        # DuckDB orders NaN above everything so a bare nrm > 0 keeps
        # what the kernels drop; Inf norms passed `> 0` until the
        # isfinite masks. Same exclusion contract; the v03/v08 reports
        # drop the corrupt COMPONENT (ANSI bigint cast would raise).
        "v04_ann_lsh_topk",
        "v06_ann_rplsh_topk",
        "v10_sq8_rerank",
        "v03_label_centroids",
        # r9 NaN metric value (events row 9900007): the event counts,
        # its measurement is NULL (functions/money.py metric contract) —
        # 8 of these crashed at CAST(NaN AS BIGINT) before the fix and
        # e03 silently miscounted a bucket
        "a05_hourly_events",
        "e03_value_histogram",
        "k01_salted_user_rollup",
        "k02_salted_nation_activity",
        "s01_tumbling_1h",
        "s02_sliding_1h_15m",
        "w10_daily_ohlc",
        "x04_histogram_quantiles",
    ]
    for name in fixed:
        q = REGISTRY[name]
        df = q.builder(spark, dest)
        rows = df.collect()
        rel = duck.sql(q.oracle)
        ok, msg, _ = compare(rows, rel.fetchall(), df.columns, list(rel.columns))
        assert ok, f"{name} on doctored fixtures: {msg}"
    # spot-pin the defined semantics
    t05 = {r["doc_id"]: r for r in REGISTRY["t05_quality_score"].builder(spark, dest).collect()}
    assert t05[900001]["punct_ratio"] == 0.0  # empty doc: floored divisor
    c05 = {r["doc_id"] for r in REGISTRY["c05_weighted_sample"].builder(spark, dest).collect()}
    assert not ({900001, 900004} & c05)  # webz source: no defined weight
    c09 = {r["source"] for r in REGISTRY["c09_domain_outliers"].builder(spark, dest).collect()}
    assert not ({"solodomain", "uniformdom"} & c09)  # zero variance: no outliers
    m02 = {r["doc_id"] for r in REGISTRY["m02_decode_features"].builder(spark, dest).collect()}
    assert 900003 not in m02 and 900001 in m02  # NULL payload dropped, empty kept
    v12 = {
        r["vec_id"]: r["is_dup"]
        for r in REGISTRY["v12_incremental_embedding_probe"].builder(spark, dest).collect()
    }
    # ragged / NULL- / NaN- / Inf-component snapshot rows are screened
    # (one row each) but never scored
    for corrupt in (900005, 900006, 900007, 900008, 900009):
        assert v12[corrupt] is False, corrupt
    ragged_dims = (
        REGISTRY["v03_label_centroids"].builder(spark, dest).filter("dim >= 64").count()
    )
    assert ragged_dims > 0  # the centroid REPORT surfaces the extra dims
    v10 = {r["vec_id"] for r in REGISTRY["v10_sq8_rerank"].builder(spark, dest).collect()}
    # the NULL-component row must never take an int8 candidate slot
    assert 900007 not in v10
    k01 = {
        r["user_id"]: (r["sum_value_cents"], r["count_event_id"])
        for r in REGISTRY["k01_salted_user_rollup"].builder(spark, dest).collect()
    }
    # NaN metric: the event COUNTS, its measurement doesn't (user
    # 999996 has exactly the one doctored NaN-valued event)
    assert k01[999996] == (None, 1)
    spark.catalog.clearCache()


def test_null_component_query_vector_has_no_neighbors(spark, tmp_path):
    """A QUERY vector with a NULL component has no defined neighbor set:
    the engine short-circuits on its NaN norm, the oracles' qv CTE
    list_filter predicate empties every downstream join — both engines
    return zero rows (the zero-norm-query contract extended to the
    corrupt-component class)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT vec_id,
                 CASE WHEN vec_id = 0
                      THEN list_transform(embedding[1:31], x -> CAST(x AS FLOAT))
                           || [CAST(NULL AS FLOAT)]
                           || list_transform(embedding[33:64], x -> CAST(x AS FLOAT))
                      ELSE embedding END AS embedding,
                 label
          FROM '/root/testdata/sf0.001/embeddings.parquet'
        ) TO '{tmp_path}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'")
    from tools.oracle_check import compare

    for name in ("v01_knn_bruteforce", "v05_ann_ivf_topk", "v10_sq8_rerank"):
        q = REGISTRY[name]
        df = q.builder(spark, str(tmp_path))
        rows = df.collect()
        assert rows == [], f"{name}: NULL-component query must have no neighbors"
        rel = con.sql(q.oracle)
        ok, msg, _ = compare(rows, rel.fetchall(), df.columns, list(rel.columns))
        assert ok, f"{name}: {msg}"


def test_zero_row_tables_crash_free_and_oracle_exact(spark):
    """The r9 zero-row-table sweep, pinned: schema-only copies of every
    table (an empty day partition / fresh lake) through the queries the
    class used to CRASH — driver-side scalar lookups (query vectors,
    watermark max-ids, histogram min/max) on zero rows — plus the
    rollup/cube/grouping-sets family, whose oracles pin Spark's
    zero-rows → zero-groups semantics (the SQL standard would emit a
    count-0 grand-total row). Every query must run AND match its
    oracle on the empty tables."""
    from tools.degenerate_sweep import OUT, build_empty
    from tools.oracle_check import compare, duck_connect

    dest = build_empty("/root/testdata/sf0.001", f"{OUT}/sf_empty_test")
    duck = duck_connect(dest)
    fixed = [
        "x04_histogram_quantiles",   # min/max/count collect on zero rows
        "t20_incremental_neardup",   # watermark max-id None
        "v12_incremental_embedding_probe",
        "pipe02_incremental_funnel",
        "v01_knn_bruteforce",        # no query vector: zero-norm short-circuit
        "v04_ann_lsh_topk",
        "v05_ann_ivf_topk",
        "v06_ann_rplsh_topk",
        "v09_embedding_neardup_lsh",  # _dim_of on empty input
        "v10_sq8_rerank",
        "a13_rollup_year_month",     # zero-rows -> zero-groups, incl. grand total
        "a15_cube_status_priority",
        "a16_grouping_sets",
    ]
    for name in fixed:
        q = REGISTRY[name]
        df = q.builder(spark, dest)
        rows = df.collect()
        assert rows == [], f"{name} on zero-row tables: expected empty, got {len(rows)} rows"
        rel = duck.sql(q.oracle)
        ok, msg, _ = compare(rows, rel.fetchall(), df.columns, list(rel.columns))
        assert ok, f"{name} on zero-row tables: {msg}"


def test_x04_constant_value_distribution(spark, tmp_path):
    """A zero-variance metric (hi == lo) pins the histogram contract:
    the raw bucket expression is 0/0 — NULL in DuckDB (whose least()
    would skip it and pick bucket B-1) and NaN in Spark — so BOTH
    engines define bucket 0 instead, and every quantile lands in the
    single degenerate [lo, lo] interval."""
    import datetime

    import duckdb

    from serverless_etl_reporting_pipeline_spark.sources.schemas import SCHEMAS

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, ts, i, "view", 7.25, "{}") for i in range(10)]
    spark.createDataFrame(rows, SCHEMAS["events"]).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    q = REGISTRY["x04_histogram_quantiles"]
    df = q.builder(spark, str(tmp_path))
    got = df.collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    rel = con.sql(q.oracle)
    ok, msg, _ = compare(got, rel.fetchall(), df.columns, list(rel.columns))
    assert ok, msg
    assert len(got) == 3  # p50/p90/p99 all answered
    for r in got:
        assert r["bucket"] == 0
        assert r["est_lo_micro"] == r["est_hi_micro"] == 7250000
