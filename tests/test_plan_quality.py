"""Physical-plan lint over the whole registry — the automated version of
'.explain and iterate until it's the plan you'd want'.

At 100 TB a CartesianProduct or BroadcastNestedLoopJoin in a corpus
query is an outage, not a slow query; and a scan that reads every column
for a narrow projection wastes IO cluster-wide. These asserts keep
regressions out as the corpus grows.
"""

from __future__ import annotations

import re

import pytest

from serverless_etl_reporting_pipeline_spark.plans import REGISTRY


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_no_cartesian_or_nested_loop_joins(spark, sf_dir):
    bad = []
    for name, q in sorted(REGISTRY.items()):
        plan = _plan(spark, q.builder(spark, sf_dir))
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            bad.append(name)
    assert not bad, f"unbounded join strategies in: {bad}"


def test_flagship_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, REGISTRY["j01_flagship_daily_nation"].builder(spark, sf_dir))
    # 4 joins (orders, customer, nation, region) — all broadcast-hash at
    # fixture scale, none sort-merge (the fact side must not shuffle)
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 4
    assert "SortMergeJoin" not in plan


def test_scans_prune_columns(spark, sf_dir):
    """Narrow projections must reach the parquet reader as narrow
    ReadSchema — lineitem has 16 columns; these queries need ≤ 4."""
    for name, max_cols in [("a01_totals", 2), ("p01_projection_filter", 4)]:
        plan = _plan(spark, REGISTRY[name].builder(spark, sf_dir))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert schemas, f"{name}: no ReadSchema in plan"
        for s in schemas:
            assert len(s.split(",")) <= max_cols, f"{name}: fat scan: {s}"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, REGISTRY["p03_high_value_topk"].builder(spark, sf_dir))
    assert re.search(r"PushedFilters: \[.*GreaterThan", plan), plan[:500]


def test_topk_plans_take_ordered(spark, sf_dir):
    """orderBy+limit must plan TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, REGISTRY["p03_high_value_topk"].builder(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", ["a02_revenue_by_nation", "a04_daily_revenue"])
def test_aggregates_are_partial_final(spark, sf_dir, name):
    """Group-bys must plan map-side partial + final HashAggregate."""
    plan = _plan(spark, REGISTRY[name].builder(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize(
    "name",
    [
        "t19_decontamination",  # eval-split shingle set is benchmark-sized
        "e04_dq_checks",  # customer dim broadcasts under the fact scan
        "v08_label_cohesion",  # labels x dims centroid frame broadcasts
        "t14_tfidf_top_terms",  # vocabulary-sized df frame broadcasts
        "c02_bloom_decontamination",  # the Bloom bit-set broadcasts to both semi-joins
        "c06_chargram_lm_score",  # the charset²-sized LM broadcasts
        "x02_frequent_users",  # the pruned candidate set broadcasts for the recount
        "c11_mixture_sample",  # the domain target frame broadcasts over the corpus
        "t24_contamination_ratio",  # the eval shingle set broadcasts into the LEFT join
    ],
)
def test_small_side_broadcasts(spark, sf_dir, name):
    """The small side of each new-query join must broadcast — the fact/
    corpus side never shuffles for it."""
    plan = _plan(spark, REGISTRY[name].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join\n{plan[:800]}"
    assert "SortMergeJoin" not in plan, f"{name}: unexpected sort-merge join"


def test_e02_merge_plan_shape(spark, sf_dir):
    """The MERGE-shaped e02 must plan exactly two row_number windows (one
    per side) and ONE join — a regression gate for the r2→r3 slowdown
    investigation: more windows or joins means a subtree is recomputed."""
    plan = _plan(spark, REGISTRY["e02_merge_upsert"].builder(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Window(?!GroupLimit)", plan)) == 2, plan[:800]
    assert len(re.findall(r"\(\d+\) SortMergeJoin|\(\d+\) BroadcastHashJoin|\(\d+\) ShuffledHashJoin", plan)) == 1


def test_t19_shingle_subtree_cached(spark, sf_dir):
    """t19 feeds its tokenize→shingle→distinct subtree to both the
    held-out and training sides; the persist must stay (r3 regression:
    dropping it recomputed the most expensive map stage twice)."""
    df = REGISTRY["t19_decontamination"].builder(spark, sf_dir)
    plan = _plan(spark, df)
    assert "InMemoryTableScan" in plan, "t19 lost its persisted shingle subtree"
    # builder persists lazily; drop the cache so tests stay hermetic
    spark.catalog.clearCache()


def test_t20_probes_persisted_index_snapshot_side(spark, sf_dir):
    """t20's candidate join must PROBE the persisted corpus band index
    with the snapshot side — never re-run near-dup over the union. The
    persisted corpus shingle/signature subtrees show as InMemoryTableScan,
    and the corpus parquet is scanned with the watermark filter pushed
    down (so at 100 TB only index build, not an unbounded rescan)."""
    df = REGISTRY["t20_incremental_neardup"].builder(spark, sf_dir)
    plan = _plan(spark, df)
    assert "InMemoryTableScan" in plan, "t20 lost its persisted band index"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def test_salted_queries_plan_salt_exchange(spark, sf_dir):
    """k01/k02 must actually execute the salted strategy: the salt column
    appears in the aggregate/join keys, and k01 plans the two-phase
    aggregate (partial+final on (key, salt), then partial+final on key)."""
    plan1 = _plan(spark, REGISTRY["k01_salted_user_rollup"].builder(spark, sf_dir))
    assert "_salt" in plan1, "k01: salt column optimized away"
    assert plan1.count("HashAggregate") >= 4, "k01: missing two-phase salted aggregate"
    plan2 = _plan(spark, REGISTRY["k02_salted_nation_activity"].builder(spark, sf_dir))
    assert "_salt" in plan2, "k02: salt column optimized away"


def test_w09_prunes_before_window_sort(spark, sf_dir):
    """The diversified top-k must plan WindowGroupLimit (per-key top-2
    pruned before the window sort) and a TakeOrderedAndProject global
    top-k — never a full sort of the fact table."""
    plan = _plan(spark, REGISTRY["w09_diversified_topk"].builder(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan


def test_c09_stats_broadcast_back(spark, sf_dir):
    """c09's per-source stats aggregate must broadcast back over the
    corpus scan — the fact side never shuffles for the join."""
    plan = _plan(spark, REGISTRY["c09_domain_outliers"].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_c08_label_map_join_not_hint_forced(spark, sf_dir):
    """c08's component-label map is NOT broadcast-bounded at 100 TB (a
    20-50%% dup-rate corpus makes it corpus-scale), so the join back to
    the corpus must carry no broadcast hint — shuffled join is the safe
    default and AQE may upgrade it only from runtime stats."""
    df = REGISTRY["c08_leakage_safe_split"].builder(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "hint" not in analyzed.lower(), "c08 must not force a join strategy"


@pytest.mark.parametrize("name", ["v02_top_similar_pairs", "v07_embedding_neardup"])
def test_allpairs_vector_ops_never_collect_vectors(spark, sf_dir, name, monkeypatch):
    """The exact all-pairs ops must use the block-grid path: building
    the plan may run scalar actions (count) but must NEVER collect
    vector rows to the driver — a driver OOM at 100 TB."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):
        raise AssertionError(f"{name} builder collected rows driver-side")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom, raising=False)
    df = REGISTRY[name].builder(spark, sf_dir)  # must not raise
    assert df is not None


def test_x01_kmv_merges_via_topk_not_global_sort(spark, sf_dir):
    """The KMV merge over the Arrow-pruned hashes must plan a top-k
    (TakeOrderedAndProject — the whole-frame `row_number <= k+1` rank
    collapses to it), never a full global sort of the hash column, and
    the partial pass must be an Arrow map (no shuffle of the raw keys
    before pruning)."""
    plan = _plan(spark, REGISTRY["x01_kmv_distinct_users_days"].builder(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert "MapInPandas" in plan, plan[:800]
    # no global sort anywhere: a range-partitioning Exchange or a
    # standalone Sort node would mean the hash column is fully sorted
    # instead of top-k'd (the prior disjunction here was vacuously true)
    assert "Exchange rangepartitioning" not in plan, plan[:800]
    assert not re.findall(r"\(\d+\) Sort ", plan), plan[:800]


def test_v10_sq8_two_stage_topk(spark, sf_dir):
    """Both SQ8 stages (int8 candidate cut, exact rerank) must plan as
    TakeOrderedAndProject over the Arrow scoring kernel — no global
    sort, no shuffle of the vectors."""
    plan = _plan(spark, REGISTRY["v10_sq8_rerank"].builder(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) TakeOrderedAndProject", plan)) == 2, plan[:800]
    assert "MapInPandas" in plan
    assert "Exchange rangepartitioning" not in plan


def test_x03_grouped_kmv_prunes_before_exchange(spark, sf_dir):
    """The grouped KMV must (a) run the Arrow prune with NOTHING but
    map-side ops (Project/Filter/Scan) beneath it — the raw key frame
    never crosses an Exchange un-pruned — and (b) plan the rank<=k
    filter as WindowGroupLimit partial+final, so at most k rows per
    group survive the per-group shuffle."""
    plan = _plan(spark, REGISTRY["x03_kmv_distinct_by_type"].builder(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", plan)) == 2, plan[:800]
    tree = plan.split("\n\n")[0].splitlines()
    (mp_i,) = [i for i, line in enumerate(tree) if "MapInPandas" in line]
    indent = len(tree[mp_i]) - len(tree[mp_i].lstrip(" :+-"))
    below = []
    for line in tree[mp_i + 1:]:
        if len(line) - len(line.lstrip(" :+-")) <= indent:
            break
        below.append(line)
    assert below, plan[:400]
    assert all(("Project" in l) or ("Filter" in l) or ("Scan" in l) for l in below), below


def test_x04_histogram_corpus_work_is_one_aggregate(spark, sf_dir):
    """x04's only corpus-wide work must be the partial+final bucket
    aggregate; the cumulative Window and the quantile explode (Generate)
    must sit ABOVE it in the tree — i.e. they run on the bounded ≤B-row
    bucket frame, never over raw values."""
    tree = _plan(spark, REGISTRY["x04_histogram_quantiles"].builder(spark, sf_dir)).split("\n\n")[0]

    def node_line(pat):
        for i, line in enumerate(tree.splitlines()):
            if pat in line:
                return i
        raise AssertionError(f"{pat} not in plan\n{tree}")

    # tree prints top-down: operators higher in the tree appear EARLIER
    assert node_line("Generate") < node_line("Window") < node_line("HashAggregate"), tree
    # exactly one partial+final aggregate pair touches the scan
    assert tree.count("HashAggregate") == 2, tree
    assert "SortMergeJoin" not in tree and "CartesianProduct" not in tree


def test_t21_fingerprint_subtree_cached(spark, sf_dir):
    """t21's passage explode feeds both the corpus count and the scoring
    join; the persist must stay or the tokenize→chunk→md5 map stage (the
    dominant cost) runs twice."""
    plan = _plan(spark, REGISTRY["t21_passage_dedup_stats"].builder(spark, sf_dir))
    assert "InMemoryTableScan" in plan, "t21 lost its persisted fingerprint subtree"
    # both consumers must read the SAME cached relation: the explode may
    # appear under each InMemoryTableScan in the printout, but with one
    # shared node id — two distinct Generate ids means two real executions
    tree = plan.split("\n\n")[0]
    gen_ids = set(re.findall(r"Generate \((\d+)\)", tree))
    assert len(gen_ids) == 1, tree
    spark.catalog.clearCache()


def test_pipe01_shares_one_shingle_subtree(spark, sf_dir):
    """The composed pipeline's decontamination stage must reuse ONE
    persisted shingle subtree for both sides (the t19 discipline
    surviving composition), and the whole five-stage job must stay free
    of unbounded join strategies."""
    plan = _plan(spark, REGISTRY["pipe01_pretrain_funnel"].builder(spark, sf_dir))
    assert "InMemoryTableScan" in plan, "pipe01 lost the persisted shingle subtree"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def test_v11_semdedup_one_cluster_shuffle_no_joins(spark, sf_dir):
    """SemDeDup's pair work must be cluster-bucketed: the only Exchange
    is the hash partition on cluster feeding the per-cluster Arrow pair
    kernel (FlatMapGroupsInPandas); assignment is a shuffle-free Arrow
    map, and no join operator of any kind appears — Σ|cluster|² work,
    never an all-pairs join."""
    plan = _plan(spark, REGISTRY["v11_semdedup"].builder(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan, plan[:800]
    assert "MapInPandas" in plan, plan[:800]
    tree = plan.split("\n\n")[0]
    exchanges = re.findall(r"\(\d+\) Exchange", tree)
    assert len(exchanges) <= 2, tree  # cluster hash + final groupBy(id_b)
    assert not re.findall(r"Join", tree), tree


def test_pipe02_reuses_persisted_state_delta_scans_pruned(spark, sf_dir):
    """The incremental funnel must PROBE persisted base state, never
    rebuild it per consumer: the hash index, benchmark shingle index and
    base domain counts all surface as InMemoryTableScan, the benchmark
    index join back over the delta is a broadcast, and every parquet
    scan of documents in the final plan carries the pushed >= watermark
    filter (the base corpus is only ever read through the cached
    state)."""
    df = REGISTRY["pipe02_incremental_funnel"].builder(spark, sf_dir)
    plan = _plan(spark, df)
    tree = plan.split("\n\n")[0]
    assert "InMemoryTableScan" in tree, "pipe02 lost its persisted base state"
    assert "BroadcastHashJoin" in tree
    # at least 4 DISTINCT cached relations: the hash index, the base
    # shingle subtree, the benchmark index, the base domain counts and
    # the annotated delta frame (distinct node ids — "formatted" repeats
    # a cached subtree under every consumer with the SAME ids)
    imr_ids = set(re.findall(r"InMemoryRelation \((\d+)\)", plan))
    assert len(imr_ids) >= 4, f"persisted state collapsed: {sorted(imr_ids)}"
    # and NO unfiltered full-corpus scan anywhere — every documents scan,
    # live or inside a cached state build, must carry a pushed watermark
    # bound (< for the base-state build, >= for the delta probe)
    checked = 0
    for m in re.finditer(r"\(\d+\) Scan parquet[^\n]*\n((?:[^\n]*\n)*?)\s*ReadSchema", plan):
        block = m.group(0)
        if "documents" in block:
            assert ("GreaterThanOrEqual(doc_id" in block) or (
                "LessThan(doc_id" in block
            ), f"unfiltered corpus scan:\n{block}"
            checked += 1
    assert checked, "no documents scan found — lint regex rotted"
    spark.catalog.clearCache()


def test_v12_probes_persisted_vector_index(spark, sf_dir):
    """v12 must PROBE the persisted corpus band-code index (an
    InMemoryRelation) with a map-only snapshot fan: the live snapshot
    scan carries the pushed >= watermark filter, the bucket kernel is
    the only grouped stage, and no vector-carrying join appears below
    it."""
    df = REGISTRY["v12_incremental_embedding_probe"].builder(spark, sf_dir)
    plan = _plan(spark, df)
    tree = plan.split("\n\n")[0]
    assert "InMemoryTableScan" in tree, "v12 lost its persisted corpus index"
    assert "FlatMapGroupsInPandas" in tree, tree
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(vec_id", plan), plan[:800]
    spark.catalog.clearCache()


def test_t23_chunk_subtree_cached_counts_not_broadcast(spark, sf_dir):
    """t23's tokenize→chunk explode must be persisted (it feeds both the
    count side and the join side), and the fingerprint-count frame —
    corpus-scale at 100 TB — must NOT be broadcast: the join back is a
    plain keyed join AQE may upgrade only from runtime stats."""
    df = REGISTRY["t23_boilerplate_scrub"].builder(spark, sf_dir)
    plan = _plan(spark, df)
    assert "InMemoryTableScan" in plan, "t23 lost its persisted chunk subtree"
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "hint" not in analyzed.lower(), "t23 must not force a join strategy"
    spark.catalog.clearCache()


def test_v13_batch_knn_prunes_per_split_then_window_limit(spark, sf_dir):
    """Batched kNN must score in one Arrow map (no corpus shuffle of
    vectors), prune per split, and rank globally via WindowGroupLimit —
    never a join between the query and corpus sides."""
    plan = _plan(spark, REGISTRY["v13_batch_knn"].builder(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" in tree, tree
    assert "WindowGroupLimit" in tree, tree
    assert not re.findall(r"Join", tree), tree


def test_v14_probes_persisted_postings_only_probe_pairs_broadcast(spark, sf_dir):
    """v14 must probe the PERSISTED posting lists (InMemoryRelation — the
    stored-index stand-in) through exactly ONE BroadcastHashJoin whose
    build side is the tiny (qid, cell) probe-pair frame: bucket pruning,
    the corpus side never shuffles or broadcasts. Scoring is one Arrow
    map and the per-query rank is WindowGroupLimit-pruned on both sides
    of the single qid exchange."""
    df = REGISTRY["v14_ivf_persisted_probe"].builder(spark, sf_dir)
    plan = _plan(spark, df)
    tree = plan.split("\n\n")[0]
    assert "InMemoryTableScan" in tree, "v14 lost its persisted postings index"
    assert len(re.findall(r"BroadcastHashJoin", tree)) >= 1, tree
    assert "MapInPandas" in tree, tree
    assert "WindowGroupLimit" in tree, tree
    # the ONLY broadcast is the local (qid, cell) probe-pair frame —
    # asserted on the detail block's Input columns (the formatted tree
    # interleaves branches, so line proximity would lie here)
    bx = re.findall(r"\(\d+\) BroadcastExchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert len(bx) == 1, f"expected exactly one broadcast, got {bx}"
    assert "qid#" in bx[0] and "_cell#" in bx[0], f"wrong broadcast side: {bx[0]}"
    spark.catalog.clearCache()


def test_x01_x03_single_scan_count_fold(spark, sf_dir):
    """The KMV estimators must read the input exactly ONCE: the row
    count is folded into the Arrow partial (one extra NULL-hash row per
    group per split), never a second count() scan of the corpus — and
    nothing is persisted (no cache entry outlives the query)."""
    for qid in ("x01_kmv_distinct_users_days", "x03_kmv_distinct_by_type"):
        plan = _plan(spark, REGISTRY[qid].builder(spark, sf_dir))
        tree = plan.split("\n\n")[0]
        scans = len(re.findall(r"Scan parquet", tree))
        assert scans == 1, f"{qid}: expected 1 input scan, saw {scans}:\n{tree}"
        assert "MapInPandas" in tree, tree
        assert "InMemoryRelation" not in plan, f"{qid}: unexpected persisted state"
    # x02's returned plan is the RECOUNT only (scan 2 of 2): the
    # candidate/total pass ran once at build via the driver-collect —
    # exactly one live scan, candidates arriving as a local relation
    plan = _plan(spark, REGISTRY["x02_frequent_users"].builder(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert len(re.findall(r"Scan parquet", tree)) == 1, tree
    assert "Scan ExistingRDD" in tree and "MapInPandas" not in tree, tree


def test_x05_pair_map_only_broadcast_arrow_partial(spark, sf_dir):
    """x05's only broadcast must be the tiny (pair, group) membership
    map — never the hash sets — and the k-min state must flow through
    the Arrow per-split partial (MapInPandas) before any exchange."""
    df = REGISTRY["x05_kmv_set_algebra"].builder(spark, sf_dir)
    plan = _plan(spark, df)
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" in tree, tree
    bx = re.findall(r"\(\d+\) BroadcastExchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert len(bx) == 1, f"expected exactly one broadcast, got {bx}"
    assert "pid#" in bx[0] and "type_a#" in bx[0], f"wrong broadcast side: {bx[0]}"
    spark.catalog.clearCache()


def test_e08_persisted_base_history_watermarked_scans(spark, sf_dir):
    """e08 must build the base SCD2 history ONCE (persisted —
    InMemoryRelation) and every events scan must carry a pushed ts
    watermark bound (<= for the base-state build, > for the delta) —
    never an unfiltered rescan of the event log."""
    df = REGISTRY["e08_scd2_incremental_apply"].builder(spark, sf_dir)
    plan = _plan(spark, df)
    assert "InMemoryTableScan" in plan, "e08 lost its persisted base history"
    checked = 0
    for m in re.finditer(r"\(\d+\) Scan parquet[^\n]*\n((?:[^\n]*\n)*?)\s*ReadSchema", plan):
        block = m.group(0)
        if "events" in block:
            assert ("LessThanOrEqual(ts" in block) or ("GreaterThan(ts" in block), (
                f"unfiltered event-log scan:\n{block}"
            )
            checked += 1
    assert checked, "no events scan found — lint regex rotted"
    spark.catalog.clearCache()


def test_v15_assignment_is_map_only(spark, sf_dir):
    """IVF ingest assignment must be ONE Arrow map over the arrivals —
    no join with the corpus or centroid side (the centroid table rides
    a task broadcast, not a plan-level BroadcastExchange), and the only
    Exchange is the output sort's range partitioning."""
    plan = _plan(spark, REGISTRY["v15_ivf_assign_arrivals"].builder(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" in tree, tree
    assert not re.findall(r"Join", tree), tree
    assert "BroadcastExchange" not in tree, tree
    ex = [ln for ln in tree.splitlines() if re.search(r"\bExchange\b", ln)]
    assert len(ex) == 1, ex
    # the tree names only the node; its partitioning is in the detail block
    assert re.search(r"\(\d+\) Exchange\nInput.*\nArguments: rangepartitioning", plan), plan


def test_v16_lloyd_refresh_map_only_then_aggregates(spark, sf_dir):
    """The Lloyd refresh must re-assign in ONE Arrow map pass (no join
    with the corpus, no plan-level broadcast) and reduce through
    partial+final aggregates — everything after the (cell, dim)
    aggregate is cells×dims-sized."""
    plan = _plan(spark, REGISTRY["v16_ivf_lloyd_refresh"].builder(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" in tree, tree
    assert not re.findall(r"Join", tree), tree
    assert "BroadcastExchange" not in tree, tree
    ex = [ln for ln in tree.splitlines() if re.search(r"\bExchange\b", ln)]
    assert len(ex) <= 3, ex  # (cell,dim) agg + cv rebuild agg + output sort


_SPREAD_QUERIES = [
    # the r10 fan-out discipline: a single-split scan feeding a
    # high-fan-out explode/regex map must carry the doc_id spread
    # exchange (sources/reader.py spread_scan) so the fan-out and its
    # partial aggregate parallelize — and, where grouping is doc-keyed,
    # the post-explode rows never shuffle
    "c01_pii_scrub",
    "c02_bloom_decontamination",
    "c03_entropy_quality",
    "c06_chargram_lm_score",
    "t07_ngram_jaccard_pairs",
    "t08_simhash",
    "t12_chunking",
    "t14_tfidf_top_terms",
    "t15_top_bigrams",
    "t19_decontamination",
    "t24_contamination_ratio",
]


@pytest.mark.parametrize("name", _SPREAD_QUERIES)
def test_fanout_queries_spread_single_split_scan(spark, sf_dir, name, monkeypatch):
    """When the input bytes demand it (forced here with a 1 KB/partition
    target — at the default 64 KB target the KB-scale fixture scan
    correctly stays unspread, the r14 size-aware change), the fan-out
    queries must show the spread exchange (hashpartitioning by doc_id)
    in their physical plan; a regression here silently re-serializes
    the whole explode onto one core (the r9 c06 'noise')."""
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_TARGET_BYTES", "1024")
    q = REGISTRY[name]
    plan = _plan(spark, q.builder(spark, sf_dir))
    assert "hashpartitioning(doc_id" in plan, f"{name}: spread exchange missing"
