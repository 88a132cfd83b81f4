"""Property-based differential tests for the custom join operators:
asof_backward_join vs pandas.merge_asof (an independent reference
implementation), interval_join vs brute-force pair enumeration."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from serverless_etl_reporting_pipeline_spark.operators.asof import asof_backward_join
from serverless_etl_reporting_pipeline_spark.operators.rangejoin import interval_join

BASE = datetime(2024, 1, 1)

# (key, seconds-offset) pairs; seconds collide often to exercise ties
_key = st.sampled_from(["a", "b", "c"])
_sec = st.integers(min_value=0, max_value=50)
_left_rows = st.lists(st.tuples(_key, _sec), min_size=1, max_size=12)
_right_rows = st.lists(st.tuples(_key, _sec), min_size=0, max_size=12, unique=True)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_left_rows, right=_right_rows)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame(
        {
            "lid": range(len(left)),
            "k": [k for k, _ in left],
            "ts": [BASE + timedelta(seconds=s) for _, s in left],
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": [k for k, _ in right],
            "rts": [BASE + timedelta(seconds=s) for _, s in right],
            # every 3rd payload NULL: the latest right row must win
            # atomically even when its payload is NULL (no stitching
            # older non-null values in)
            "payload": [None if i % 3 == 0 else 100 + i for i in range(len(right))],
            "other": [200 + i for i in range(len(right))],
        }
    )
    rschema = "k string, rts timestamp, payload bigint, other bigint"
    ldf = spark.createDataFrame(lpdf, "lid bigint, k string, ts timestamp")
    rdf = (
        spark.createDataFrame(rpdf.astype(object).where(rpdf.notna(), None), rschema)
        if len(rpdf)
        else spark.createDataFrame([], rschema)
    )
    got = {
        r["lid"]: (r["payload"], r["other"])
        for r in asof_backward_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
            payload_cols=["payload", "other"],
        ).collect()
    }
    if len(rpdf) == 0:
        want = {int(i): (None, None) for i in lpdf["lid"]}
    else:
        want_df = pd.merge_asof(
            lpdf.sort_values("ts", kind="stable"),
            rpdf.sort_values("rts", kind="stable"),
            left_on="ts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (
                None if pd.isna(r.payload) else int(r.payload),
                None if pd.isna(r.other) else int(r.other),
            )
            for r in want_df.itertuples()
        }
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_left_rows, right=_right_rows, span=st.integers(min_value=1, max_value=20))
def test_interval_join_matches_bruteforce(spark, left, right, span):
    ldf = spark.createDataFrame(
        [(i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "lid bigint, k string, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(right)],
        "rid bigint, k string, rts timestamp",
    ) if right else spark.createDataFrame([], "rid bigint, k string, rts timestamp")
    lower, upper = -span * 1_000_000, 0
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts", lower_us=lower, upper_us=upper
        ).collect()
    }
    want = {
        (i, 100 + j)
        for i, (lk, ls) in enumerate(left)
        for j, (rk, rs) in enumerate(right)
        if lk == rk and ls - span <= rs <= ls
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True),
    n_shards=st.integers(min_value=1, max_value=6),
)
def test_shard_plan_properties(spark, ids, n_shards):
    """For ANY id set: every id lands in exactly one shard in [0, n),
    positions are contiguous 1..k per shard, and the plan is invariant
    to input partitioning. Positions are ranks (they shift when shard
    membership changes), but the underlying ORDER is id-derived, so
    removing ids must preserve the survivors' relative order — the
    property that lets a trainer resume a filtered corpus stream."""
    from serverless_etl_reporting_pipeline_spark.operators.text import shard_plan

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    plan = {r["doc_id"]: (r["shard"], r["pos"]) for r in shard_plan(df, "doc_id", n_shards).collect()}
    assert set(plan) == set(ids)
    by_shard = {}
    for i, (s, p) in plan.items():
        assert 0 <= s < n_shards
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), (s, ps)
    # split-invariance: a different input partitioning gives the same plan
    plan2 = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_plan(df.repartition(5), "doc_id", n_shards).collect()
    }
    assert plan2 == plan
    # order stability: removing ids preserves survivors' relative order
    if len(ids) > 2:
        survivors = ids[::2]
        sub = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in shard_plan(
                spark.createDataFrame([(i,) for i in survivors], "doc_id long"),
                "doc_id", n_shards,
            ).collect()
        }
        for s in set(v[0] for v in sub.values()):
            full_order = [i for i, v in sorted(plan.items(), key=lambda kv: (kv[1][0], kv[1][1])) if v[0] == s and i in set(survivors)]
            sub_order = [i for i, v in sorted(sub.items(), key=lambda kv: (kv[1][0], kv[1][1])) if v[0] == s]
            assert sub_order == full_order, (s, sub_order, full_order)
