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
