"""Manufactured hot-key stress for the k-family (r10 verdict ask #6).

The salted operators (`operators/skew.py`, driven by k01/k02) carry
plan lints and oracle-exact results, but until r11 no measurement ran
them against the distribution they exist for: a 90 %-single-key stream
— the regime where one reducer owns the hot key. This harness builds a
derived events corpus at N x the sf0.1 row count (stress_scale's
id-shift derivation) with 90 % of rows reassigned to ONE user, then
measures, at x16/x64:

  agg (k01 shape): naive groupBy vs salted_agg, PLUS the per-salt
      partial-row balance of the hot key (the even-shuffle claim).
      Expected honest result: for algebraic aggs (sum/count/max),
      HashAggregate's map-side combine ALREADY collapses the hot key to
      one partial row per map task, so naive is flat too — the salted
      form matters for aggregates partial combine cannot collapse
      (exact distincts over high-cardinality values, exact percentiles,
      collect_*), and for those Catalyst's distinct-expand rewrite is
      measured alongside.
  join (k02 shape): the dim is forced un-broadcastable
      (autoBroadcastJoinThreshold=-1, the salted_join contract: "use
      only when the dim cannot broadcast"), and the plain sort-merge
      join is measured with AQE skew-join OFF (the raw straggler), with
      it ON (AQE's runtime split), and against salted_join (static
      salting) — same rollup, identical results asserted at each N.

Usage: python tools/stress_skew.py [N ...]     (default: 16 64)
Prints one JSON line per measurement and a markdown table at the end
(PARITY.md records the table).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_etl_reporting_pipeline_spark.operators.skew import _SALT, _salt_col, salted_agg, salted_join  # noqa: E402
from serverless_etl_reporting_pipeline_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_stress_skew"
HOT_USER = 1  # a real c_custkey so the join finds it in the dim


def build_skewed(spark, n: int) -> str:
    """N x sf0.1 events with event_id shifted per copy and 90 % of rows
    reassigned to HOT_USER (event_id % 10 != 0 -> hot). Written with 32
    splits so scans parallelize (single-split fixture lesson)."""
    dest = os.path.join(OUT, f"x{n}")
    if os.path.exists(os.path.join(dest, "_built")):
        return dest
    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    mx = ev.agg(F.max("event_id")).first()[0] + 1
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(k * mx)).alias("event_id"),
            "ts", "user_id", "event_type", "value", "props",
        )
        for k in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    out = out.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 != 0, F.lit(HOT_USER)).otherwise(F.col("user_id")),
    )
    out.repartition(32).write.mode("overwrite").parquet(os.path.join(dest, "events.parquet"))
    open(os.path.join(dest, "_built"), "w").close()
    return dest


def timed(df) -> tuple[float, list]:
    t0 = time.perf_counter()
    rows = df.collect()
    return round(time.perf_counter() - t0, 3), rows


def _key(rows):
    return sorted(tuple(str(v) for v in r) for r in rows)


def main() -> int:
    ns = [int(a) for a in sys.argv[1:]] or [16, 64]
    spark = get_spark(driver_memory="48g")
    results = []

    dim = (
        spark.read.parquet(os.path.join(BASE, "customer.parquet"))
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
    )

    for n in ns:
        dest = build_skewed(spark, n)
        from serverless_etl_reporting_pipeline_spark.functions.money import metric

        ev = spark.read.parquet(os.path.join(dest, "events.parquet")).select(
            "user_id", "event_id", "ts",
            F.round(metric("value") * 100).cast("bigint").alias("value_cents"),
        )
        total = ev.count()
        hot = ev.filter(F.col("user_id") == HOT_USER).count()
        print(json.dumps({"n": n, "rows": total, "hot_share": round(hot / total, 3)}))

        # --- k01 shape: aggregation ---------------------------------
        aggs = dict(
            naive=lambda: ev.groupBy("user_id").agg(
                F.sum("value_cents").alias("sum_value_cents"),
                F.count("event_id").alias("count_event_id"),
                F.max("ts").alias("max_ts")),
            salted=lambda: salted_agg(
                ev, keys=["user_id"],
                aggs={"value_cents": "sum", "event_id": "count", "ts": "max"},
                salts=16).select(
                    "user_id", "sum_value_cents",
                    F.col("count_event_id").cast("bigint").alias("count_event_id"),
                    "max_ts"),
        )
        agg_rows = {}
        for tag, b in aggs.items():
            w, rows = timed(b())
            agg_rows[tag] = _key(rows)
            results.append({"op": "agg", "plan": tag, "n": n, "wall_s": w})
            print(json.dumps(results[-1]))
        assert agg_rows["naive"] == agg_rows["salted"], "salted agg diverged from naive"

        # the class partial combine can NOT collapse: exact distinct of
        # a high-cardinality value under the hot key (Catalyst handles
        # it with the distinct-expand rewrite — measured, not assumed)
        w, _ = timed(ev.groupBy("user_id").agg(F.countDistinct("event_id")))
        results.append({"op": "agg_distinct", "plan": "catalyst_expand", "n": n, "wall_s": w})
        print(json.dumps(results[-1]))

        # per-salt balance of the hot key (the even-shuffle claim)
        bal = (
            ev.withColumn(_SALT, _salt_col(["user_id"], 16))
            .filter(F.col("user_id") == HOT_USER)
            .groupBy(_SALT).count().collect()
        )
        counts = [r["count"] for r in bal]
        results.append({
            "op": "salt_balance", "n": n, "salts": len(counts),
            "max_over_min": round(max(counts) / min(counts), 3),
            "max_over_mean": round(max(counts) * len(counts) / sum(counts), 3),
        })
        print(json.dumps(results[-1]))

        # --- k02 shape: broadcast-impossible join -------------------
        def rollup(joined):
            return joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.sum("value_cents").alias("sum_value_cents"),
            )

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        join_rows = {}
        try:
            for tag, skewfix, b in (
                ("smj_noaqe", "false", lambda: rollup(ev.join(dim, "user_id"))),
                ("smj_aqe", "true", lambda: rollup(ev.join(dim, "user_id"))),
                ("salted", "false", lambda: rollup(salted_join(ev, dim, on=["user_id"], salts=8))),
            ):
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewfix)
                w, rows = timed(b())
                join_rows[tag] = _key(rows)
                results.append({"op": "join", "plan": tag, "n": n, "wall_s": w})
                print(json.dumps(results[-1]))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        assert join_rows["smj_noaqe"] == join_rows["smj_aqe"] == join_rows["salted"], \
            "join variants diverged"

    print("\n| op | plan | N | wall (s) |")
    print("|---|---|---|---|")
    for r in results:
        if "wall_s" in r:
            print(f"| {r['op']} | {r['plan']} | x{r['n']} | {r['wall_s']} |")
        elif r["op"] == "salt_balance":
            print(f"| salt_balance | max/min {r['max_over_min']}, max/mean "
                  f"{r['max_over_mean']} | x{r['n']} | — |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
