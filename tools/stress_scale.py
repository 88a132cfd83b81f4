"""Derived-data stress harness: measure the 100 TB scale CLAIMS.

Every heavy query's plan was audited as "bounded by candidates /
map + broadcast-probe, not corpus²" — this harness turns those plan
arguments into measurements by running the heavy hitters on derived
corpora at N× the sf0.1 row count and checking the observed scaling is
~linear (testdata itself is read-only, so the derived sets live under
/tmp).

Derivation keeps the workload honest: each copy k shifts ids by
k·(max_id+1) and applies a per-copy consonant rotation to text
(rotation of the embedding components for vectors), so every copy keeps
the ORIGINAL's internal near-dup structure while cross-copy similarity
collapses to background noise — candidate volume grows ∝ N, exactly the
regime the banded/bucketed designs promise to scale in. A naive
union-of-identical-copies would instead manufacture an N² cross-copy
duplicate clique and measure the data pathology, not the algorithm.

Usage: python tools/stress_scale.py [N ...]   (default: 4 16)
Prints one JSON line per (query, N) and a markdown table at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_etl_reporting_pipeline_spark.plans import REGISTRY  # noqa: E402
from serverless_etl_reporting_pipeline_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_stress"
HEAVY = [
    "t09_minhash_lsh_neardup",
    "t11_neardup_components",
    "t20_incremental_neardup",
    "c02_bloom_decontamination",
    "c08_leakage_safe_split",
    "v09_embedding_neardup_lsh",
    "v11_semdedup",
    "v12_incremental_embedding_probe",
    "pipe01_pretrain_funnel",
    "pipe02_incremental_funnel",
    # round-6 newcomers (round-7 verdict ask #6)
    "t23_boilerplate_scrub",
    "t24_contamination_ratio",
    "c12_token_budget_mixture",
    "v13_batch_knn",
    # round-7 newcomers (x03/x05: distinct-user cardinality grows ∝ N in
    # the derived events — the regime a k-bounded sketch must stay flat in)
    "v14_ivf_persisted_probe",
    "x03_kmv_distinct_by_type",
    "x05_kmv_set_algebra",
    # round-8 rewrites: one-scan count fold (x01/x03), 2-scan MG (x02) —
    # expected ~linear in rows with k/capacity-bounded shuffles
    "x01_kmv_distinct_users_days",
    "x02_frequent_users",
    "e08_scd2_incremental_apply",
    # v15: the assignment itself is ∝ arrivals (fixed here at 10), so the
    # measured growth is the frozen-quantizer build's one explode+agg
    # over the corpus — the expected-linear term, with a flat probe atop
    "v15_ivf_assign_arrivals",
    # v16: assignment pass + one (cell, dim) aggregate — expected ~linear
    "v16_ivf_lloyd_refresh",
]
# 20 consonants → up to 20 distinct per-copy rotations (no accidental
# cross-copy exact duplicates for N ≤ 20)
_SRC = "bcdfghjklmnpqrstvwxz"


def build(spark, n: int) -> str:
    dest = os.path.join(OUT, f"x{n}")
    # marker versioned: v2 corpora add the derived events table
    if os.path.exists(os.path.join(dest, "_built_v2")):
        return dest
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    from serverless_etl_reporting_pipeline_spark.sources.reader import load_table

    # load_table, not spark.read: the fixture events carry ns timestamps
    events = load_table(spark, BASE, "events")
    dmax = docs.agg(F.max("doc_id")).first()[0] + 1
    vmax = emb.agg(F.max("vec_id")).first()[0] + 1
    emax = events.agg(F.max("event_id")).first()[0] + 1
    umax = events.agg(F.max("user_id")).first()[0] + 1
    dparts, eparts, evparts = [], [], []
    for k in range(n):
        tgt = _SRC[k % len(_SRC):] + _SRC[: k % len(_SRC)]
        dparts.append(
            docs.select(
                (F.col("doc_id") + k * dmax).alias("doc_id"),
                F.translate("text", _SRC, tgt).alias("text"),
                "lang", "source", "n_chars",
            )
        )
        rot = k % 64
        eparts.append(
            emb.select(
                (F.col("vec_id") + k * vmax).alias("vec_id"),
                F.expr(
                    f"concat(slice(embedding, {rot + 1}, {64 - rot}), slice(embedding, 1, {rot}))"
                ).alias("embedding"),
                "label",
            )
        )
        # events copy: ids and USERS shifted, so distinct-key cardinality
        # grows ∝ N (the regime a sketch must stay k-bounded in)
        evparts.append(
            events.select(
                (F.col("event_id") + k * emax).alias("event_id"),
                "ts",
                (F.col("user_id") + k * umax).alias("user_id"),
                "event_type", "value", "props",
            )
        )
    d = dparts[0]
    for p in dparts[1:]:
        d = d.unionByName(p)
    e = eparts[0]
    for p in eparts[1:]:
        e = e.unionByName(p)
    ev = evparts[0]
    for p in evparts[1:]:
        ev = ev.unionByName(p)
    d.write.mode("overwrite").parquet(f"{dest}/documents.parquet")
    e.write.mode("overwrite").parquet(f"{dest}/embeddings.parquet")
    ev.write.mode("overwrite").parquet(f"{dest}/events.parquet")
    open(os.path.join(dest, "_built_v2"), "w").close()
    return dest


def main() -> int:
    # ascending: the summary table's column headers assume it
    sizes = sorted(int(a) for a in sys.argv[1:]) or [4, 16]
    only = os.environ.get("SPARK_GRAFT_STRESS_ONLY")
    spark = get_spark()
    results = []
    for n in sizes:
        sf_dir = build(spark, n)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

        def wideband(spark, sf_dir):
            # v09 with the geometry a grown corpus needs: 12-bit bands
            # (4096 codes/band) instead of the fixture's 4-bit (16 codes)
            # — the documented dial that keeps Σ|bucket|² sub-quadratic
            # as n grows, trading borderline-pair recall
            from serverless_etl_reporting_pipeline_spark.operators.vectors import (
                neardup_pairs_lsh_banded,
            )

            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            return neardup_pairs_lsh_banded(emb, threshold=0.44, n_bits=48, bands=4, seed=4242)

        def components_instrumented(spark, sf_dir):
            # t11/c08's shared quadratic-adjacent surface measured
            # DIRECTLY (round-8 verdict ask #7): the banded-LSH pair
            # graph + min-label propagation, recording edge count and
            # convergence rounds — the claim is rounds bounded by
            # component diameter (flat in N on the derived corpora,
            # whose per-copy dup structure is preserved) and wall time
            # ~linear in edges.
            from serverless_etl_reporting_pipeline_spark.operators.minhash import (
                minhash_neardup_pairs,
                neardup_components,
            )

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            st = stats_by_name.setdefault("t11_components_instrumented", {})
            st.clear()
            pairs = minhash_neardup_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
            return neardup_components(pairs, stats=st)

        stats_by_name: dict[str, dict] = {}
        jobs = [(name, REGISTRY[name].builder) for name in HEAVY]
        jobs.append(("v09_wideband_48bit", wideband))
        jobs.append(("t11_components_instrumented", components_instrumented))
        for name, builder in jobs:
            if only and not any(tok in name for tok in only.split(",")):
                continue
            best, rows = None, None
            for _ in range(2):  # best-of-2: min is the steady-state cost
                spark.catalog.clearCache()
                t0 = time.time()
                rows = builder(spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rec = {
                "query": name, "xN": n, "n_docs": n_docs, "n_vecs": n_vecs,
                "rows_out": rows, "sec": round(best, 2),
                **stats_by_name.get(name, {}),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    # markdown summary: sec per query per size + observed scaling exponent
    by_q = {}
    for r in results:
        by_q.setdefault(r["query"], []).append(r)
    print("\n| query | " + " | ".join(f"x{n} sec" for n in sizes) + " | t(big)/t(small) | rows ratio |")
    print("|---|" + "---|" * (len(sizes) + 2))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["xN"])
        ratio = rs[-1]["sec"] / max(rs[0]["sec"], 1e-9)
        rratio = rs[-1]["xN"] / rs[0]["xN"]
        print(
            f"| {q} | " + " | ".join(str(r["sec"]) for r in rs)
            + f" | {ratio:.1f}× | {rratio:.0f}× |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
