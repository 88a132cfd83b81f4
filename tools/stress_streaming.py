"""Streaming-drain stress measurements: the whole-drain cost of the
stateful ingest twins on the derived corpora `tools/stress_scale.py`
builds (same perturbed-copy derivation, same honest-workload argument).

The per-round BASELINE.md drain numbers were first taken ad-hoc; this
makes them repeatable. Each measurement is a COLD full drain: a fresh
work dir, arrival files split into 4 micro-batches by id quartile, one
checkpointed ``AvailableNow`` drain end-to-end. The claim under test is
the same as the query-level harness — drain cost tracks the DATA terms
(per-batch kernel + candidate-bounded probes), so 4× rows must come in
well under 4× seconds (fixed per-micro-batch stream machinery plus
sublinear probes).

Usage: python tools/stress_streaming.py [N ...]     (default: 4 16)
       SPARK_GRAFT_STRESS_ONLY=text,vector  limits the modules run.
Prints one JSON line per (module, N) and a markdown table at the end.

The `scd2` and `kmv` modules are SYNTHETIC (no derived corpus): N is
the history BATCH COUNT — `SPARK_GRAFT_STRESS_ONLY=scd2,kmv python
tools/stress_streaming.py 16 64` reproduces the BASELINE.md 16/64-batch
rows (one-new-batch drain + raw vs folded state read).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_etl_reporting_pipeline_spark.session import get_spark  # noqa: E402
from tools.stress_scale import _SRC, BASE, OUT, build  # noqa: E402


def _segments(state: str, sub: str) -> int:
    """Live log size for one segment family: raw ``batch=`` dirs plus
    ``<sub>_compacted/upto=`` folds (what a reader actually lists)."""
    n = 0
    for d, prefix in ((os.path.join(state, sub), "batch="),
                      (os.path.join(state, f"{sub}_compacted"), "upto=")):
        if os.path.isdir(d):
            n += sum(1 for p in os.listdir(d) if p.startswith(prefix))
    return n


def _stage_batches(df, id_col: str, src: str) -> None:
    """Write df as 4 arrival files split by id quartile (ascending, so
    batch k's ids all precede batch k+1's — the monotone-id contract the
    dup_src = smallest-corpus-id assertions assume)."""
    mx = df.agg(F.max(id_col)).first()[0] + 1
    for k in range(4):
        df.filter(
            (F.col(id_col) >= k * mx / 4) & (F.col(id_col) < (k + 1) * mx / 4)
        ).coalesce(1).write.mode("append").parquet(src)


def drain_text(spark, sf_dir: str, work: str) -> dict:
    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        compact_text_index,
        incremental_text_dedup_drain,
        vacuum_text_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    src, state = os.path.join(work, "src"), os.path.join(work, "state")
    _stage_batches(docs, "doc_id", src)
    t0 = time.time()
    n = incremental_text_dedup_drain(spark, src, docs.schema, state)
    assert n == 4, n
    full = time.time() - t0

    # steady state: ONE FIXED-SIZE batch (the BASE corpus, same rows at
    # every N) onto the xN index — the flat-per-batch-cost claim. The
    # reversed-alphabet translate is NOT one of the copies' rotations,
    # so cross-batch similarity stays background noise at every N.
    base = spark.read.parquet(f"{BASE}/documents.parquet").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).first()[0] + 1

    def fixed(j: int):
        return base.select(
            (F.col("doc_id") + mx + j * 100_000_000).alias("doc_id"),
            F.translate("text", _SRC, _SRC[::-1]).alias("text"),
        )

    fixed(0).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    assert incremental_text_dedup_drain(spark, src, docs.schema, state) == 1
    steady_raw = time.time() - t0
    segs_raw = _segments(state, "sig_index")
    compact_text_index(spark, state)
    vacuum_text_index(spark, state)
    segs_folded = _segments(state, "sig_index")
    fixed(1).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    assert incremental_text_dedup_drain(spark, src, docs.schema, state) == 1
    steady_folded = time.time() - t0
    return {
        "sec": round(full, 2),
        "steady_raw_sec": round(steady_raw, 2),
        "steady_folded_sec": round(steady_folded, 2),
        "segs_raw": segs_raw,
        "segs_folded": segs_folded,
    }


def drain_funnel(spark, sf_dir: str, work: str) -> dict:
    """The curation-funnel drain's steady-batch claim (r12 — pipe02's
    x256 ladder showed the BATCH form's state-build term growing, and
    named this drain the amortized deployment shape; this module is the
    measurement behind that sentence): full drain of the xN corpus,
    then ONE FIXED-SIZE base-corpus batch (reversed-alphabet translate,
    orthogonal to every copy's rotation) onto the xN state — raw log vs
    after hash-state + annotation-lake compaction."""
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        compact_funnel_lake,
        compact_hash_state,
        incremental_funnel_drain,
        vacuum_funnel_lake,
        vacuum_hash_state,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "lang", "text"
    )
    src, state = os.path.join(work, "src"), os.path.join(work, "state")
    _stage_batches(docs, "doc_id", src)
    t0 = time.time()
    n = incremental_funnel_drain(spark, src, docs.schema, state)
    assert n == 4, n
    full = time.time() - t0

    base = spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "source", "lang", "text"
    )
    mx = docs.agg(F.max("doc_id")).first()[0] + 1

    def fixed(j: int):
        return base.select(
            (F.col("doc_id") + mx + j * 100_000_000).alias("doc_id"),
            "source", "lang",
            F.translate("text", _SRC, _SRC[::-1]).alias("text"),
        )

    fixed(0).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    assert incremental_funnel_drain(spark, src, docs.schema, state) == 1
    steady_raw = time.time() - t0
    segs_raw = _segments(state, "state_hashes")
    compact_hash_state(spark, state)
    vacuum_hash_state(spark, state)
    compact_funnel_lake(spark, state)
    vacuum_funnel_lake(spark, state)
    segs_folded = _segments(state, "state_hashes")
    fixed(1).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    assert incremental_funnel_drain(spark, src, docs.schema, state) == 1
    steady_folded = time.time() - t0
    return {
        "sec": round(full, 2),
        "steady_raw_sec": round(steady_raw, 2),
        "steady_folded_sec": round(steady_folded, 2),
        "segs_raw": segs_raw,
        "segs_folded": segs_folded,
    }


def drain_vector(spark, sf_dir: str, work: str) -> dict:
    # 48-bit bands: the grown-corpus geometry (see stress_scale.wideband)
    from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
        compact_band_index,
        incremental_vector_dedup_drain,
        vacuum_band_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    src, state = os.path.join(work, "src"), os.path.join(work, "state")
    kw = dict(threshold=0.44, n_bits=48, bands=4, seed=4242, dim=64)
    _stage_batches(emb, "vec_id", src)
    t0 = time.time()
    n = incremental_vector_dedup_drain(spark, src, emb.schema, state, **kw)
    assert n == 4, n
    full = time.time() - t0

    # fixed-size steady batch: BASE embeddings NEGATED (cosine vs every
    # copy = -cos, far below +0.44 — background candidates at every N;
    # negation is not among the copies' rotations)
    base = spark.read.parquet(f"{BASE}/embeddings.parquet").select("vec_id", "embedding")
    mx = emb.agg(F.max("vec_id")).first()[0] + 1

    def fixed(j: int):
        return base.select(
            (F.col("vec_id") + mx + j * 100_000_000).alias("vec_id"),
            F.expr("transform(embedding, x -> -x)").alias("embedding"),
        )

    fixed(0).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    assert incremental_vector_dedup_drain(spark, src, emb.schema, state, **kw) == 1
    steady_raw = time.time() - t0
    segs_raw = _segments(state, "band_index")
    compact_band_index(spark, state)
    vacuum_band_index(spark, state)
    segs_folded = _segments(state, "band_index")
    fixed(1).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    assert incremental_vector_dedup_drain(spark, src, emb.schema, state, **kw) == 1
    steady_folded = time.time() - t0
    return {
        "sec": round(full, 2),
        "steady_raw_sec": round(steady_raw, 2),
        "steady_folded_sec": round(steady_folded, 2),
        "segs_raw": segs_raw,
        "segs_folded": segs_folded,
    }


def drain_ivf(spark, sf_dir: str, work: str) -> dict:
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        compact_ivf_segments,
        incremental_ivf_ingest_drain,
        refresh_ivf_state,
        vacuum_ivf_segments,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    src, state = os.path.join(work, "src"), os.path.join(work, "state")
    _stage_batches(emb, "vec_id", src)
    t0 = time.time()
    n = incremental_ivf_ingest_drain(spark, src, emb.schema, state)
    assert n == 4, n
    full = time.time() - t0

    # fixed-size steady batch (assignment cost is content-independent)
    base = spark.read.parquet(f"{BASE}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    mx = emb.agg(F.max("vec_id")).first()[0] + 1

    def fixed(j: int):
        return base.select(
            (F.col("vec_id") + mx + j * 100_000_000).alias("vec_id"), "embedding", "label"
        )

    fixed(0).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, state) == 1
    steady_raw = time.time() - t0
    segs_raw = _segments(state, "postings")
    compact_ivf_segments(spark, state)
    vacuum_ivf_segments(spark, state)
    segs_folded = _segments(state, "postings")
    fixed(1).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, state) == 1
    steady_folded = time.time() - t0
    # the quiesced Lloyd epoch refresh over the xN postings log — the
    # index-lifecycle term the drain itself never pays
    t0 = time.time()
    refresh_ivf_state(spark, state)
    refresh_sec = time.time() - t0
    return {
        "sec": round(full, 2),
        "steady_raw_sec": round(steady_raw, 2),
        "steady_folded_sec": round(steady_folded, 2),
        "segs_raw": segs_raw,
        "segs_folded": segs_folded,
        "refresh_sec": round(refresh_sec, 2),
    }


def best3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def measure_scd2(spark, n_batches: int, work: str) -> dict:
    """The SCD2 log's scale claims, repeatable (r7 verdict ask #7):
    build ``n_batches`` of history (2000 users × 4000 versions/batch —
    the BASELINE.md ad-hoc geometry), then measure (a) draining ONE new
    micro-batch onto that history (must be FLAT in n_batches: the drain
    reads no prior state), (b) `scd2_table` over the raw segments, and
    (c) the same read after `compact_scd2_hist` (the small-files fold).
    Here ``n`` is the BATCH COUNT, not a corpus multiplier — run with
    sizes 16 64 to reproduce the BASELINE.md rows."""
    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        compact_scd2_hist,
        incremental_scd2_drain,
        scd2_table,
    )

    USERS, VPB = 2000, 4000
    src = os.path.join(work, "src")
    state = os.path.join(work, "state")

    def batch_df(b: int):
        return spark.range(VPB).select(
            (F.lit(b * VPB) + F.col("id")).alias("event_id"),
            F.timestamp_seconds(F.lit(b * VPB * 10) + F.col("id"))
            .cast("timestamp_ntz")
            .alias("ts"),
            (F.col("id") % USERS).alias("user_id"),
            F.lit("purchase").alias("event_type"),
            (F.col("id") * 0.01).alias("value"),
        )

    for b in range(n_batches):
        batch_df(b).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    incremental_scd2_drain(spark, src, schema, state)  # history build, untimed

    # (a) one NEW batch onto n_batches of history — steady-state ingest
    batch_df(n_batches).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    incremental_scd2_drain(spark, src, schema, state)
    drain_sec = time.time() - t0

    # (b) full-history read over raw per-batch segments
    read_raw = best3(lambda: scd2_table(spark, state).count())
    # (c) same read over the folded log
    compact_scd2_hist(spark, state)
    read_folded = best3(lambda: scd2_table(spark, state).count())
    return {
        "sec": round(drain_sec, 2),
        "read_raw_sec": round(read_raw, 2),
        "read_folded_sec": round(read_folded, 2),
        "versions": (n_batches + 1) * VPB,
    }


def measure_kmv(spark, n_batches: int, work: str) -> dict:
    """The streaming KMV log's scale claims (s05's module), repeatable:
    build ``n_batches`` of drained sketch state (8 groups × 50k rows/
    batch, ALL-DISTINCT keys so every group runs the estimating branch
    with saturated k-min state), then measure (a) draining ONE new
    micro-batch onto that history — must be FLAT in n_batches (keyed
    state is O(k) per group; the drain reads no segments), (b)
    `kmv_latest` over the raw per-batch segments — grows only with the
    segment COUNT (groups×batches frame), and (c) the same read after
    `compact_kmv_log`. ``n`` is the BATCH COUNT, not a corpus
    multiplier."""
    from serverless_etl_reporting_pipeline_spark.streaming.sketches import (
        compact_kmv_log,
        kmv_drain,
        kmv_latest,
    )

    GROUPS, RPB = 8, 50000
    src = os.path.join(work, "src")
    state = os.path.join(work, "state")

    def batch_df(b: int):
        return spark.range(RPB).select(
            (F.lit(b * RPB) + F.col("id")).alias("event_id"),
            (F.col("id") % GROUPS).cast("string").alias("event_type"),
            (F.lit(b * RPB) + F.col("id")).alias("user_id"),
        )

    for b in range(n_batches):
        batch_df(b).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    kmv_drain(spark, src, schema, state, "event_type", F.col("user_id"))  # untimed build

    # (a) one NEW batch onto n_batches of sketch history
    batch_df(n_batches).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    kmv_drain(spark, src, schema, state, "event_type", F.col("user_id"))
    drain_sec = time.time() - t0

    # (b) latest-state read over raw per-batch segments
    read_raw = best3(lambda: kmv_latest(spark, state).count())
    # (c) same read over the folded log
    compact_kmv_log(spark, state)
    read_folded = best3(lambda: kmv_latest(spark, state).count())
    return {
        "sec": round(drain_sec, 2),
        "read_raw_sec": round(read_raw, 2),
        "read_folded_sec": round(read_folded, 2),
        "rows_seen": (n_batches + 1) * RPB,
    }


MODULES = {"funnel": drain_funnel, "text": drain_text, "vector": drain_vector, "ivf": drain_ivf}
# synthetic modules: n means BATCH COUNT, no derived corpus is built
SYNTH_MODULES = {"scd2": measure_scd2, "kmv": measure_kmv}


def main() -> int:
    # ascending: the summary table's column headers assume it
    sizes = sorted(int(a) for a in sys.argv[1:]) or [4, 16]
    only = os.environ.get("SPARK_GRAFT_STRESS_ONLY")
    toks = [t.strip() for t in only.split(",")] if only else None
    all_mods = {**MODULES, **SYNTH_MODULES}
    selected = {m for m in all_mods if not toks or any(t and t in m for t in toks)}
    if not selected:
        print(f"SPARK_GRAFT_STRESS_ONLY={only!r} matches none of {sorted(all_mods)}")
        return 1
    spark = get_spark()
    results = []
    for n in sizes:
        sf_dir = build(spark, n) if selected & set(MODULES) else None
        for name, fn in MODULES.items():
            if name not in selected:
                continue
            work = os.path.join(OUT, f"drain_{name}_x{n}")
            shutil.rmtree(work, ignore_errors=True)
            rec = {"module": name, "xN": n, **fn(spark, sf_dir, work)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        for name, fn in SYNTH_MODULES.items():
            if name not in selected:
                continue
            work = os.path.join(OUT, f"drain_{name}_x{n}")
            shutil.rmtree(work, ignore_errors=True)
            rec = {"module": name, "xN": n, **fn(spark, n, work)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    by_m = {}
    for r in results:
        by_m.setdefault(r["module"], []).append(r)
    print("\n| module | " + " | ".join(f"x{n} drain sec" for n in sizes) + " | t(big)/t(small) |")
    print("|---|" + "---|" * (len(sizes) + 1))
    for m, rs in by_m.items():
        rs.sort(key=lambda r: r["xN"])
        print(
            f"| {m} | " + " | ".join(str(r["sec"]) for r in rs)
            + f" | {rs[-1]['sec'] / max(rs[0]['sec'], 1e-9):.1f}x |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
