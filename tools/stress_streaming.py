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
from tools.stress_scale import OUT, build  # noqa: E402


def _stage_batches(df, id_col: str, src: str) -> None:
    """Write df as 4 arrival files split by id quartile (ascending, so
    batch k's ids all precede batch k+1's — the monotone-id contract the
    dup_src = smallest-corpus-id assertions assume)."""
    mx = df.agg(F.max(id_col)).first()[0] + 1
    for k in range(4):
        df.filter(
            (F.col(id_col) >= k * mx / 4) & (F.col(id_col) < (k + 1) * mx / 4)
        ).coalesce(1).write.mode("append").parquet(src)


def drain_text(spark, sf_dir: str, work: str) -> float:
    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        incremental_text_dedup_drain,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    src = os.path.join(work, "src")
    _stage_batches(docs, "doc_id", src)
    t0 = time.time()
    n = incremental_text_dedup_drain(spark, src, docs.schema, os.path.join(work, "state"))
    assert n == 4, n
    return time.time() - t0


def drain_vector(spark, sf_dir: str, work: str) -> float:
    # 48-bit bands: the grown-corpus geometry (see stress_scale.wideband)
    from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
        incremental_vector_dedup_drain,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    src = os.path.join(work, "src")
    _stage_batches(emb, "vec_id", src)
    t0 = time.time()
    n = incremental_vector_dedup_drain(
        spark, src, emb.schema, os.path.join(work, "state"),
        threshold=0.44, n_bits=48, bands=4, seed=4242,
    )
    assert n == 4, n
    return time.time() - t0


def drain_ivf(spark, sf_dir: str, work: str) -> float:
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        incremental_ivf_ingest_drain,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    src = os.path.join(work, "src")
    _stage_batches(emb, "vec_id", src)
    t0 = time.time()
    n = incremental_ivf_ingest_drain(spark, src, emb.schema, os.path.join(work, "state"))
    assert n == 4, n
    return time.time() - t0


MODULES = {"text": drain_text, "vector": drain_vector, "ivf": drain_ivf}


def main() -> int:
    # ascending: the summary table's column headers assume it
    sizes = sorted(int(a) for a in sys.argv[1:]) or [4, 16]
    only = os.environ.get("SPARK_GRAFT_STRESS_ONLY")
    toks = [t.strip() for t in only.split(",")] if only else None
    selected = {m for m in MODULES if not toks or any(t and t in m for t in toks)}
    if not selected:
        print(f"SPARK_GRAFT_STRESS_ONLY={only!r} matches none of {sorted(MODULES)}")
        return 1
    spark = get_spark()
    results = []
    for n in sizes:
        sf_dir = build(spark, n)
        for name, fn in MODULES.items():
            if name not in selected:
                continue
            work = os.path.join(OUT, f"drain_{name}_x{n}")
            shutil.rmtree(work, ignore_errors=True)
            sec = fn(spark, sf_dir, work)
            rec = {"module": name, "xN": n, "sec": round(sec, 2)}
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
