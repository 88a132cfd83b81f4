"""SemDeDup scaling with cluster count ∝ n — the measurement behind
v11's scale-dial note in BASELINE.md.

The registry query v11 clusters on the fixture's `label` column, whose
cardinality is FIXED (10), so its stress ratio measures the n²/10
fixed-cluster regime — pair work Σ|cluster|² grows quadratically by
construction. The dial the operator actually exposes at 100 TB is the
one SemDeDup itself prescribes (Abbas et al. 2023: k ≈ n / desired
cluster size): scale the CLUSTER COUNT with the corpus so |cluster|
stays ~constant and Σ|cluster|² ≈ n·|cluster| — linear.

This tool measures that claim directly: the derived x{N} corpora are
relabeled by a real coarse quantizer — the sign bits of the first b
embedding components (the same RP-LSH construction
tools/stress_ivf_probe.py uses), b chosen per size so clusters ≈
n/125 — and `semdedup_map` runs end-to-end (centroid build, Arrow
assignment, per-cluster BLAS pair kernel, survivor reduce) on the
relabeled frame. Expected: wall time ~linear in n at ~constant
vecs/cluster, i.e. a ≤ ~4–6× step per 4× rows once the fixed Spark
overhead amortizes, versus the super-linear fixed-cluster trend the
main harness records for v11.

Usage: python tools/stress_semdedup.py [N ...]    (default: 4 16 64)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_etl_reporting_pipeline_spark.operators.vectors import (  # noqa: E402
    semdedup_map,
)
from serverless_etl_reporting_pipeline_spark.session import get_spark  # noqa: E402
from tools.stress_scale import build  # noqa: E402


def main() -> int:
    sizes = sorted(int(a) for a in sys.argv[1:]) or [4, 16, 64]
    spark = get_spark()
    results = []
    for n in sizes:
        sf_dir = build(spark, n)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            F.col("embedding").isNotNull()
        )
        n_vecs = emb.count()
        bits = max(4, round(math.log2(max(n_vecs, 256) / 125)))
        sign_cell = sum(
            (F.element_at("embedding", i + 1) > 0).cast("long") * (1 << i)
            for i in range(bits)
        )
        corpus = emb.withColumn("label", sign_cell)
        n_clusters = corpus.select("label").distinct().count()
        best = dups = None
        for _ in range(3):
            t0 = time.time()
            dups = semdedup_map(corpus, threshold=0.44).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rec = {
            "xN": n,
            "n_vecs": n_vecs,
            "n_clusters": n_clusters,
            "vecs_per_cluster": round(n_vecs / n_clusters),
            "semdedup_sec": round(best, 2),
            "dups": dups,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print("\n| xN | vecs | clusters | vecs/cluster | semdedup sec | dups |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| x{r['xN']} | {r['n_vecs']} | {r['n_clusters']} "
            f"| {r['vecs_per_cluster']} | {r['semdedup_sec']} | {r['dups']} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
