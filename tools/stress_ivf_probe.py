"""Probe-only IVF scaling with cells ∝ n — the measurement behind
v14's scale-dial note in BASELINE.md.

The registry query v14 builds the index AND probes it in one job, so
its stress ratio is dominated by the (inherently linear, one-pass)
build; and the sf fixtures pin the cell count to the label column, so
postings-per-cell grow with the corpus. This tool measures the claim
that actually matters for a STORED index at 100 TB: with the cell
count scaled ∝ corpus size (postings/cell ≈ constant), the PROBE cost
of a query batch is flat in corpus size — it touches nprobe cells of
bounded size, never the corpus.

Cells come from a real coarse quantizer, not a random hash: the sign
bits of the first b embedding components (the RP-LSH construction
operators/vectors.py uses for banding), with b chosen per size so
cells ≈ n/125. The index (centroids + cell-partitioned postings) is
built and MATERIALIZED before the clock starts; only the
`ivf_batch_probe` of a fixed 10-query batch is timed (best-of-3).

Usage: python tools/stress_ivf_probe.py [N ...]    (default: 4 16 64)
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
    ivf_batch_probe,
    ivf_index_build,
)
from serverless_etl_reporting_pipeline_spark.session import get_spark  # noqa: E402
from tools.stress_scale import build  # noqa: E402


def main() -> int:
    sizes = sorted(int(a) for a in sys.argv[1:]) or [4, 16, 64]
    spark = get_spark()
    results = []
    for n in sizes:
        sf_dir = build(spark, n)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_vecs = emb.count()
        bits = max(4, round(math.log2(max(n_vecs, 256) / 125)))
        sign_cell = sum(
            (F.element_at("embedding", i + 1) > 0).cast("long") * (1 << i)
            for i in range(bits)
        )
        corpus = emb.filter(F.col("vec_id") >= 10).withColumn("label", sign_cell)
        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        centroids, postings = ivf_index_build(corpus)
        n_cells = centroids.count()  # forces the centroid side
        postings.count()  # forces the posting side — build is OFF the clock
        best = None
        for _ in range(3):
            t0 = time.time()
            rows = ivf_batch_probe(centroids, postings, queries, k=3, nprobe=2).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        centroids.unpersist()
        postings.unpersist()
        rec = {
            "xN": n, "n_vecs": n_vecs, "n_cells": n_cells,
            "vecs_per_cell": round(n_vecs / n_cells), "probe_sec": round(best, 2),
            "rows": rows,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print("\n| xN | vecs | cells | vecs/cell | probe sec |")
    print("|---|---|---|---|---|")
    for r in results:
        print(
            f"| x{r['xN']} | {r['n_vecs']} | {r['n_cells']} | {r['vecs_per_cell']} "
            f"| {r['probe_sec']} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
