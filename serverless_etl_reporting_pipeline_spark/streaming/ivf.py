"""Streaming IVF ingest: the v14 persisted retrieval index maintained
as ON-DISK state by a checkpointed ``Trigger.AvailableNow`` job — the
SEARCH twin of streaming/vectors.py (which grows the DEDUP band index).
Reference parity: the reference has no vector story at all; this is
the §2.11 extension surface operated the way its incremental extract
(`pipeline/ETL/extract.py:77`) operates relational state — arrivals
land against a persisted snapshot, never a rebuild.

On-disk layout under ``work_dir``:

- ``centroids/`` — the coarse quantizer, FROZEN at first ingestion:
  exact-integer cell centroids of batch 0 (`ivf_centroids`, the v05
  quantizer — no k-means RNG). Later batches never mutate it: index
  refresh (re-training the quantizer) is a rebuild policy OUTSIDE the
  ingest path, exactly like the funnel's frozen benchmark split.
- ``postings/batch=N/`` — one posting segment per drained batch:
  batch N's vectors filed to their nearest frozen centroid
  (`assign_cells` — map-only Arrow pass, the centroid table the only
  broadcast; no shuffle, no corpus access, any arrival rate).
- ``postings_compacted/upto=K/`` — optional: `compact_ivf_segments`
  folds every segment with id ≤ K into ONE cell-partitioned parquet
  (the `ivf_index_write` layout, so probes dynamic-partition-prune to
  the buckets they hit) — the small-files answer at streaming rates.
  Folded ``batch=`` segments are RETAINED (loaders ignore ids ≤ K);
  garbage collection is a retention policy, not an ingest concern.

Idempotence (the funnel module's discipline): every write lands under
``batch=<id>`` / ``upto=<id>`` with overwrite; the frozen-centroid
write is guarded by its ``_SUCCESS`` marker, and a replayed batch 0
would regenerate byte-identical centroids anyway (exact integer
aggregation of the same rows). A replayed micro-batch therefore
overwrites its own posting segment and leaves all other state alone.

Correctness contract (tests/test_streaming.py): after any drain /
compaction interleaving, `load_ivf_state` postings equal
``assign_cells(frozen centroids, union of all ingested batches)``
row-for-row — and therefore `ivf_batch_probe` over the streamed index
equals the batch-built probe (v14's oracle-pinned kernel) for any
query batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_etl_reporting_pipeline_spark.operators.vectors import (
    assign_cells,
    ivf_centroids,
)
from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
    _batch_dirs,
    _fs_exists,
)


def incremental_ivf_ingest_drain(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    work_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> int:
    """Drain all unprocessed embedding files, one micro-batch per file,
    growing the on-disk IVF index under ``work_dir``. Returns the
    number of micro-batches processed this drain."""
    cent_dir = os.path.join(work_dir, "centroids")
    post_dir = os.path.join(work_dir, "postings")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    n_batches = {"n": 0}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        n_batches["n"] += 1
        s = batch.sparkSession
        # quantizer FROZEN at first ingestion (the _SUCCESS guard can
        # only be absent during batch 0 or its checkpoint replay, and a
        # replay regenerates identical exact-integer centroids)
        if not _fs_exists(s, os.path.join(cent_dir, "_SUCCESS")):
            ivf_centroids(batch, vec_col, cell_col).write.mode("overwrite").parquet(
                cent_dir
            )
        cent = s.read.parquet(cent_dir)
        assign_cells(cent, batch, id_col, vec_col).write.mode("overwrite").parquet(
            os.path.join(post_dir, f"batch={batch_id}")
        )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def compact_ivf_segments(spark: SparkSession, work_dir: str) -> int | None:
    """Fold every ``postings/batch=<id>`` segment into ONE
    cell-partitioned parquet under ``postings_compacted/upto=<max id>``
    (superseding earlier compactions — `load_ivf_state` reads only the
    newest). One shuffle-free write re-bucketed by directory; after it,
    probes of the compacted span read exactly the cell directories
    they hit instead of every tiny segment file. Returns the new
    ``upto`` id, or None when there are no segments to fold."""
    segs = _batch_dirs(spark, os.path.join(work_dir, "postings"))
    if not segs:
        return None
    upto = max(bid for bid, _ in segs)
    df = spark.read.parquet(*[uri for _, uri in segs])
    df.write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(work_dir, "postings_compacted", f"upto={upto}")
    )
    return upto


def load_ivf_state(spark: SparkSession, work_dir: str) -> tuple[DataFrame, DataFrame]:
    """Load the streamed IVF index for probing: the frozen centroid
    table plus postings = newest compaction (ids ≤ K, cell-partitioned,
    partition-pruned by probes) unioned with the uncompacted segment
    tail (ids > K). Feed straight into `ivf_batch_probe`."""
    cent = spark.read.parquet(os.path.join(work_dir, "centroids"))
    comps = _batch_dirs(spark, os.path.join(work_dir, "postings_compacted"), "upto=")
    upto = comps[-1][0] if comps else -1
    parts = []
    if comps:
        parts.append(
            spark.read.parquet(comps[-1][1]).select(
                F.col("_cell").cast("long").alias("_cell"), "_id", "_qv"
            )
        )
    for bid, uri in _batch_dirs(spark, os.path.join(work_dir, "postings")):
        if bid > upto:
            parts.append(
                spark.read.parquet(uri).select(
                    F.col("_cell").cast("long").alias("_cell"), "_id", "_qv"
                )
            )
    if not parts:
        raise FileNotFoundError(f"no posting state under {work_dir}")
    postings = parts[0]
    for p in parts[1:]:
        postings = postings.unionByName(p)
    return cent, postings
