"""Streaming vector-dedup ingest: the v12 persisted band-code index
maintained as ON-DISK state by a checkpointed ``Trigger.AvailableNow``
job (SURVEY.md §2.9 — the embedding twin of streaming/funnel.py).

Each micro-batch of freshly-arrived vectors is screened for near-
duplicates against the ACCUMULATED index (band codes of every prior
batch), then its own band fan is appended as a new index segment:

- ``band_index/batch=N/`` — the stored index: one (_band, _code, id,
  vector) fan segment per drained batch. A batch's fan is computed
  exactly once, ever — later batches probe it from disk.
- ``band_index_compacted/upto=K/`` — optional: `compact_band_index`
  folds committed segments into ONE parquet with a row-level origin
  batch id (``_bid``), so probes read one file set instead of K tiny
  segments while replays keep their strictly-earlier exclusion.
- ``vec_ann/batch=N/`` — per-vector annotations (vec_id, is_dup,
  dup_src, cos): dup iff a cosine >= threshold near-dup exists among
  STRICTLY EARLIER batches, dup_src the smallest such id (v12's
  contract per batch).

Idempotence follows the funnel module's discipline: every write lands
under ``batch=<id>`` with overwrite, and state reads enumerate only
strictly-earlier batch dirs — a replayed micro-batch overwrites its own
output and can never probe its own half-written segment.

Correctness contract (tests/test_streaming.py): with monotone vec_ids
across batches, each drained batch's annotations equal
``neardup_vector_index_probe(union of prior batches, batch)`` — the
operator v12's DuckDB oracle pins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_etl_reporting_pipeline_spark.operators.vectors import (
    _band_code_fan,
    _dim_of,
    probe_band_index,
    random_hyperplanes,
)
from serverless_etl_reporting_pipeline_spark.streaming.state import (
    _fold_segments,
    _prior_segments,
    _vacuum_segments,
    ensure_state_format,
)

# Format-token prefix of the persisted vector-dedup state (r12 ADVICE:
# every stateful drain versions its state the way the funnel does). It
# pins the sign-LSH scheme the stored fan's meaning depends on — the
# `random_hyperplanes` LCG construction, the 1e-6 component
# quantization, the (_band, _code) fan layout; the drain appends its
# geometry parameters (bit count, bands, seed, threshold) so two runs
# with different knobs can never silently share an index. Bump the
# prefix when the shared operators change meaning (state is a pure
# function of the feed — a rebuild loses nothing).
VECTOR_STATE_FORMAT = "v1-signlsh-q1e6"


def _prior_fan(spark: SparkSession, work_dir: str, batch_id: int) -> DataFrame | None:
    """Corpus band fan from batches STRICTLY before ``batch_id``: the
    newest committed compaction plus the uncompacted segment tail
    (`_prior_segments` — the row-level ``_bid`` filter keeps the
    strictly-earlier contract through compaction)."""
    return _prior_segments(
        spark,
        os.path.join(work_dir, "band_index"),
        os.path.join(work_dir, "band_index_compacted"),
        batch_id,
    )


def compact_band_index(spark: SparkSession, work_dir: str) -> int | None:
    """Fold every committed ``band_index/batch=<id>`` segment into ONE
    ``_bid``-tagged parquet under ``band_index_compacted/upto=<max id>``
    (`_fold_segments`) — the small-files answer for a long-running
    dedup ingest, mirroring `compact_ivf_segments` and
    `compact_hash_state`. Probes keep their strictly-earlier reads
    through the row-level tag (see `_prior_fan`)."""
    return _fold_segments(
        spark,
        os.path.join(work_dir, "band_index"),
        os.path.join(work_dir, "band_index_compacted"),
    )


def vacuum_band_index(spark: SparkSession, work_dir: str) -> list[int]:
    """Delete band-index ``batch=`` dirs already folded by
    `compact_band_index` (and superseded older folds). Returns the
    deleted batch ids; see `_vacuum_segments` for the safety argument."""
    return _vacuum_segments(
        spark,
        os.path.join(work_dir, "band_index"),
        os.path.join(work_dir, "band_index_compacted"),
    )


def incremental_vector_dedup_drain(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    work_dir: str,
    threshold: float = 0.44,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 4242,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> int:
    """Drain all unprocessed embedding files, one micro-batch per file,
    updating the on-disk band index under ``work_dir``. Returns the
    number of micro-batches processed this drain.

    ``dim`` pins the corpus dimension for the hyperplane codes; when
    absent each micro-batch infers it with a modal `_dim_of` aggregate
    (one extra tiny driver job per batch — fine for a fixture drain,
    pass ``dim`` explicitly for a long-running deployment)."""
    if n_bits % bands:
        raise ValueError("n_bits must be divisible by bands")
    rpb = n_bits // bands
    ensure_state_format(
        spark,
        work_dir,
        f"{VECTOR_STATE_FORMAT}-n{n_bits}-b{bands}-s{seed}-t{threshold}",
    )
    index_dir = os.path.join(work_dir, "band_index")
    ann_dir = os.path.join(work_dir, "vec_ann")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    n_batches = {"n": 0}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        n_batches["n"] += 1
        s = batch.sparkSession
        import numpy as np

        d = dim if dim is not None else _dim_of(batch, vec_col)
        P = np.array(random_hyperplanes(n_bits, d, seed), dtype=np.float64)
        # probe ONLY strictly-earlier state (replay idempotence: a
        # failed prior attempt's own batch=<id> segment — or its own
        # rows inside a compaction — is invisible)
        corpus_fan = _prior_fan(s, work_dir, batch_id)
        if corpus_fan is not None:
            # bounded_snapshot: the batch is maxFilesPerTrigger-bounded,
            # so the stored fan is semi-joined down to the batch's band
            # codes instead of being SHUFFLED whole into the bucket
            # kernel every micro-batch (the r12 x256 find — see
            # probe_band_index's contract note)
            ann = probe_band_index(
                corpus_fan, batch, P, bands, rpb, threshold, id_col, vec_col,
                bounded_snapshot=True,
            )
        else:
            ann = batch.select(
                F.col(id_col).cast("long").alias(id_col),
                F.lit(False).alias("is_dup"),
                F.lit(None).cast("long").alias("dup_src"),
                F.lit(None).cast("double").alias("cos"),
            )
        ann.write.mode("overwrite").parquet(os.path.join(ann_dir, f"batch={batch_id}"))
        # append this batch's fan as a new index segment — computed once,
        # ever; future batches read it from disk
        _band_code_fan(batch, P, bands, rpb, id_col, vec_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, f"batch={batch_id}"))

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
