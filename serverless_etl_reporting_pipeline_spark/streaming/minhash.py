"""Streaming text-dedup ingest: the t20 persisted MinHash band index
maintained as ON-DISK state by a checkpointed ``Trigger.AvailableNow``
job (SURVEY.md §2.9 — the document twin of streaming/vectors.py,
completing the stateful-ingest family: funnel, vector band index, IVF
postings, SCD2 log, and now the text MinHash index).

Each micro-batch of freshly-ingested documents is screened for
jaccard-threshold near-duplicates against the ACCUMULATED corpus index
(every prior batch's shingles + signatures), then its own index
contribution is appended as new segments. Unlike the vector twin the
stored artifact is THREE frames that always advance in lockstep (one
drain writes all segments for a batch):

- ``shingle_index/batch=N/`` — distinct (doc_id, s) rows of batch N,
  where ``s`` is the 64-bit xxhash64 shingle id (the v3 format — not
  the shingle string), the exact-Jaccard-verify side of the stored
  index.
- ``sig_index/batch=N/`` — one row per doc with the mh0..mhH-1 MinHash
  signature columns plus the shingle-set size ``n``, what the verify
  stage's set-size lookups read.
- ``band_fan/batch=N/`` — the PRECOMPUTED (doc_id, band, sig, _bkt)
  LSH bucket rows (`operators/minhash.band_fan`), the candidate-
  DISCOVERY side. Before r13 discovery re-derived this per probe from
  ``sig_index`` — a 64-column scan + 64 xxhash64 + a 32-struct explode
  per index doc EVERY micro-batch, the drain's one index-proportional
  term; now it is computed exactly once at ingest and probes read 3
  narrow columns, partition-pruned to the batch's own (band, bucket)
  set on the compacted span (the IVF-cells layout).
- ``*_compacted/upto=K/`` — optional: `compact_text_index` folds
  committed segments of ALL THREE logs into one ``_bid``-tagged
  parquet each (small-files) — the fan fold partitioned by
  ``(band, _bkt)`` so bounded probes directory-prune it — and
  `vacuum_text_index` reclaims the folded dirs.
- ``doc_ann/batch=N/`` — per-document annotations (doc_id, is_dup,
  dup_src): dup iff an exact jaccard ≥ threshold near-dup exists among
  STRICTLY EARLIER batches, dup_src the smallest such corpus doc_id —
  t20's per-batch contract.

A batch's shingle/signature/fan segments are computed exactly once,
ever: the drain WRITES them first, then probes the prior index and
reads its own frames back from the just-written segments — later
batches (and the batch's own probe) pay a parquet scan, not a
re-tokenize.

Idempotence follows the family discipline: every write lands under
``batch=<id>`` with overwrite, and the probe reads only strictly-
earlier state (`_prior_segments` — the row-level ``_bid`` filter keeps
that contract through compaction), so a checkpoint-recovery replay
overwrites its own segments and can never flag its documents as
duplicates of themselves.

Correctness contract (tests/test_streaming.py): with doc_ids UNIQUE
across batches (the monotone-id feed contract, same as the vector
twin), each drained batch's annotations equal
``incremental_neardup_flags(union of prior batches, batch)`` — the
operator whose DuckDB oracle pins t20 (plans/text.py:792). A re-ingest
of an existing doc_id with different text violates that precondition:
the stored index would hold one signature per (batch, doc) while the
batch operator computes one over the unioned shingles. Reference parity: this is the streaming form of
the reference's 3-hourly incremental batch
(/root/reference/pipeline/ETL/extract.py:36-57 watermark loop), with
near-dup state in place of the timestamp watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_etl_reporting_pipeline_spark.operators.minhash import (
    _shingle_sets,
    band_fan,
    minhash_signatures,
    neardup_index_probe,
)
from serverless_etl_reporting_pipeline_spark.streaming.state import (
    _fold_segments,
    _prior_segments,
    _read_literal,
    _vacuum_segments,
    ensure_state_format,
)

# Format-token PREFIX of the persisted text-dedup state (the r11-ADVICE
# guard, extended to every stateful drain per r12 ADVICE). It pins the
# code-level contracts the stored frames' MEANING depends on: the
# casefold token/shingle construction (`operators/text.py tokens`), the
# xxhash64 signature scheme, the FAN_BUCKETS=64 ``_bkt`` bucketing, and
# the three-log layout itself (v2 added the precomputed ``band_fan``
# log — a v1 two-log state probed by a v2 drain would raise the
# lockstep damage error at best, silently rebuild the fan per batch at
# worst; v3 stores the shingle log as 64-bit xxhash64 shingle ids
# instead of strings — a v2 string log joined against a v3 hashed
# batch would silently match NOTHING, flagging every doc unique).
# The drain appends its GEOMETRY PARAMETERS (hash count, bands,
# shingle width, threshold) so two runs with different knobs can never
# silently share an index. Bump the prefix whenever a shared contract
# changes meaning; state is a pure function of the feed, so a rebuild
# loses nothing.
TEXT_STATE_FORMAT = "v3-xxh64shingleids-bandfan64"

_LOGS = ("shingle_index", "sig_index", "band_fan")


def _prior_index(
    spark: SparkSession, work_dir: str, batch_id: int
) -> tuple[DataFrame | None, DataFrame | None, DataFrame | None]:
    """(shingles, signatures, band fan) of the corpus accumulated
    STRICTLY before ``batch_id``: newest committed fold plus the
    uncompacted tail of each log. All three logs advance in lockstep
    (one drain writes every segment for a batch), so the sides always
    describe the same corpus span."""
    parts = [
        _prior_segments(
            spark,
            os.path.join(work_dir, log),
            os.path.join(work_dir, f"{log}_compacted"),
            batch_id,
        )
        for log in _LOGS
    ]
    nones = [log for log, p in zip(_LOGS, parts) if p is None]
    if nones and len(nones) != len(_LOGS):
        # the logs advance in lockstep, so SOME sides being empty while
        # others have committed state means restore damage — refusing
        # here is the loud-failure discipline (_log_state,
        # compact_text_index); silently treating it as "no prior state"
        # would annotate every doc is_dup=False
        raise RuntimeError(
            f"text-index state damaged: {nones} of {list(_LOGS)} have no "
            f"committed state before batch {batch_id} while the rest do — "
            "restore all three logs from the same snapshot before resuming"
        )
    return parts[0], parts[1], parts[2]


def compact_text_index(spark: SparkSession, work_dir: str) -> int | None:
    """Fold the committed segments of ALL THREE index logs into one
    ``_bid``-tagged parquet each (`_fold_segments`) — the small-files
    answer for a long-running text-dedup ingest. The band-fan fold is
    partitioned by ``(band, _bkt)`` (the IVF-cells layout) so bounded
    probes read only the partition dirs their batch's band codes hit.
    Returns the new ``upto`` id (identical for all logs — they advance
    in lockstep; asserted here so a half-folded state surfaces loudly
    rather than skewing probes). A crash between the per-log folds is
    safe: the retry short-circuits the already-folded log(s) and folds
    the rest to the same ``upto`` (pinned by
    tests/test_streaming.py::test_streaming_text_index_torn_compaction),
    and drains in between read newest-fold-plus-tail per log, which
    spans the same rows either way."""
    uptos = [
        _fold_segments(
            spark,
            os.path.join(work_dir, log),
            os.path.join(work_dir, f"{log}_compacted"),
            partition_by=["band", "_bkt"] if log == "band_fan" else None,
        )
        for log in _LOGS
    ]
    if len(set(uptos)) != 1:
        raise RuntimeError(
            f"text index logs out of lockstep: {dict(zip(_LOGS, uptos))}"
        )
    return uptos[0]


def vacuum_text_index(spark: SparkSession, work_dir: str) -> list[int]:
    """Delete ``batch=`` dirs of all three logs already folded by
    `compact_text_index` (and superseded older folds). Returns the
    deleted batch ids (the union across the logs — normally identical
    sets)."""
    gone: set[int] = set()
    for log in _LOGS:
        gone |= set(
            _vacuum_segments(
                spark,
                os.path.join(work_dir, log),
                os.path.join(work_dir, f"{log}_compacted"),
            )
        )
    return sorted(gone)


def incremental_text_dedup_drain(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    work_dir: str,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Drain all unprocessed document files, one micro-batch per file,
    updating the on-disk MinHash index under ``work_dir``. Returns the
    number of micro-batches processed this drain."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rpb = num_hashes // bands
    ensure_state_format(
        spark,
        work_dir,
        f"{TEXT_STATE_FORMAT}-h{num_hashes}-b{bands}-k{shingle_k}-j{jaccard_threshold}",
    )
    sh_dir = os.path.join(work_dir, "shingle_index")
    sig_dir = os.path.join(work_dir, "sig_index")
    fan_dir = os.path.join(work_dir, "band_fan")
    ann_dir = os.path.join(work_dir, "doc_ann")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    n_batches = {"n": 0}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        n_batches["n"] += 1
        s = batch.sparkSession
        # normalize the id up front so every artifact (segments, ann,
        # dup_src = min over corpus ids) carries ONE parquet type across
        # batches regardless of the source schema's integer width
        batch = batch.withColumn(id_col, F.col(id_col).cast("long"))
        # write this batch's index contribution FIRST (overwrite ⇒
        # replay-idempotent), then read it back: the tokenize→shingle→
        # 64-hash aggregate runs once, ever — the probe and every later
        # batch pay a parquet scan instead
        ssh = _shingle_sets(batch, id_col, text_col, shingle_k)
        ssh.write.mode("overwrite").parquet(os.path.join(sh_dir, f"batch={batch_id}"))
        ssh = _read_literal(s, os.path.join(sh_dir, f"batch={batch_id}"))
        ssigs = minhash_signatures(ssh, id_col, num_hashes)
        ssigs.write.mode("overwrite").parquet(os.path.join(sig_dir, f"batch={batch_id}"))
        ssigs = _read_literal(s, os.path.join(sig_dir, f"batch={batch_id}"))
        # the batch's own discovery fan, computed from the read-back
        # signatures exactly once — future probes read these 3 narrow
        # columns instead of re-deriving band codes from sig_index
        band_fan(ssigs, id_col, bands, rpb).write.mode("overwrite").parquet(
            os.path.join(fan_dir, f"batch={batch_id}")
        )

        # probe ONLY strictly-earlier state (the replayed batch's own
        # segments — or its own rows inside a compaction — are invisible)
        csh, csigs, cfan = _prior_index(s, work_dir, batch_id)
        if csh is not None and csigs is not None:
            # broadcast_snapshot: the batch is maxFilesPerTrigger-
            # bounded by this drain's contract, so every snapshot-side
            # join pins as a broadcast — without it the foreachBatch
            # plan sort-merges and SHUFFLES the whole accumulated index
            # per micro-batch (the r12 x256 find: 18 s/batch against a
            # 1.3 M-doc index vs ~1 s; AQE's runtime rescue of the
            # batch form does not fire here). index_fan: the stored
            # discovery fan (r13 — see module docstring).
            ann = neardup_index_probe(
                csh,
                csigs,
                ssh,
                ssigs,
                id_col,
                jaccard_threshold,
                bands,
                rpb,
                snapshot_ids=batch,
                broadcast_snapshot=True,
                index_fan=cfan,
            )
        else:
            ann = batch.select(
                F.col(id_col),
                F.lit(False).alias("is_dup"),
                F.lit(None).cast("long").alias("dup_src"),
            )
        ann.write.mode("overwrite").parquet(os.path.join(ann_dir, f"batch={batch_id}"))

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
