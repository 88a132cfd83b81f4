"""Streaming text-dedup ingest: the t20 persisted MinHash band index
maintained as ON-DISK state by a checkpointed ``Trigger.AvailableNow``
job (SURVEY.md §2.9 — the document twin of streaming/vectors.py,
completing the stateful-ingest family: funnel, vector band index, IVF
postings, SCD2 log, and now the text MinHash index).

Each micro-batch of freshly-ingested documents is screened for
jaccard-threshold near-duplicates against the ACCUMULATED corpus index
(every prior batch's shingles + signatures), then its own index
contribution is appended as new segments. Unlike the vector twin the
stored artifact is TWO frames — t20's ``neardup_index_probe`` takes
(shingle rows, signature frame) per side — so the module keeps two
parallel segment logs that always advance in lockstep:

- ``shingle_index/batch=N/`` — distinct (doc_id, shingle) rows of
  batch N, the exact-Jaccard-verify side of the stored index.
- ``sig_index/batch=N/`` — one row per doc with the mh0..mhH-1 MinHash
  signature columns plus the shingle-set size ``n``, the LSH candidate
  side.
- ``shingle_index_compacted/upto=K/`` / ``sig_index_compacted/upto=K/``
  — optional: `compact_text_index` folds committed segments of BOTH
  logs into one ``_bid``-tagged parquet each (small-files), and
  `vacuum_text_index` reclaims the folded dirs.
- ``doc_ann/batch=N/`` — per-document annotations (doc_id, is_dup,
  dup_src): dup iff an exact jaccard ≥ threshold near-dup exists among
  STRICTLY EARLIER batches, dup_src the smallest such corpus doc_id —
  t20's per-batch contract.

A batch's shingle/signature segments are computed exactly once, ever:
the drain WRITES them first, then probes the prior index and reads its
own frames back from the just-written segments — later batches (and
the batch's own probe) pay a parquet scan, not a re-tokenize.

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
    minhash_signatures,
    neardup_index_probe,
)
from serverless_etl_reporting_pipeline_spark.streaming.state import (
    _fold_segments,
    _prior_segments,
    _read_literal,
    _vacuum_segments,
)


def _prior_index(
    spark: SparkSession, work_dir: str, batch_id: int
) -> tuple[DataFrame | None, DataFrame | None]:
    """(shingles, signatures) of the corpus accumulated STRICTLY before
    ``batch_id``: newest committed fold plus the uncompacted tail of
    each log. Both logs advance in lockstep (one drain writes both
    segments for a batch), so the two sides always describe the same
    corpus span."""
    sh = _prior_segments(
        spark,
        os.path.join(work_dir, "shingle_index"),
        os.path.join(work_dir, "shingle_index_compacted"),
        batch_id,
    )
    sigs = _prior_segments(
        spark,
        os.path.join(work_dir, "sig_index"),
        os.path.join(work_dir, "sig_index_compacted"),
        batch_id,
    )
    if (sh is None) != (sigs is None):
        # the logs advance in lockstep, so exactly one side being empty
        # means restore damage — refusing here is the loud-failure
        # discipline (_log_state, compact_text_index); silently treating
        # it as "no prior state" would annotate every doc is_dup=False
        raise RuntimeError(
            "text-index state damaged: exactly one of shingle_index/"
            f"sig_index has committed state before batch {batch_id} — "
            "restore both logs from the same snapshot before resuming"
        )
    return sh, sigs


def compact_text_index(spark: SparkSession, work_dir: str) -> int | None:
    """Fold the committed segments of BOTH index logs into one
    ``_bid``-tagged parquet each (`_fold_segments`) — the small-files
    answer for a long-running text-dedup ingest. Returns the new
    ``upto`` id (identical for both logs — they advance in lockstep;
    asserted here so a half-folded state surfaces loudly rather than
    skewing probes)."""
    u1 = _fold_segments(
        spark,
        os.path.join(work_dir, "shingle_index"),
        os.path.join(work_dir, "shingle_index_compacted"),
    )
    u2 = _fold_segments(
        spark,
        os.path.join(work_dir, "sig_index"),
        os.path.join(work_dir, "sig_index_compacted"),
    )
    if u1 != u2:
        raise RuntimeError(f"text index logs out of lockstep: shingles upto={u1}, sigs upto={u2}")
    return u1


def vacuum_text_index(spark: SparkSession, work_dir: str) -> list[int]:
    """Delete ``batch=`` dirs of both logs already folded by
    `compact_text_index` (and superseded older folds). Returns the
    deleted batch ids (the union across the two logs — normally
    identical sets)."""
    g1 = _vacuum_segments(
        spark,
        os.path.join(work_dir, "shingle_index"),
        os.path.join(work_dir, "shingle_index_compacted"),
    )
    g2 = _vacuum_segments(
        spark,
        os.path.join(work_dir, "sig_index"),
        os.path.join(work_dir, "sig_index_compacted"),
    )
    return sorted(set(g1) | set(g2))


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
    sh_dir = os.path.join(work_dir, "shingle_index")
    sig_dir = os.path.join(work_dir, "sig_index")
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

        # probe ONLY strictly-earlier state (the replayed batch's own
        # segments — or its own rows inside a compaction — are invisible)
        csh, csigs = _prior_index(s, work_dir, batch_id)
        if csh is not None and csigs is not None:
            # broadcast_snapshot: the batch is maxFilesPerTrigger-
            # bounded by this drain's contract, so every snapshot-side
            # join pins as a broadcast — without it the foreachBatch
            # plan sort-merges and SHUFFLES the whole accumulated index
            # per micro-batch (the r12 x256 find: 18 s/batch against a
            # 1.3 M-doc index vs ~1 s; AQE's runtime rescue of the
            # batch form does not fire here)
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
