"""Streaming curation capstone: the pipe01/pipe02 funnel as a
checkpointed ``Trigger.AvailableNow`` incremental job (SURVEY.md §2.9).

Each micro-batch of newly-arrived documents is annotated against
PERSISTENT on-disk state — the accumulated quality-doc hash index
(keep-first dedup), the benchmark shingle index frozen from the first
batch (decontamination) — and appended to an annotated funnel lake;
the mixture draw then reads cumulative clean counts from that lake.
This is the streaming mirror of pipe02's in-session persisted state,
and the principled generalization of the reference's cron+last_run.txt
loop (`pipeline/ETL/extract.py:36-81`): progress is a transactional
checkpoint, not an event-time string file.

Correctness contract (asserted by tests/test_streaming.py): on an
append-only corpus with monotone doc ids across batches — exactly what
a watermark extract produces — draining N micro-batches yields the SAME
per-document (q, dd, clean) annotations as one batch run over the
union with the benchmark frozen at the first snapshot.

Idempotence: every state/lake write lands in a ``batch=<id>`` subdir
with mode=overwrite, so a replayed micro-batch (checkpoint recovery)
overwrites its own output instead of duplicating it.

State lifecycle: the shared segment-log machinery in
`streaming/state.py` (`_fold_segments` / `_prior_segments` /
`_vacuum_segments`, also used by streaming/vectors.py, streaming/ivf.py,
and streaming/scd2.py) — segments accumulate per batch → a compaction
folds them into one ``_bid``-tagged parquet (small-files) → a vacuum
deletes the folded dirs (retention). Every reader sees
newest-fold-plus-newer-tail, so both maintenance steps are invisible
to drains, reports, and replays.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_etl_reporting_pipeline_spark.operators.funnel import (
    PIPE2_BUDGET,
    annotate_batch,
    eval_split,
    mixture_report,
    shingle_set,
)
from serverless_etl_reporting_pipeline_spark.streaming.state import (
    _batch_dirs,
    _fold_segments,
    _fs_touch,
    _log_state,
    _prior_segments,
    _read_literal,
    _vacuum_segments,
    ensure_state_format,
)

# Hash-space version of the persisted funnel state. v1 (unversioned,
# pre-r12 marker) keyed exact dedup by md5(lower(text)); v2 was
# md5(casefold(text)) (the r11 casefold contract); v3 stored xxhash64
# shingle ids; v4 keys exact dedup by xxhash64(casefold(text))
# (operators/funnel.quality_hash, the r14 narrow-key change — ``h`` in
# state_hashes is now BIGINT, not a 32-hex string). A pre-v4
# seen-hashes index consulted by a v4 drain would never match any new
# hash (different hash space AND different column type), silently
# re-admitting every previously-seen doc — `ensure_state_format` turns
# that into a loud rebuild instruction instead (r11 ADVICE). Bump this
# token whenever quality_hash, eval_split, or the shingle construction
# changes meaning.
FUNNEL_STATE_FORMAT = "v4-xxh64-casefold-xxh64shingles"



def _frozen_at(spark: SparkSession, hold_dir: str) -> int | None:
    """The batch id that froze the benchmark, from the ``FROZEN_AT=<id>``
    provenance marker in the sibling ``state_benchmark_meta/`` dir (a
    sibling, not inside the index — Spark's partition discovery would
    try to parse an ``=``-named file inside the parquet dir) — None when
    the freeze never completed. The marker (touched AFTER the parquet
    commit) is what lets a checkpoint-recovery REPLAY of the freezer
    batch know it is the freezer: without it the replay would see the
    committed index, treat itself as a post-freeze batch, and annotate
    every benchmark member ev=False — overwriting the original
    attempt's annotations with different ones, breaking replay
    idempotence."""
    ids = [i for i, _ in _batch_dirs(spark, hold_dir + "_meta", "FROZEN_AT=")]
    return ids[-1] if ids else None


def incremental_funnel_drain(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    work_dir: str,
) -> int:
    """Drain all unprocessed document files through the curation funnel,
    one micro-batch per file, updating on-disk state under ``work_dir``:

    - ``state_benchmark/`` — the frozen benchmark shingle index (written
      once, from the md5-prefix eval split of the FIRST batch);
    - ``state_hashes/batch=N/`` — accumulated quality-doc content hashes;
    - ``funnel_ann/batch=N/`` — per-document funnel annotations
      (doc_id, source, lang, q, dd, clean).

    Returns the number of micro-batches processed this drain.
    """
    ensure_state_format(spark, work_dir, FUNNEL_STATE_FORMAT)
    hold_dir = os.path.join(work_dir, "state_benchmark")
    hashes_dir = os.path.join(work_dir, "state_hashes")
    ann_dir = os.path.join(work_dir, "funnel_ann")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    n_batches = {"n": 0}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        # persist + count ONCE: the batch frame feeds three subtrees
        # (shingle set, token profile, annotation projection), each of
        # which would otherwise re-scan the arrival file, and the count
        # doubles as the emptiness check AND the bounded_batch gate
        # measurement (r12 ADVICE: the gate ran its own uncached action)
        batch = batch.persist()
        n_rows = batch.count()
        if n_rows == 0:
            batch.unpersist()
            return
        n_batches["n"] += 1
        s = batch.sparkSession
        # "this batch is the freezer" is decided by the PROVENANCE marker
        # (FROZEN_AT=<id>, touched after the parquet commit), not by the
        # index's existence: a checkpoint-recovery replay of the freezer
        # batch finds its own committed index but must still treat itself
        # as the freezer — same md5-split ev, bit-identical annotations —
        # or it would overwrite ev=True rows with ev=False ones. A crash
        # anywhere in the freeze (partial parquet / committed parquet but
        # no marker) leaves frozen=None and the replay redoes both steps
        # idempotently.
        frozen = _frozen_at(s, hold_dir)
        first = frozen is None or frozen == batch_id

        # persisted: feeds the benchmark write (first batch) AND the
        # annotation subtree below — shingle_set's own t19 discipline
        sh = shingle_set(batch).persist()
        try:
            # the benchmark split is FROZEN at first ingestion: later
            # batches are pure training data and can never mutate the
            # eval set (eval_split — THE shared pipe01/pipe02 predicate)
            ev = eval_split() if first else F.lit(False)
            if frozen is None:
                sh.filter(ev).select("s").distinct().write.mode("overwrite").parquet(
                    hold_dir
                )
                _fs_touch(s, os.path.join(hold_dir + "_meta", f"FROZEN_AT={batch_id}"))
            hold = _read_literal(s, hold_dir)

            # the shared funnel stage (operators/funnel.py): keep-first
            # dedup against the accumulated hash index (batch ids are
            # monotone so this equals union-wide keep-first) +
            # decontamination against the frozen benchmark. Join
            # strategy for the hash index: bounded_batch — the
            # micro-batch is maxFilesPerTrigger-bounded, so when the
            # measured batch count confirms it the keep-first anti-join
            # runs SCAN-ONLY against the corpus-scale index (semi-join
            # the index down to batch hashes, broadcast-anti against
            # the ≤batch-sized matched set — the r12 bounded-probe
            # pattern); an oversized batch falls back to the plain
            # keyed anti-join, which shuffles the index but never
            # broadcasts it (the c08 lesson).
            seen = _prior_hash_state(s, hashes_dir, batch_id)
            # persisted: the frame feeds TWO write actions (annotation
            # lake + hash state) — without it the profile/window/
            # anti-join/shingle subtree executes twice per micro-batch
            ann = annotate_batch(
                batch, hold, seen_hashes=seen, ev=ev, shingle_frame=sh,
                bounded_batch=True, batch_count=n_rows,
            ).persist()
            try:
                ann.select("doc_id", "source", "lang", "q", "dd", "clean").write.mode(
                    "overwrite"
                ).parquet(os.path.join(ann_dir, f"batch={batch_id}"))
                ann.filter("q").select("h").distinct().write.mode("overwrite").parquet(
                    os.path.join(hashes_dir, f"batch={batch_id}")
                )
            finally:
                ann.unpersist()
        finally:
            sh.unpersist()
            batch.unpersist()

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


def _prior_hash_state(spark: SparkSession, hashes_dir: str, batch_id: int) -> DataFrame | None:
    """Hash-index state from batches STRICTLY before ``batch_id``.

    A replayed micro-batch (checkpoint recovery after a mid-batch crash)
    may find its OWN ``batch=<id>`` dir already written by the failed
    attempt; reading it back would anti-join the batch's quality docs
    away against their own hashes, flipping dd/clean to False for the
    whole batch and breaking the overwrite-idempotence contract. Only
    strictly-earlier state is visible — whether it still sits in
    per-batch dirs or was folded by `compact_hash_state` (the row-level
    ``_bid`` filter, see `_fold_segments`). Missing state (first batch)
    returns None; any OTHER read error propagates — a corrupt
    half-written state dir must fail the drain, not silently disable
    cross-batch dedup.
    """
    return _prior_segments(spark, hashes_dir, hashes_dir + "_compacted", batch_id)


def compact_funnel_lake(spark: SparkSession, work_dir: str) -> int | None:
    """Fold the annotated funnel lake's ``batch=<id>`` dirs into one
    ``_bid``-tagged parquet (`_fold_segments`) — the lake is re-read in
    full by every mixture report / funnel table, so at streaming rates
    it is the module's biggest small-files surface. Safe under replay:
    a replayed micro-batch's annotations are bit-identical by the
    module's idempotence contract, so a stale folded copy and the
    re-written segment agree row-for-row."""
    ann_dir = os.path.join(work_dir, "funnel_ann")
    return _fold_segments(spark, ann_dir, ann_dir + "_compacted")


def _lake(
    spark: SparkSession, work_dir: str, keep_bid: bool = False
) -> tuple[DataFrame, int]:
    """The FULL annotation lake (newest committed compaction plus the
    committed segment tail) and its tip batch id — `_log_state`, so an
    in-flight or crashed drain's partial segment above the tip never
    leaks into a report."""
    ann_dir = os.path.join(work_dir, "funnel_ann")
    ann, tip = _log_state(spark, ann_dir, ann_dir + "_compacted", keep_bid)
    if ann is None:
        raise FileNotFoundError(f"no annotation lake under {work_dir}")
    return ann, tip


def vacuum_funnel_lake(spark: SparkSession, work_dir: str) -> list[int]:
    """Delete funnel-lake ``batch=`` dirs already folded by
    `compact_funnel_lake` (and superseded older folds). Returns the
    deleted batch ids; see `_vacuum_segments` for the safety argument."""
    ann_dir = os.path.join(work_dir, "funnel_ann")
    return _vacuum_segments(spark, ann_dir, ann_dir + "_compacted")


def vacuum_hash_state(spark: SparkSession, work_dir: str) -> list[int]:
    """Delete hash-state ``batch=`` dirs already folded by
    `compact_hash_state` (and superseded older folds). Returns the
    deleted batch ids; see `_vacuum_segments` for the safety argument."""
    hashes_dir = os.path.join(work_dir, "state_hashes")
    return _vacuum_segments(spark, hashes_dir, hashes_dir + "_compacted")


def compact_hash_state(spark: SparkSession, work_dir: str) -> int | None:
    """Fold the accumulated ``state_hashes/batch=<id>`` dirs into one
    ``_bid``-tagged parquet (`_fold_segments`) — at streaming rates the
    hash index otherwise becomes thousands of tiny files, each listed
    and opened by every micro-batch's anti-join. Returns the folded
    standing fold's ``upto`` id — the new one when fresh segments were
    folded, the existing one on an idempotent no-op re-run — or None
    when no state exists at all; `_prior_hash_state` reads
    compaction + tail transparently."""
    hashes_dir = os.path.join(work_dir, "state_hashes")
    return _fold_segments(spark, hashes_dir, hashes_dir + "_compacted")


def incremental_mixture_report(
    spark: SparkSession, work_dir: str, budget: int = PIPE2_BUDGET
) -> DataFrame:
    """pipe02's full per-domain report computed PURELY from streamed
    state — the mixture-draw stage that completes batch≡streaming parity
    of the WHOLE curation pipeline (quality → dedup → decontamination →
    temperature-mixture draw):

    - cumulative per-domain clean counts come from the annotated funnel
      lake (every drained batch), never a corpus rescan;
    - a fresh largest-remainder apportionment over those counts
      (`_mixture_targets_from_counts`, the pipe02/c10 kernel);
    - the selection is drawn from the LATEST batch's clean docs with the
      same md5-uniform rule, so each micro-batch's draw is exactly what
      pipe02 computes for that delta.

    Returns the pipe02 schema: (source, lang, n_raw, n_quality,
    n_dedup, n_clean, cum_clean, target_docs, n_selected) for the
    latest batch. Scale shape: the lake aggregate is count-sized, the
    target frame is domain-sized (broadcast), the draw is a map-side
    filter over the latest batch only.
    """
    from serverless_etl_reporting_pipeline_spark.plans.curation import (
        _mixture_targets_from_counts,
    )

    # the lake read and the latest-COMMITTED-batch id come from ONE
    # `_log_state` pass (a single round of directory listings, never a
    # data scan); the _bid tags key the latest batch's rows, so the
    # report survives the latest segment dir being vacuumed after a
    # fold, and a crashed drain's partial segment above the tip is
    # invisible rather than silently reported as the latest batch
    tagged, latest = _lake(spark, work_dir, keep_bid=True)
    ann_all = tagged.drop("_bid")
    ann_latest = tagged.filter(F.col("_bid") == latest).drop("_bid")

    cum_dom = (
        ann_all.filter("clean")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    tgt = _mixture_targets_from_counts(cum_dom, budget=budget).select(
        "source", "lang", "n_docs", "target_docs"
    )
    # the SAME draw + report pipe02 uses (operators/funnel.py
    # mixture_report) — shared by construction, so the batch≡streaming
    # equality test can only break on state handling, never on a
    # diverging reimplementation of the draw
    return mixture_report(ann_latest, tgt, with_cum=True)


def funnel_table(spark: SparkSession, work_dir: str) -> DataFrame:
    """The cumulative per-(source, lang) funnel over every drained batch
    — the same accounting table pipe01 reports, read from the annotated
    lake instead of recomputed from the corpus."""
    ann, _ = _lake(spark, work_dir)
    return (
        ann.groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_raw"),
            F.sum(F.when(F.col("q"), 1).otherwise(0)).cast("bigint").alias("n_quality"),
            F.sum(F.when(F.col("dd"), 1).otherwise(0)).cast("bigint").alias("n_dedup"),
            F.sum(F.when(F.col("clean"), 1).otherwise(0)).cast("bigint").alias("n_clean"),
        )
        .orderBy("source", "lang")
    )
