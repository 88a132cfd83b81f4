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
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_etl_reporting_pipeline_spark.operators.text import shingles, tokens
from serverless_etl_reporting_pipeline_spark.plans.text import (
    _QF_MAX_REPETITION,
    _QF_MIN_STOPWORD_RATIO,
    _QF_MIN_TOKENS,
    _token_profile,
)

_QUALITY = (
    (F.col("n_tokens") >= _QF_MIN_TOKENS)
    & (F.col("stop") * 1.0 / F.col("n_tokens") >= _QF_MIN_STOPWORD_RATIO)
    & (F.col("mx") * 1.0 / F.col("n_tokens") <= _QF_MAX_REPETITION)
)


def _shingle_set(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", tokens("text").alias("t"))
        .select("doc_id", F.explode(shingles("t", 8)).alias("s"))
        .distinct()
    )


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
    hold_dir = os.path.join(work_dir, "state_benchmark")
    hashes_dir = os.path.join(work_dir, "state_hashes")
    ann_dir = os.path.join(work_dir, "funnel_ann")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    n_batches = {"n": 0}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        n_batches["n"] += 1
        s = batch.sparkSession
        first = not os.path.exists(hold_dir)

        ann0 = (
            batch.select("doc_id", "source", "lang", "text")
            .join(_token_profile(batch), "doc_id")
            .select("doc_id", "source", "lang", "text", _QUALITY.alias("q"))
        )
        sh = _shingle_set(batch)
        # the benchmark split is FROZEN at first ingestion: later batches
        # are pure training data and can never mutate the eval set
        ev = (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
            if first
            else F.lit(False)
        )
        if first:
            sh.filter(ev).select("s").distinct().write.mode("overwrite").parquet(hold_dir)
        hold = s.read.parquet(hold_dir)

        # keep-first dedup: first occurrence within the batch AND content
        # hash unseen in the accumulated index (batch ids are monotone, so
        # this equals union-wide keep-first); the index is corpus-scale —
        # plain keyed anti-join, never broadcast (the c08 lesson)
        hq = ann0.filter("q").select("doc_id", F.md5(F.lower("text")).alias("h"))
        firsts = hq.withColumn(
            "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
        ).filter("rn = 1")
        seen = _read_optional(s, os.path.join(hashes_dir, "batch=*"))
        if seen is not None:
            firsts = firsts.join(seen, "h", "left_anti")
        dd_ids = firsts.select("doc_id")
        # decontamination: probe the frozen benchmark index (benchmark-
        # sized — broadcastable, the t19 idiom)
        cont = sh.join(F.broadcast(hold), "s").select("doc_id").distinct()

        dd = F.coalesce(F.col("_dd"), F.lit(False))
        ann = (
            ann0.join(dd_ids.withColumn("_dd", F.lit(True)), "doc_id", "left")
            .join(cont.withColumn("_c", F.lit(True)), "doc_id", "left")
            .select(
                "doc_id", "source", "lang", "q",
                dd.alias("dd"),
                (dd & ~ev & F.col("_c").isNull()).alias("clean"),
            )
        )
        ann.write.mode("overwrite").parquet(os.path.join(ann_dir, f"batch={batch_id}"))
        hq.select("h").distinct().write.mode("overwrite").parquet(
            os.path.join(hashes_dir, f"batch={batch_id}")
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


def _read_optional(spark: SparkSession, path_glob: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path_glob)
    except Exception:  # noqa: BLE001 — no state yet (first batch)
        return None


def funnel_table(spark: SparkSession, work_dir: str) -> DataFrame:
    """The cumulative per-(source, lang) funnel over every drained batch
    — the same accounting table pipe01 reports, read from the annotated
    lake instead of recomputed from the corpus."""
    ann = spark.read.parquet(os.path.join(work_dir, "funnel_ann", "batch=*"))
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
