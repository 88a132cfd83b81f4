"""Streaming sketches: incremental per-group KMV distinct estimation.

The batch KMV (`operators/sketch.py`) prunes each split to k minimum
hashes; the streaming form keeps that same k-min set as *keyed state*
across micro-batches (`applyInPandasWithState`), so a continuously-fed
pipeline gets an always-current distinct estimate without ever
re-scanning history — state is O(k) per group, merge is a sorted-union
truncate, and the emitted estimate is the SAME integer arithmetic as
the batch operator (asserted equal in tests/test_streaming.py).

The key hash (48-bit md5 prefix) is computed JVM-side BEFORE the
stateful group step, so the Python kernel only merges integers.

`kmv_drain` runs the stateful op as a checkpointed AvailableNow job,
landing each micro-batch's updated sketches as a ``kmv_log/batch=<id>``
segment (the shared segment-log machinery — same compaction/vacuum/
replay story as the scd2 and funnel logs); `kmv_latest` reads back the
per-group current state with one bounded groups×batches window. The
s05 registry query hash-checks the whole loop against the batch
operator's oracle restatement.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from serverless_etl_reporting_pipeline_spark.operators.sketch import HASH_SPACE, md5_hash48
from serverless_etl_reporting_pipeline_spark.streaming.state import (
    _fold_segments,
    _log_state,
    _vacuum_segments,
    ensure_state_format,
)

# Format-token prefix of the persisted KMV log (r12 ADVICE: every
# stateful drain versions its state the way the funnel does). Pins the
# xxhash64 key-hash space and the k-min merge the stored sketch rows
# assume; the drain appends its ``k`` and grouping column so sketches
# of different capacity or keying can never be silently merged. The
# ``key`` Column EXPRESSION is not capturable in a token — changing it
# re-interprets every stored hash, so treat a key change as a prefix
# bump (rebuild into a fresh work_dir).
KMV_STATE_FORMAT = "v1-xxh64-kmin"

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("k_used", T.LongType()),
        T.StructField("kth_hash", T.LongType()),
        T.StructField("est_distinct", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mins", T.ArrayType(T.LongType())),
    ]
)


def streaming_kmv_by_group(
    events: DataFrame, group_col: str, key: Column, k: int = 256
) -> DataFrame:
    """Per-group streaming KMV: emits (group_key, n_rows, k_used,
    kth_hash, est_distinct) after every micro-batch, estimates exact
    while the group has seen < k distinct keys.

    State per group is the k smallest distinct hashes plus a row count —
    bounded regardless of stream length; identical estimate formula to
    the batch `kmv_sketch_grouped`, so batch and stream agree once the
    stream has drained (equivalence asserted in tests).
    """
    hashed = events.select(
        F.col(group_col).cast("string").alias("group_key"), md5_hash48(key).alias("h")
    )

    def update(key_t, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, mins = state.get if state.exists else (0, [])
        seen = set(mins)
        for pdf in pdfs:
            n += len(pdf)
            # NULL keys hash to NULL: excluded from the k-min set but
            # still counted in n — the batch operator's documented
            # NULL treatment (kmv_sketch_grouped), mirrored so a
            # NULL-user degenerate row can't crash the kernel
            seen.update(int(h) for h in pdf["h"].dropna())
        mins = sorted(seen)[:k]
        state.update((n, mins))
        k_used = len(mins)
        kth = mins[-1] if mins else None
        est = k_used if k_used < k else (k - 1) * HASH_SPACE // kth
        yield _pd.DataFrame(
            {
                "group_key": [key_t[0]],
                "n_rows": [n],
                "k_used": [k_used],
                "kth_hash": [kth],
                "est_distinct": [est],
            }
        )

    return hashed.groupBy("group_key").applyInPandasWithState(
        update,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_drain(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    work_dir: str,
    group_col: str,
    key: Column,
    k: int = 256,
) -> int:
    """Drain all unprocessed source files through the stateful KMV, one
    micro-batch per file; each batch's UPDATED sketch rows land as a
    final ``kmv_log/batch=<id>`` segment (the scd2-style segment log —
    same idempotence argument: a segment is a pure function of the
    state-store version + batch rows, so checkpoint-recovery replay
    reproduces it). Returns the number of TRIGGERS this drain
    processed, INCLUDING empty ones — unlike `incremental_scd2_drain`,
    which counts only non-empty batches: the stateful kernel here must
    run exactly once per trigger (see write_batch), so there is no
    pre-write emptiness probe to skip on. A group's newest segment row
    IS its current sketch; `kmv_latest` assembles that view."""
    ensure_state_format(spark, work_dir, f"{KMV_STATE_FORMAT}-k{k}-g{group_col}")
    log_dir = os.path.join(work_dir, "kmv_log")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    n_batches = {"n": 0}

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        # ONE action per micro-batch: the stateful kernel must run
        # exactly once per batch (an extra probe like isEmpty() would
        # re-run the update function against the state store). An
        # empty trigger writes an empty (schema-only) segment, which
        # every reader unions harmlessly.
        n_batches["n"] += 1
        batch.write.mode("overwrite").parquet(os.path.join(log_dir, f"batch={batch_id}"))

    q = (
        streaming_kmv_by_group(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(source_dir),
            group_col,
            key,
            k=k,
        )
        .writeStream.foreachBatch(write_batch)
        # the stateful operator declares update mode; the QUERY must
        # match it even under foreachBatch (Append is the default and
        # is rejected at analysis time)
        .outputMode("update")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def kmv_latest(spark: SparkSession, work_dir: str) -> DataFrame:
    """The always-current sketch per group from a `kmv_drain` log: each
    group's LAST emission wins (update-mode semantics — every segment
    row carries the group's FULL merged state, so no cross-batch merge
    is needed at read time). One window over a groups×batches frame —
    bounded by construction, never by data volume. Groups that have
    seen only NULL keys surface with ``k_used = 0`` (estimate 0);
    callers matching the batch operator's output drop them, as
    `kmv_sketch_grouped` never emits a zero-key group. A
    drained-but-empty log (the work dir exists — a drain ran — but no
    trigger ever fired, e.g. a source dir with no files yet) reads as
    an empty sketch table; a missing work dir still raises (wrong
    path, not an empty feed) — the scd2 readers' contract."""
    from pyspark.sql import Window

    from serverless_etl_reporting_pipeline_spark.streaming.state import _fs_exists

    log_dir = os.path.join(work_dir, "kmv_log")
    tagged, _ = _log_state(spark, log_dir, log_dir + "_compacted", keep_bid=True)
    if tagged is None:
        if not _fs_exists(spark, work_dir):
            raise FileNotFoundError(f"no KMV log under {work_dir}")
        return spark.createDataFrame([], KMV_OUTPUT_SCHEMA)
    w = Window.partitionBy("group_key").orderBy(F.desc("_bid"))
    return (
        tagged.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_bid")
    )


def compact_kmv_log(spark: SparkSession, work_dir: str) -> int | None:
    """Fold committed ``kmv_log/batch=<id>`` segments into one
    ``_bid``-tagged parquet (shared `_fold_segments`) — invisible to
    `kmv_latest` by the newest-fold-plus-tail contract."""
    log_dir = os.path.join(work_dir, "kmv_log")
    return _fold_segments(spark, log_dir, log_dir + "_compacted")


def vacuum_kmv_log(spark: SparkSession, work_dir: str) -> list[int]:
    """Delete segment dirs a `compact_kmv_log` fold supersedes (shared
    `_vacuum_segments`). Returns the deleted batch ids."""
    log_dir = os.path.join(work_dir, "kmv_log")
    return _vacuum_segments(spark, log_dir, log_dir + "_compacted")
