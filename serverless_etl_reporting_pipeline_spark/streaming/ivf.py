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
  quantizer — no k-means RNG). Drained batches never mutate it —
  re-training happens only through the explicit quiesced
  `refresh_ivf_state` epoch swap below, exactly like the funnel's
  frozen benchmark split.
- ``postings/batch=N/`` — one posting segment per drained batch:
  batch N's vectors filed to their nearest CURRENT centroid (newest
  committed epoch's, else the frozen table) via `assign_cells` —
  map-only Arrow pass, the centroid table the only broadcast; no
  shuffle, no corpus access, any arrival rate.
- ``postings_compacted/upto=K/`` — optional: `compact_ivf_segments`
  folds every segment newer than the current refresh epoch (id ≤ K)
  into ONE cell-partitioned parquet (the `ivf_index_write` layout, so
  probes dynamic-partition-prune to the buckets they hit) — the
  small-files answer at streaming rates. Folded ``batch=`` segments
  are RETAINED (loaders ignore ids ≤ K); garbage collection is a
  retention policy, not an ingest concern.
- ``refresh/epoch=E/`` — optional: `refresh_ivf_state` runs ONE
  quiesced Lloyd step over the whole accumulated state (`lloyd_refresh`)
  and re-files every vector under the refreshed quantizer,
  cell-partitioned. The trailing ``_COMMITTED`` marker is the swap
  point: drains and loaders use the newest COMMITTED epoch's centroids
  and postings, superseding the frozen batch-0 quantizer, every
  segment with id ≤ E, and every older compaction (any compaction with
  ``upto > E`` was necessarily folded under epoch E's floor, so the
  three state sources always tile disjointly). A crashed refresh
  leaves no marker and is invisible; re-running it overwrites the same
  epoch dir from the same inputs.

Idempotence (the funnel module's discipline): every write lands under
``batch=<id>`` / ``upto=<id>`` with overwrite; the frozen-centroid
write is guarded by its ``_SUCCESS`` marker, and a replayed batch 0
would regenerate byte-identical centroids anyway (exact integer
aggregation of the same rows). A replayed micro-batch therefore
overwrites its own posting segment and leaves all other state alone.

Correctness contract (tests/test_streaming.py): after any drain /
compaction / refresh interleaving, `load_ivf_state` postings equal
``assign_cells(current quantizer, union of all ingested batches)``
row-for-row, and a committed epoch's quantizer equals `lloyd_refresh`
over exactly the state it covered — therefore `ivf_batch_probe` over
the streamed index equals the batch-built probe (v14's oracle-pinned
kernel) for any query batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_etl_reporting_pipeline_spark.operators.vectors import (
    assign_cells,
    ivf_centroids,
    lloyd_refresh,
)
from serverless_etl_reporting_pipeline_spark.streaming.state import (
    _batch_dirs,
    _committed_dirs,
    _committed_tip,
    _fs_delete,
    _fs_exists,
    _fs_touch,
    _read_literal,
    _union_all,
    ensure_state_format,
)

# Format token of the persisted IVF state (r12 ADVICE: every stateful
# drain versions its state the way the funnel does). Pins the exact-
# integer 1e-6 quantizer (`ivf_centroids` / `lloyd_refresh`), the
# quantized-cosine `assign_cells` kernel with its lowest-cell tie break
# and -1 zero-norm quarantine, and the epoch/fold/tail tiling contract
# — a change to any of those re-interprets stored cells, and consulting
# old postings would silently mis-route probes. Bump on contract
# change; a rebuild re-drains the feed and loses nothing.
IVF_STATE_FORMAT = "v1-int1e6-coslow"


def _current_epoch(spark: SparkSession, work_dir: str) -> tuple[int, str] | None:
    """Newest COMMITTED refresh epoch ``(id, uri)``, or None. Epochs
    missing their ``_COMMITTED`` marker (crashed refresh) are invisible
    to drains and loaders — the shared commit-marker discipline
    (`_committed_dirs`), with the refresh's own marker name."""
    committed = _committed_dirs(
        spark, os.path.join(work_dir, "refresh"), "epoch=", marker="_COMMITTED"
    )
    return committed[-1] if committed else None


def _sel_postings(df: DataFrame) -> DataFrame:
    """Normalize a posting frame to the index schema ``(_cell BIGINT,
    _id, _qv)`` — Hive partition discovery types ``_cell`` as INT on
    some reads; every fold/load site MUST project through this one
    helper so compactions and the loader can never drift apart."""
    return df.select(F.col("_cell").cast("long").alias("_cell"), "_id", "_qv")


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
    ensure_state_format(spark, work_dir, IVF_STATE_FORMAT)
    cent_dir = os.path.join(work_dir, "centroids")
    post_dir = os.path.join(work_dir, "postings")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    n_batches = {"n": 0}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        n_batches["n"] += 1
        s = batch.sparkSession
        # quantizer = the newest committed refresh epoch's, else the one
        # FROZEN at first ingestion (the _SUCCESS guard can only be
        # absent during batch 0 or its checkpoint replay, and a replay
        # regenerates identical exact-integer centroids)
        epoch = _current_epoch(s, work_dir)
        if epoch is None:
            if not _fs_exists(s, os.path.join(cent_dir, "_SUCCESS")):
                ivf_centroids(batch, vec_col, cell_col).write.mode("overwrite").parquet(
                    cent_dir
                )
            cent = _read_literal(s, cent_dir)
        else:
            cent = _read_literal(s, f"{epoch[1]}/centroids")
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
    """Fold every ``postings/batch=<id>`` segment newer than the
    current refresh epoch into ONE cell-partitioned parquet under
    ``postings_compacted/upto=<max id>`` (superseding earlier
    compactions — `load_ivf_state` reads only the newest). One
    shuffle-free write re-bucketed by directory; after it, probes of
    the compacted span read exactly the cell directories they hit
    instead of every tiny segment file. Returns the ``upto`` id of the
    STANDING fold — the new one when fresh segments were folded, the
    existing one when nothing new arrived (idempotent no-op) — or None
    when no post-epoch state exists at all.

    Segments at or below the epoch are never folded: their cells were
    assigned under a superseded quantizer, and the epoch's re-filed
    postings already cover those vectors.

    Folds FROM the newest post-epoch compaction plus the segment tail
    above it (the `_fold_segments` discipline) — lossless after
    `vacuum_ivf_segments` has deleted folded segment dirs, and
    re-folding reads one cell-partitioned parquet + the short tail."""
    epoch = _current_epoch(spark, work_dir)
    floor_id = epoch[0] if epoch else -1
    comps = [
        c
        for c in _committed_dirs(
            spark, os.path.join(work_dir, "postings_compacted"), "upto="
        )
        if c[0] > floor_id
    ]
    prev = comps[-1][0] if comps else floor_id
    segs = [
        (bid, uri)
        for bid, uri in _committed_dirs(spark, os.path.join(work_dir, "postings"))
        if bid > prev
    ]
    if not segs:
        return prev if comps else None  # nothing new beyond the current fold
    upto = max(bid for bid, _ in segs)
    parts = [_sel_postings(_read_literal(spark, comps[-1][1]))] if comps else []
    parts += [_sel_postings(_read_literal(spark, uri)) for _, uri in segs]
    _union_all(parts).write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(work_dir, "postings_compacted", f"upto={upto}")
    )
    return upto


def vacuum_ivf_segments(spark: SparkSession, work_dir: str) -> list[int]:
    """Retention for the streamed IVF index: delete state superseded by
    the current refresh epoch and the newest post-epoch compaction —

    - posting ``batch=`` dirs at or below the floor (epoch re-file
      covers ids ≤ E; the newest post-epoch fold covers (E, K]) —
      including uncommitted ones (a replay's re-write of a vacuumed
      dir, dead by id range either way);
    - compactions other than the newest COMMITTED post-epoch one
      (those ≤ E are dead under `load_ivf_state`'s floor filter, older
      post-epoch folds are superseded, and an uncommitted dir is a
      crashed fold that would otherwise leak forever — later folds
      target higher ``upto`` ids and never overwrite it);
    - refresh epochs other than the current committed one (older ones
      are superseded; an uncommitted one is a crashed refresh whose
      retry regenerates it from the same inputs).

    `load_ivf_state`, `compact_ivf_segments`, and `refresh_ivf_state`
    all read epoch + newest-fold + newer-tail, so the observable index
    is unchanged; a replayed micro-batch re-writing a vacuumed posting
    dir is ignored by all of them (id ≤ floor). GC is the operator's
    call — drains, folds, and refreshes never delete anything; like
    them, vacuum runs quiesced (never concurrently with a drain, fold,
    or refresh), which is what makes reclaiming in-flight-looking
    crashed dirs safe. Returns the deleted posting batch ids."""
    epoch = _current_epoch(spark, work_dir)
    e = epoch[0] if epoch else -1
    comp_dir = os.path.join(work_dir, "postings_compacted")
    live = [c for c in _committed_dirs(spark, comp_dir, "upto=") if c[0] > e]
    floor = live[-1][0] if live else e
    gone = []
    for bid, uri in _batch_dirs(spark, os.path.join(work_dir, "postings")):
        if bid <= floor:
            _fs_delete(spark, uri)
            gone.append(bid)
    keep = live[-1][1] if live else None
    for _, uri in _batch_dirs(spark, comp_dir, "upto="):
        if uri != keep:
            _fs_delete(spark, uri)
    cur = epoch[1] if epoch else None
    for _, uri in _batch_dirs(spark, os.path.join(work_dir, "refresh"), "epoch="):
        if uri != cur:
            _fs_delete(spark, uri)
    return gone


def refresh_ivf_state(spark: SparkSession, work_dir: str) -> int | None:
    """One quiesced quantizer refresh + epoch swap (run BETWEEN drains
    — the swap is not concurrent-safe against an in-flight batch, the
    same contract a stored index's reindex job has):

    1. `lloyd_refresh` over the ENTIRE accumulated state → refreshed
       centroids under ``refresh/epoch=E/centroids``;
    2. every vector re-filed to its nearest refreshed centroid
       (`assign_cells`), cell-partitioned under ``.../postings``;
    3. the ``_COMMITTED`` marker written LAST — the atomic swap point.

    E = the newest ingested batch id, so the epoch supersedes every
    batch segment and compaction that existed when it ran; subsequent
    drains assign with the refreshed quantizer. Returns E, or None when
    there is no state or nothing new since the last committed epoch
    (re-refreshing the same data would silently iterate k-means a
    second step — an explicit policy call, not a default)."""
    # newest ingested batch id across BOTH state stores — the shared
    # tip definition (a vacuum may have deleted every folded segment
    # dir, leaving the fold as the only witness)
    new_e = _committed_tip(
        spark,
        os.path.join(work_dir, "postings"),
        os.path.join(work_dir, "postings_compacted"),
    )
    if new_e is None:
        return None
    epoch = _current_epoch(spark, work_dir)
    if epoch is not None and epoch[0] >= new_e:
        return None
    cent, postings = load_ivf_state(spark, work_dir)
    # the accumulated postings feed TWO write jobs (the Lloyd step and
    # the re-file); persist between them or the whole epoch+fold+tail
    # union is re-scanned from parquet a second time
    postings = postings.persist()
    ep_dir = os.path.join(work_dir, "refresh", f"epoch={new_e}")
    try:
        lloyd_refresh(cent, postings, id_col="_id", vec_col="_qv").write.mode(
            "overwrite"
        ).parquet(os.path.join(ep_dir, "centroids"))
        refreshed = _read_literal(spark, os.path.join(ep_dir, "centroids"))
        assign_cells(refreshed, postings, id_col="_id", vec_col="_qv").write.mode(
            "overwrite"
        ).partitionBy("_cell").parquet(os.path.join(ep_dir, "postings"))
    finally:
        postings.unpersist()
    _fs_touch(spark, os.path.join(ep_dir, "_COMMITTED"))
    return new_e


def load_ivf_state(spark: SparkSession, work_dir: str) -> tuple[DataFrame, DataFrame]:
    """Load the streamed IVF index for probing: the CURRENT quantizer
    (newest committed refresh epoch's centroids, else the frozen
    batch-0 table) plus postings tiled from the three disjoint state
    sources — epoch re-file (ids ≤ E), newest post-epoch compaction
    (E < ids ≤ K), uncompacted segment tail (ids > max(E, K)). Feed
    straight into `ivf_batch_probe`."""
    parts = []
    epoch = _current_epoch(spark, work_dir)
    if epoch is not None:
        cent = _read_literal(spark, f"{epoch[1]}/centroids")
        parts.append(_sel_postings(_read_literal(spark, f"{epoch[1]}/postings")))
    else:
        cent = _read_literal(spark, os.path.join(work_dir, "centroids"))
    floor_id = epoch[0] if epoch else -1
    comps = [
        c
        for c in _committed_dirs(
            spark, os.path.join(work_dir, "postings_compacted"), "upto="
        )
        if c[0] > floor_id
    ]
    if comps:
        parts.append(_sel_postings(_read_literal(spark, comps[-1][1])))
    upto = comps[-1][0] if comps else floor_id
    for bid, uri in _committed_dirs(spark, os.path.join(work_dir, "postings")):
        if bid > upto:
            parts.append(_sel_postings(_read_literal(spark, uri)))
    if not parts:
        raise FileNotFoundError(f"no posting state under {work_dir}")
    return cent, _union_all(parts)
