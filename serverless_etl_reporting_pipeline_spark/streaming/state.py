"""Shared segment-log state machinery for the stateful streaming
ingest twins (funnel, vector-dedup band index, IVF postings, SCD2
version log).

The pattern every module follows: each micro-batch writes its state
contribution to a ``batch=<id>`` dir with mode=overwrite (a pure
function of the batch's source rows — checkpoint-recovery replay
reproduces it byte-identically); a compaction folds committed segments
into ONE ``_bid``-tagged parquet under ``<comp_dir>/upto=<id>``
(small-files); a vacuum deletes what the fold supersedes (retention).
Every reader sees newest-fold-plus-newer-tail, so both maintenance
steps are invisible to drains, reports, and replays — the ``_bid`` tag
is what lets a replayed micro-batch still exclude its OWN rows after
its committed segment was folded (and possibly vacuumed).

All filesystem access goes through the Hadoop FileSystem API so state
dirs behave identically on local disk, HDFS, and object stores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Minimum INPUT bytes before a fold with ``partition_by`` actually
# writes the directory layout (see `_fold_segments`): below this a
# fine-grained key set (the band fan's 2 048 (band, _bkt) values)
# would shatter a small fold into thousands of KB files whose listing
# and open cost exceeds a plain scan of the data. 1 GiB default keeps
# per-dir files ≥ ~512 KB once the layout engages; env-overridable so
# a cluster deployment (or a layout test) can move the knee without a
# code change.
_PARTITION_FOLD_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_PARTITION_FOLD_MIN_BYTES", str(1 << 30))
)


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API, so state dirs
    work on HDFS/S3/… exactly as on local disk (os.path would silently
    answer False for every non-local URI)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def _fs_touch(spark: SparkSession, path: str) -> None:
    """Create an empty marker file through the Hadoop FileSystem API
    (any supported scheme) — the commit point of an IVF refresh epoch
    and the benchmark-freeze provenance marker."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark._jsc.hadoopConfiguration()).create(p, True).close()


def _fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete through the Hadoop FileSystem API (same scheme
    coverage as `_fs_exists`) — the primitive behind retention."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)


def _batch_dirs(
    spark: SparkSession, dir_path: str, prefix: str = "batch="
) -> list[tuple[int, str]]:
    """(id, uri) for every ``<prefix><id>`` child of ``dir_path``,
    listed through the Hadoop FileSystem API (any supported scheme).
    The default prefix enumerates per-micro-batch state segments; the
    IVF module also lists its ``upto=<id>`` compaction dirs with it."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith(prefix):
            out.append((int(name.split("=", 1)[1]), st.getPath().toString()))
    return sorted(out)


def _committed_dirs(
    spark: SparkSession, dir_path: str, prefix: str = "batch=", marker: str = "_SUCCESS"
) -> list[tuple[int, str]]:
    """`_batch_dirs` restricted to dirs whose commit finished (the
    ``marker`` file present — parquet's ``_SUCCESS``, or the IVF
    refresh's ``_COMMITTED``). The drains' strictly-earlier per-batch
    reads don't need this — a crashed batch write means the checkpoint
    never advanced, so the replay IS that batch and overwrites the
    partial dir before anyone reads it — but MAINTENANCE ops
    (compaction, refresh, state loads) also read the LATEST segment,
    and folding or trusting a half-written dir would bake the loss in
    permanently.

    One ``globStatus`` call fetches every commit marker — not one
    exists() RPC per child dir, which on an object store would turn a
    500-segment listing into 500 sequential round-trips."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    # dir_path/prefix go into a GLOB: metacharacters in the work dir's
    # own name ([, {, *, ?) would silently match nothing and make
    # committed state invisible — escape them; the trailing * is ours
    glob = jvm.org.apache.hadoop.fs.Path(
        os.path.join(_glob_escape(dir_path), f"{_glob_escape(prefix)}*", marker)
    )
    have = {st.getPath().getParent().toString() for st in (fs.globStatus(glob) or [])}
    return [(i, uri) for i, uri in _batch_dirs(spark, dir_path, prefix) if uri in have]


def _glob_escape(s: str) -> str:
    """Backslash-escape Hadoop glob metacharacters in a path fragment
    that must match LITERALLY inside a globStatus pattern."""
    for ch in ("\\", "*", "?", "[", "]", "{", "}"):
        s = s.replace(ch, "\\" + ch)
    return s


def _read_literal(spark: SparkSession, uri: str) -> DataFrame:
    """spark.read.parquet with the path taken LITERALLY: the reader
    glob-interprets its path argument, so a work dir named
    `/data/we[ird]/log` would silently read a sibling `/data/wei/log`
    (or throw path-not-found on healthy state). Segment URIs come from
    literal listStatus results — escape before reading."""
    return spark.read.parquet(_glob_escape(uri))


def _committed_tip(spark: SparkSession, seg_dir: str, comp_dir: str) -> int | None:
    """Newest committed batch id across a log's segments and its newest
    committed fold — None when no committed state exists. THE
    definition of a log's tip; `_log_state` and the IVF refresh both
    derive from it."""
    ids = [bid for bid, _ in _committed_dirs(spark, seg_dir)]
    comps = _committed_dirs(spark, comp_dir, "upto=")
    ids += [comps[-1][0]] if comps else []
    return max(ids) if ids else None


def _union_all(parts: list[DataFrame]) -> DataFrame:
    """unionByName over a non-empty part list — the one fold loop every
    segment assembler shares."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _assemble(
    spark: SparkSession,
    segs: list[tuple[int, str]],
    comps: list[tuple[int, str]],
    batch_id: int,
    keep_bid: bool,
) -> DataFrame | None:
    """Assemble the newest fold + segment tail below ``batch_id`` from
    already-listed dirs — the shared body of `_prior_segments` and
    `_log_state`, so callers that need the listings themselves don't
    pay the filesystem round-trips twice."""
    parts, upto = [], -1
    if comps:
        upto = comps[-1][0]
        comp = _read_literal(spark, comps[-1][1]).filter(F.col("_bid") < batch_id)
        parts.append(comp if keep_bid else comp.drop("_bid"))
    for bid, uri in segs:
        if upto < bid < batch_id:
            seg = _read_literal(spark, uri)
            parts.append(seg.withColumn("_bid", F.lit(bid)) if keep_bid else seg)
    return _union_all(parts) if parts else None


def _prior_segments(
    spark: SparkSession,
    seg_dir: str,
    comp_dir: str,
    batch_id: int,
    keep_bid: bool = False,
) -> DataFrame | None:
    """State from batches STRICTLY before ``batch_id``: the newest
    committed compaction (row-level ``_bid < batch_id`` filter — see
    `_fold_segments`) plus the uncompacted segment tail. None when no
    strictly-earlier state exists (first batch). With ``keep_bid`` the
    origin batch id stays as a ``_bid`` column on every row (tail
    segments tagged from their dir name) — what lets lake readers
    identify the latest batch after its dir was vacuumed.

    Deliberately reads tail dirs WITHOUT requiring ``_SUCCESS``: a
    strictly-earlier batch always committed (the checkpoint advanced
    past it), so a malformed dir below the probing batch is corruption
    and must surface as a read error, never be silently skipped
    (dropping a quality-hash segment would quietly disable cross-batch
    dedup). Whole-log READERS must not call this with an arbitrary
    upper bound — an in-flight batch's partial dir is legitimate, not
    corrupt; they go through `_log_state`, which bounds at the
    committed tip."""
    return _assemble(
        spark,
        _batch_dirs(spark, seg_dir),
        _committed_dirs(spark, comp_dir, "upto="),
        batch_id,
        keep_bid,
    )


def _log_state(
    spark: SparkSession, seg_dir: str, comp_dir: str, keep_bid: bool = False
) -> tuple[DataFrame | None, int | None]:
    """The FULL committed state of a segment log, as ``(frame, tip)``
    where ``tip`` is the newest committed batch id across segments and
    fold (both None when no committed state exists). Reads are bounded
    at the tip, so a crashed or in-flight write ABOVE it is invisible
    (its replay will overwrite the dir before the checkpoint ever
    admits it), while a bad dir at or below the tip surfaces LOUDLY: an
    uncommitted segment inside the read span is raised here explicitly
    (under the crash model it is unreachable — the checkpoint cannot
    have advanced past it — so it means restore/sync damage, and
    silently including its partial rows would bake the loss into every
    report), and a malformed committed dir still errors at read time.
    One listing per dir — callers that need the tip (reports keying on
    the latest batch) don't re-list."""
    segs = _batch_dirs(spark, seg_dir)
    committed = dict(_committed_dirs(spark, seg_dir))
    comps = _committed_dirs(spark, comp_dir, "upto=")
    ids = list(committed) + ([comps[-1][0]] if comps else [])
    if not ids:
        return None, None
    tip = max(ids)
    upto = comps[-1][0] if comps else -1
    bad = [uri for bid, uri in segs if upto < bid <= tip and bid not in committed]
    if bad:
        raise RuntimeError(
            f"uncommitted segment dir(s) below the committed tip {tip}: {bad}"
        )
    return _assemble(spark, segs, comps, tip + 1, keep_bid), tip


def _fold_segments(
    spark: SparkSession,
    seg_dir: str,
    comp_dir: str,
    partition_by: list[str] | None = None,
) -> int | None:
    """Fold the committed state under ``seg_dir`` into ONE parquet at
    ``comp_dir/upto=<max id>``, each row tagged with its origin batch
    id (``_bid``) — the small-files answer for a long-running ingest,
    shared by the hash-state, funnel-lake, band-index, and SCD2-log
    compactions. The tag is what lets `_prior_segments`' strictly-
    earlier reads SURVIVE compaction: a replayed micro-batch whose own
    committed segment was folded before the crash-recovery replay
    still excludes its own rows at the row level.

    Folds FROM the newest earlier compaction plus the segment tail
    above it — never from raw segments alone — so a fold stays
    lossless after `_vacuum_segments` has deleted folded segment dirs
    (and re-folding reads one parquet + the short tail instead of
    every historical segment). Equivalent when everything is retained:
    by the idempotence contract the folded copy of a segment is
    bit-identical to the segment itself. A segment dir at or below the
    previous ``upto`` (a replayed batch re-writing its vacuumed dir)
    is deliberately ignored — its rows are already in the fold.
    Returns the new ``upto`` id, None when no state exists, and
    short-circuits when the committed span is already folded.

    ``partition_by`` gives the fold a directory layout (the IVF-cells
    pattern — e.g. the text band fan's (band, _bkt), so probes
    partition-prune to the buckets they hit). The fold is repartitioned
    by those keys first, so each partition dir gets ONE file instead of
    one per writer task — the keys are hash-derived and uniform, so the
    extra exchange is balanced and priced only at maintenance time.
    The layout is SIZE-GATED (r13): below
    ``_PARTITION_FOLD_MIN_BYTES`` of input the fold is written as one
    plain parquet even when ``partition_by`` is given — a fine-grained
    key set (the band fan's 2 048 (band, _bkt) values) over a small
    fold writes thousands of KB-sized files whose per-file listing and
    open cost exceeds a full scan of the data (measured: the x4/x16
    text drain's steady batch read the 2 048-dir fold 2× SLOWER than
    the 5 raw segments it replaced). Partition columns survive either
    way (as directory keys or as plain data columns), so probes'
    (band, bucket) predicates prune dirs on a big fold and fall back to
    row filters on a small one — same rows, no caller change."""
    comps = _committed_dirs(spark, comp_dir, "upto=")
    prev = comps[-1][0] if comps else -1
    tail = [(bid, uri) for bid, uri in _committed_dirs(spark, seg_dir) if bid > prev]
    if not tail:
        return prev if comps else None  # nothing new: current fold stands
    upto = max(bid for bid, _ in tail)
    parts = [_read_literal(spark, comps[-1][1])] if comps else []
    parts += [
        _read_literal(spark, uri).withColumn("_bid", F.lit(bid)) for bid, uri in tail
    ]
    folded = _union_all(parts)
    if partition_by:
        jvm = spark._jvm
        in_bytes = 0
        for uri in ([comps[-1][1]] if comps else []) + [u for _, u in tail]:
            p = jvm.org.apache.hadoop.fs.Path(uri)
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
            in_bytes += fs.getContentSummary(p).getLength()
        if in_bytes < _PARTITION_FOLD_MIN_BYTES:
            partition_by = None
    w = (
        folded.repartition(*partition_by).write.partitionBy(*partition_by)
        if partition_by
        else folded.write
    )
    w.mode("overwrite").parquet(os.path.join(comp_dir, f"upto={upto}"))
    return upto


def _vacuum_segments(spark: SparkSession, seg_dir: str, comp_dir: str) -> list[int]:
    """Retention for a compacted segment log: delete state the newest
    committed compaction makes redundant — per-batch segment dirs with
    id ≤ ``upto`` (their rows live on in the fold, ``_bid``-tagged) and
    superseded older ``upto=`` compactions. Safe because every reader
    sees newest-compaction-plus-newer-tail (`_prior_segments`,
    `_fold_segments`), so the observable log is unchanged; a replayed
    micro-batch that re-writes a vacuumed segment dir is ignored by
    readers and by later folds (id ≤ upto), and still excludes its OWN
    rows via the row-level ``_bid`` filter. GC is the operator's call —
    drains and compactions never delete anything. Like every
    maintenance op here, must not run concurrently with a fold or
    drain (the quiesced contract), which is what makes it safe to also
    reclaim CRASHED leftovers: uncommitted ``upto=`` dirs (a fold that
    died mid-write and was later superseded) and uncommitted segment
    dirs at or below the fold (a replay's re-write of a vacuumed dir —
    readers ignore the id range either way). Returns the deleted
    segment batch ids."""
    comps = _committed_dirs(spark, comp_dir, "upto=")
    if not comps:
        return []
    upto, keep = comps[-1]
    gone = []
    for bid, uri in _batch_dirs(spark, seg_dir):
        if bid <= upto:
            _fs_delete(spark, uri)
            gone.append(bid)
    for _, uri in _batch_dirs(spark, comp_dir, "upto="):
        if uri != keep:
            _fs_delete(spark, uri)
    return gone


def ensure_state_format(spark: SparkSession, work_dir: str, token: str) -> None:
    """Refuse to consult persisted state written under a different
    format contract (r11 ADVICE: the funnel's exact-dedup key moved
    from md5(lower(text)) to md5(casefold(text)), so a seen-hashes
    index persisted before the change silently re-admits every
    previously-seen doc containing a casefold-divergent code point —
    an invisible correctness break, not a crash).

    The marker is an empty file whose NAME carries the token
    (``_state_format=<token>``), so compatibility is one existence
    check through the same Hadoop FileSystem API as the rest of the
    state machinery. Rules:

    - marker with the expected token present → compatible, return;
    - work_dir missing or empty → fresh state, write the marker;
    - anything else (state without a marker = pre-versioning format,
      or a marker with a DIFFERENT token) → raise, naming both tokens.
      The operator rebuilds by draining into a fresh work_dir — state
      here is always a pure function of the source feed, so a rebuild
      loses nothing.
    """
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(work_dir)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    marker = os.path.join(work_dir, f"_state_format={token}")
    if fs.exists(jvm.org.apache.hadoop.fs.Path(marker)):
        return
    if fs.exists(p) and len(fs.listStatus(p)) > 0:
        found = [
            st.getPath().getName()[len("_state_format="):]
            for st in fs.listStatus(p)
            if st.getPath().getName().startswith("_state_format=")
        ]
        raise RuntimeError(
            f"state under {work_dir} was written with format "
            f"{found[0] if found else '<unversioned, pre-r12>'!r} but this "
            f"build expects {token!r}; rebuild the state by draining the "
            f"source into a fresh work_dir (state is a pure function of "
            f"the feed — nothing is lost)"
        )
    _fs_touch(spark, marker)
