"""Degenerate-input sweep for the STREAMING drains (r10 verdict ask #5).

The batch registry has `tools/degenerate_sweep.py` (doctored + zero-row
corpora, full differential oracle). The six stateful streaming modules
(`streaming/{funnel,minhash,vectors,ivf,scd2,sketches}.py`) were only
doctored-tested piecemeal (a corrupt-batch twin in tests). This harness
stages the SAME doctored corpus — every degenerate class the batch
sweep carries: NULL/empty/multilingual text, duplicate ids, NULL/
ragged/zero-norm/non-finite vectors, NULL event times/types/users/
values, malformed JSON — as ARRIVAL FILES, plus the two stream-only
faults every 100 TB ingest eventually sees:

  - an EMPTY micro-batch (a zero-row-but-committed arrival file: the
    empty day partition / heartbeat flush), and
  - an ALL-DUPLICATE batch (byte-identical re-delivery of a previous
    arrival — the at-least-once fault).

and asserts BATCH == STREAM parity on every module's drain: the
streamed state/annotations must equal the module's oracle-pinned batch
operator applied to the same logical arrivals.

r12 adds TORN-DRAIN fault injection (verdict ask #3 — the failure a
preempted 100 TB cluster hits weekly): on one mid-stream arrival every
module's drain is CRASHED at every parquet state-write boundary in
turn — after the 1st completed write (for the two-log modules this
tears BETWEEN lockstep segment pairs: minhash's shingle_index written,
sig_index missing), after the 2nd, ... and after the LAST write but
before the streaming checkpoint commit — then restarted. The batch
must eventually commit and the final state must be indistinguishable
from a never-crashed run (the parity assertion below is computed from
never-crashed batch operators). The IVF module additionally tears its
quiesced `refresh_ivf_state` between the epoch's centroids/postings
writes and before the `_COMMITTED` marker, asserting the uncommitted
epoch stays invisible to `load_ivf_state` and a clean re-run commits.

r13 adds TORN-COMPACTION injection (verdict ask #5 — compaction
rewrites multi-segment state, a distinct crash window): after the
third arrival every module's compaction is crashed at every fold-write
boundary (`_compact_with_tears`) — for the text module's three-log
lockstep compaction that tears between the shingle/sig/fan folds —
then retried to convergence and vacuumed; the following (redelivery)
batch probes the folded state, so the parity assertion also proves a
torn-then-healed fold neither double-counts rows nor de-syncs the
lockstep logs.

Parity here is
engine-vs-engine (the batch operators themselves are differential-
oracle-checked by the main sweep), so what this hunts is CROSS-BATCH
STATE COMPOSITION bugs: state rows poisoned by degenerate arrivals,
empty-batch id gaps breaking segment readers, re-delivered rows
double-counted or double-flagged.

Usage:
    python tools/degenerate_streaming.py [base_sf_dir] [--emit PATH]
        base_sf_dir defaults to /root/testdata/sf0.001; --emit writes
        the per-module parity record (DEGEN_streaming_r{N}.json).
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OUT = "/tmp/spark_graft_degen_streaming"


def _nskey(row):
    """None-safe, NaN-safe sort key for multiset comparison: duplicate
    arrivals legitimately produce rows identical except for a None vs
    value column, which Python's tuple sort would TypeError on."""
    out = []
    for v in row:
        out.append((v is None, str(type(v).__name__), str(v)))
    return out


def _rows(df, cols):
    return sorted(([r[c] for c in cols] for r in df.collect()), key=_nskey)


def _stage(df, src, parts):
    """Write arrival files one predicate at a time (one file = one
    micro-batch under maxFilesPerTrigger=1). `parts` is a list of
    DataFrames; an EMPTY frame stages the zero-row-file fault."""
    os.makedirs(src, exist_ok=True)
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)


def _median(df, col):
    """Median split cut — NOT the range midpoint: the doctored corpus
    carries extreme ids/timestamps (the r10 degenerate class), and a
    range midpoint puts everything but the outliers in one batch."""
    dt = dict(df.dtypes)[col]
    if dt.startswith("timestamp"):
        # unix_micros rejects TIMESTAMP_NTZ; a fixed cast to TIMESTAMP
        # is order-preserving and used identically on both sides of
        # the cut, so the split stays self-consistent
        ep = F.unix_micros(F.col(col).cast("timestamp"))
        us = df.filter(F.col(col).isNotNull()).select(ep.alias("us"))
        mid_us = us.approxQuantile("us", [0.5], 0.001)[0]
        return ep <= F.lit(int(mid_us))
    mid = df.filter(F.col(col).isNotNull()).approxQuantile(col, [0.5], 0.001)[0]
    return F.col(col) <= F.lit(mid)


class _TornWrite(RuntimeError):
    """Injected crash: the drain dies AFTER a state write completes and
    BEFORE whatever follows it (the lockstep sibling log, the epoch
    marker, the streaming checkpoint commit)."""


@contextlib.contextmanager
def _tear_after(n):
    """Patch DataFrameWriter.parquet so the n-th COMPLETED parquet write
    inside the context raises _TornWrite — the write itself lands on
    disk (with its _SUCCESS marker), exactly the preempted-executor /
    killed-driver shape: durable segment, no commit. Yields a dict;
    ``fired`` records whether the tear was reached (a context whose
    body performs fewer than n writes completes normally)."""
    from pyspark.sql import readwriter as rw

    orig = rw.DataFrameWriter.parquet
    state = {"writes": 0, "fired": False}

    def patched(self, path, *a, **kw):
        out = orig(self, path, *a, **kw)
        state["writes"] += 1
        if state["writes"] == n:
            state["fired"] = True
            raise _TornWrite(f"injected tear after write #{n}: {path}")
        return out

    rw.DataFrameWriter.parquet = patched
    try:
        yield state
    finally:
        rw.DataFrameWriter.parquet = orig


def _drain_with_tears(drain, rec, after_tear=None):
    """Crash-restart ladder: run ``drain`` with the tear point at write
    1, 2, ... — each torn attempt leaves its completed writes on disk
    and its checkpoint uncommitted — until an attempt completes with no
    tear fired (k exceeded the batch's write count). Returns the final
    successful attempt's batch count; ``rec['tears']`` accumulates how
    many distinct crash points were exercised. ``after_tear(k)`` lets a
    module assert on the torn on-disk shape between attempts."""
    k = 1
    while True:
        with _tear_after(k) as hit:
            try:
                n = drain()
            except Exception:
                # foreachBatch failures surface as StreamingQueryException
                # wrapping the injected error; anything NOT ours is real
                if not hit["fired"]:
                    raise
        if not hit["fired"]:
            return n
        rec["tears"] = rec.get("tears", 0) + 1
        if after_tear is not None:
            after_tear(k)
        k += 1
        if k > 16:
            raise RuntimeError("tear ladder did not terminate (16 writes in one batch?)")


def _compact_with_tears(compact, rec):
    """Crash-restart ladder for MAINTENANCE ops (r12 verdict ask #5):
    run ``compact`` with the tear point at write 1, 2, ... until a
    clean pass. Compaction rewrites multi-segment state, so its crash
    window differs from a drain's: a tear lands BETWEEN per-log folds
    (text's shingle fold committed, its sig/fan siblings unfolded) or
    between "fold committed" and the caller's vacuum — the retry must
    short-circuit already-folded logs to the same ``upto`` and never
    double-count rows a reader sees. Returns the clean pass's result."""
    k = 1
    while True:
        with _tear_after(k) as hit:
            try:
                out = compact()
            except Exception:
                if not hit["fired"]:
                    raise
        if not hit["fired"]:
            return out
        rec["tears"] = rec.get("tears", 0) + 1
        k += 1
        if k > 16:
            raise RuntimeError("compaction tear ladder did not terminate")


def _drain_maybe_torn(i, drain, rec, after_tear=None, tear_at=2):
    """Drain arrival ``i``; on the ``tear_at``-th arrival run the full
    crash-restart ladder first. Index 2 is every module's second
    non-empty batch — prior state exists, so the torn batch exercises
    cross-batch composition, not the trivial first-batch path."""
    if i == tear_at:
        return _drain_with_tears(drain, rec, after_tear)
    return drain()


def _split_with_empty_and_dup(df, id_col, dup_of="first"):
    """The canonical arrival plan: [first-half, EMPTY, second-half,
    duplicate-of-first-or-last]. NULL ids ride in the first batch."""
    le_mid = _median(df, id_col)
    in_b0 = F.col(id_col).isNull() | le_mid
    a0 = df.filter(in_b0)
    a1 = df.filter(~in_b0)
    empty = df.limit(0)
    dup = a0 if dup_of == "first" else a1
    return [a0, empty, a1, dup], in_b0


def run_module(spark, name, doctored, workroot):
    src = os.path.join(workroot, name, "src")
    work = os.path.join(workroot, name, "work")
    os.makedirs(work, exist_ok=True)
    rec = {"arrivals": 4, "processed": [], "parity": None, "err": None}

    if name in ("funnel", "text"):
        docs = spark.read.parquet(f"{doctored}/documents.parquet")
        docs = docs.select("doc_id", "text", "lang", "source") if name == "funnel" else docs.select("doc_id", "text")
        parts, _in_b0 = _split_with_empty_and_dup(docs, "doc_id")
        schema = parts[0].schema
        if name == "funnel":
            from serverless_etl_reporting_pipeline_spark.operators.funnel import (
                annotate_batch,
                eval_split,
                quality_hashes,
                shingle_set,
            )
            from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
                compact_funnel_lake,
                compact_hash_state,
                incremental_funnel_drain,
                vacuum_hash_state,
            )

            for i, p in enumerate(parts):
                _stage(p, src, [p])
                rec["processed"].append(_drain_maybe_torn(
                    i, lambda: incremental_funnel_drain(spark, src, schema, work), rec))
                if i == 2:
                    # torn COMPACTION between batches (ask #5): both
                    # funnel folds crashed at every write boundary,
                    # then healed; the final (redelivery) batch probes
                    # the folded hash state. The lake is folded but NOT
                    # vacuumed — the parity read below addresses batch
                    # dirs directly.
                    _compact_with_tears(lambda: compact_hash_state(spark, work), rec)
                    _compact_with_tears(lambda: compact_funnel_lake(spark, work), rec)
                    vacuum_hash_state(spark, work)
            cols = ["doc_id", "q", "dd", "clean"]
            # Per-batch twin — the drain's own composition spec (the
            # split==union property holds only for DISJOINT batches;
            # the REDELIVERY contract, pinned r11: a cross-batch
            # byte-identical copy of an already-emitted quality doc is
            # dd=False/clean=False — the survivor is never re-emitted —
            # while WITHIN-batch identical shards keep the r10 contract
            # of sharing the winner's dd=True via the (doc_id, h) join).
            a0, a1 = parts[0], parts[2]
            sh0 = shingle_set(a0)
            hold = sh0.filter(eval_split()).select("s").distinct()
            want = [
                _rows(annotate_batch(a0, hold, ev=eval_split(), shingle_frame=sh0), cols),
                _rows(annotate_batch(a1, hold, seen_hashes=quality_hashes(a0)), cols),
                _rows(annotate_batch(a0, hold,
                                     seen_hashes=quality_hashes(a0.unionAll(a1))), cols),
            ]
            got = [
                _rows(spark.read.parquet(f"{work}/funnel_ann/batch={b}"), cols)
                for b in (0, 2, 3)
            ]
            # the redelivery batch must re-emit NO survivor: every
            # quality doc whose hash is already in state arrives
            # dd=False (non-quality rows are dd=False by definition)
            redeliv = spark.read.parquet(f"{work}/funnel_ann/batch=3")
            assert redeliv.filter("dd").count() == 0, "redelivered batch re-emitted survivors"
        else:
            from serverless_etl_reporting_pipeline_spark.operators.minhash import incremental_neardup_flags
            from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
                compact_text_index,
                incremental_text_dedup_drain,
                vacuum_text_index,
            )

            prior = None
            want_all, got_dirs = [], []

            def _lockstep_shape(k):
                # the riskiest tears (verdict ask #3, extended to the
                # r13 three-log layout): after write #1 the lockstep
                # logs are DE-SYNCED on disk — batch 2's shingle
                # segment committed (_SUCCESS), its signature and fan
                # siblings absent; after write #2 the fan alone is
                # missing. Assert the shapes are really torn so the
                # convergence below is proving recovery, not a no-op.
                if k == 1:
                    assert os.path.exists(f"{work}/shingle_index/batch=2/_SUCCESS"), \
                        "tear #1 did not land the shingle segment"
                    assert not os.path.exists(f"{work}/sig_index/batch=2"), \
                        "tear #1 unexpectedly wrote the signature sibling"
                    assert not os.path.exists(f"{work}/band_fan/batch=2"), \
                        "tear #1 unexpectedly wrote the fan sibling"
                if k == 2:
                    assert os.path.exists(f"{work}/sig_index/batch=2/_SUCCESS"), \
                        "tear #2 did not land the signature segment"
                    assert not os.path.exists(f"{work}/band_fan/batch=2"), \
                        "tear #2 unexpectedly wrote the fan sibling"

            for i, p in enumerate(parts):
                _stage(p, src, [p])
                rec["processed"].append(_drain_maybe_torn(
                    i, lambda: incremental_text_dedup_drain(spark, src, schema, work),
                    rec, after_tear=_lockstep_shape))
                if i == 2:
                    # torn COMPACTION between batches (ask #5): the
                    # three-fold lockstep compaction crashed at every
                    # write boundary (shingle fold committed / sig and
                    # fan unfolded, …) then healed; the final batch
                    # probes the folded-and-vacuumed index.
                    _compact_with_tears(lambda: compact_text_index(spark, work), rec)
                    vacuum_text_index(spark, work)
                if p.isEmpty():
                    continue
                got_dirs.append(i)  # batch ids equal arrival index (empty consumes one)
                if prior is None:
                    # first batch: nothing may be flagged
                    want_all.append(_rows(
                        p.select("doc_id", F.lit(False).alias("is_dup"),
                                 F.lit(None).cast("bigint").alias("dup_src")),
                        ["doc_id", "is_dup", "dup_src"]))
                    prior = p
                else:
                    want_all.append(_rows(incremental_neardup_flags(prior, p),
                                          ["doc_id", "is_dup", "dup_src"]))
                    prior = prior.unionAll(p)
            got = [
                _rows(spark.read.parquet(f"{work}/doc_ann/batch={b}"),
                      ["doc_id", "is_dup", "dup_src"])
                for b in got_dirs
            ]
            want = want_all
    elif name in ("vectors", "ivf"):
        emb = spark.read.parquet(f"{doctored}/embeddings.parquet")
        # ivf keeps `label` (the drain's cell_col for quantizer training)
        emb = emb.select("vec_id", "embedding") if name == "vectors" else emb.select(
            "vec_id", "embedding", "label")
        parts, _ = _split_with_empty_and_dup(emb, "vec_id")
        schema = parts[0].schema
        if name == "vectors":
            from serverless_etl_reporting_pipeline_spark.operators.vectors import neardup_vector_index_probe
            from serverless_etl_reporting_pipeline_spark.plans.vectors import (
                _V09_BANDS, _V09_BITS, _V09_SEED, _V12_TAU,
            )
            from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
                compact_band_index,
                incremental_vector_dedup_drain,
                vacuum_band_index,
            )

            kw = dict(threshold=float(_V12_TAU), n_bits=_V09_BITS, bands=_V09_BANDS,
                      seed=_V09_SEED, dim=64)
            prior, want_all, got_dirs = None, [], []
            for i, p in enumerate(parts):
                _stage(p, src, [p])
                rec["processed"].append(_drain_maybe_torn(
                    i, lambda: incremental_vector_dedup_drain(spark, src, schema, work, **kw),
                    rec))
                if i == 2:
                    # torn COMPACTION between batches (ask #5)
                    _compact_with_tears(lambda: compact_band_index(spark, work), rec)
                    vacuum_band_index(spark, work)
                if p.isEmpty():
                    continue
                got_dirs.append(i)
                if prior is None:
                    want_all.append(_rows(
                        p.select("vec_id", F.lit(False).alias("is_dup"),
                                 F.lit(None).cast("bigint").alias("dup_src"),
                                 F.lit(None).cast("double").alias("cos")),
                        ["vec_id", "is_dup", "dup_src", "cos"]))
                    prior = p
                else:
                    want_all.append(_rows(neardup_vector_index_probe(prior, p, **{
                        k: v for k, v in kw.items() if k != "dim"}),
                        ["vec_id", "is_dup", "dup_src", "cos"]))
                    prior = prior.unionAll(p)
            got = [
                _rows(spark.read.parquet(f"{work}/vec_ann/batch={b}"),
                      ["vec_id", "is_dup", "dup_src", "cos"])
                for b in got_dirs
            ]
            want = want_all
        else:
            from serverless_etl_reporting_pipeline_spark.operators.vectors import assign_cells
            from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
                compact_ivf_segments, incremental_ivf_ingest_drain, load_ivf_state,
                vacuum_ivf_segments,
            )

            for i, p in enumerate(parts):
                _stage(p, src, [p])
                rec["processed"].append(_drain_maybe_torn(
                    i, lambda: incremental_ivf_ingest_drain(spark, src, schema, work), rec))
                if i == 2:
                    # torn COMPACTION between batches (ask #5)
                    _compact_with_tears(lambda: compact_ivf_segments(spark, work), rec)
                    vacuum_ivf_segments(spark, work)
            # TORN REFRESH (verdict ask #3): crash the quiesced epoch
            # swap after its centroids write (k=1) and after its
            # postings write but BEFORE the _COMMITTED marker (k=2) —
            # the uncommitted epoch must stay invisible to readers,
            # and a clean re-run must commit.
            from serverless_etl_reporting_pipeline_spark.streaming.ivf import refresh_ivf_state

            before = _rows(load_ivf_state(spark, work)[1], ["_cell", "_id"])
            for k in (1, 2):
                with _tear_after(k) as hit:
                    try:
                        refresh_ivf_state(spark, work)
                    except Exception:
                        if not hit["fired"]:
                            raise
                assert hit["fired"], f"refresh tear #{k} did not fire"
                rec["tears"] = rec.get("tears", 0) + 1
                assert _rows(load_ivf_state(spark, work)[1], ["_cell", "_id"]) == before, \
                    f"torn refresh (tear #{k}) leaked an uncommitted epoch"
            assert refresh_ivf_state(spark, work) is not None, \
                "clean refresh after torn attempts did not commit"
            cent, postings = load_ivf_state(spark, work)
            union = parts[0].unionAll(parts[2]).unionAll(parts[3])
            got = _rows(postings, ["_cell", "_id"])
            want = _rows(assign_cells(cent, union), ["_cell", "_id"])
    elif name == "scd2":
        from serverless_etl_reporting_pipeline_spark.sources.schemas import SCHEMAS
        from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
            compact_scd2_hist, incremental_scd2_drain, scd2_table, vacuum_scd2_hist,
        )
        from serverless_etl_reporting_pipeline_spark.sources.reader import table_path  # noqa: F401
        from pyspark.sql import Window

        ev = spark.read.schema(SCHEMAS["events"]).parquet(f"{doctored}/events.parquet")
        # time-ordered split (the CDC monotone contract); NULL ts rides
        # in batch 0, the median cut dodges the extreme-timestamp rows
        in_b0 = F.col("ts").isNull() | _median(ev, "ts")
        a0 = ev.filter(in_b0)
        a1 = ev.filter(~in_b0)
        parts = [a0, ev.limit(0), a1, a1]  # dup of the LAST batch: tail redelivery
        for i, p in enumerate(parts):
            _stage(p, src, [p])
            rec["processed"].append(_drain_maybe_torn(
                i, lambda: incremental_scd2_drain(spark, src, SCHEMAS["events"], work), rec))
            if i == 2:
                # torn COMPACTION between batches (ask #5): the tip
                # watermark of the redelivery batch below must read
                # identically from the folded log
                _compact_with_tears(lambda: compact_scd2_hist(spark, work), rec)
                vacuum_scd2_hist(spark, work)
        # the REDELIVERY contract (pinned r11): the drain enforces the
        # monotone-CDC watermark, so a fully-redelivered batch filters
        # to empty — no segment, not counted, history untouched
        assert rec["processed"][3] == 0, "redelivered CDC batch was not idempotent"
        union = a0.unionAll(a1)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        nxt = F.lead("ts").over(w)
        rebuild = (
            union.filter("event_type = 'purchase'")
            .select("user_id", "event_id", "value",
                    F.col("ts").alias("valid_from"), nxt.alias("valid_to"),
                    nxt.isNull().alias("is_current"))
        )
        cols = ["user_id", "event_id", "value", "valid_from", "valid_to", "is_current"]
        got = _rows(scd2_table(spark, work), cols)
        want = _rows(rebuild, cols)
    elif name == "kmv":
        from serverless_etl_reporting_pipeline_spark.operators.sketch import kmv_sketch_grouped
        from serverless_etl_reporting_pipeline_spark.sources.schemas import SCHEMAS
        from serverless_etl_reporting_pipeline_spark.streaming.sketches import (
            compact_kmv_log, kmv_drain, kmv_latest, vacuum_kmv_log,
        )

        ev = spark.read.schema(SCHEMAS["events"]).parquet(f"{doctored}/events.parquet")
        parts, _ = _split_with_empty_and_dup(ev, "event_id")
        for i, p in enumerate(parts):
            _stage(p, src, [p])
            rec["processed"].append(_drain_maybe_torn(
                i, lambda: kmv_drain(spark, src, SCHEMAS["events"], work, "event_type",
                                     F.col("user_id"), k=64), rec))
            if i == 2:
                # torn COMPACTION between batches (ask #5): kmv_latest
                # keys on the row-level _bid tag, so the newest-sketch
                # view must survive the fold+vacuum
                _compact_with_tears(lambda: compact_kmv_log(spark, work), rec)
                vacuum_kmv_log(spark, work)
        union = parts[0].unionAll(parts[2]).unionAll(parts[3])
        cols = ["group_key", "n_rows", "k_used", "kth_hash", "est_distinct"]
        got = _rows(kmv_latest(spark, work), cols)
        want = _rows(
            kmv_sketch_grouped(union, ["event_type"], F.col("user_id"), k=64)
            .select(F.col("event_type").alias("group_key"), "n_rows", "k_used",
                    "kth_hash", "est_distinct"),
            cols)
    else:
        raise KeyError(name)

    rec["parity"] = got == want
    if not rec["parity"]:
        def flat(x):
            out = []
            stack = [x]
            while stack:
                v = stack.pop()
                if v and isinstance(v[0], list) and v[0] and isinstance(v[0][0], list):
                    stack.extend(v)
                else:
                    out.extend(tuple(map(str, r)) for r in v)
            return out
        gs, ws = flat(got), flat(want)
        gset, wset = set(gs), set(ws)
        rec["err"] = (f"rows stream={len(gs)} batch={len(ws)}; "
                      f"stream-only sample: {sorted(gset - wset)[:3]}; "
                      f"batch-only sample: {sorted(wset - gset)[:3]}")
    return rec


MODULES = ("funnel", "text", "vectors", "ivf", "scd2", "kmv")


def main() -> int:
    args = sys.argv[1:]
    emit = None
    if "--emit" in args:
        i = args.index("--emit")
        emit = args[i + 1]
        del args[i:i + 2]
    base = args[0] if args else "/root/testdata/sf0.001"
    only = args[1].split(",") if len(args) > 1 else MODULES

    from serverless_etl_reporting_pipeline_spark.session import get_spark
    from tools.degenerate_sweep import build_doctored

    doctored = build_doctored(base, os.path.join(OUT, "fixture"))
    workroot = os.path.join(OUT, "run")
    shutil.rmtree(workroot, ignore_errors=True)

    spark = get_spark()
    results, bad = {}, 0
    for m in only:
        try:
            results[m] = run_module(spark, m, doctored, workroot)
        except Exception as e:  # a crash is ALWAYS a finding
            results[m] = {"parity": False, "err": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        ok = results[m]["parity"]
        bad += 0 if ok else 1
        print(f"{'ok  ' if ok else 'FAIL'} {m}: processed={results[m].get('processed')} "
              f"tears={results[m].get('tears', 0)} {'' if ok else results[m]['err']}")
    print(f"\n{len(only) - bad} ok, {bad} fail")
    if emit:
        with open(emit, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {emit}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
