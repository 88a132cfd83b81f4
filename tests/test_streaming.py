"""Structured Streaming slice tests: checkpointed AvailableNow ingest
(exactly-once), watermarked window agg ≡ batch result, custom stateful
operator (SURVEY.md §2.9, §7.1 step 7)."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.sources.reader import load_table
from serverless_etl_reporting_pipeline_spark.sources.schemas import SCHEMAS
from serverless_etl_reporting_pipeline_spark.streaming.ingest import available_now_ingest
from serverless_etl_reporting_pipeline_spark.streaming.windows import running_totals_per_user, windowed_counts


@pytest.fixture()
def events_src(spark, sf_dir, tmp_path):
    """Events split into two 'arrival' file batches in a stream dir."""
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "incoming")
    events.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    return events, src, tmp_path


def test_available_now_ingest_exactly_once(spark, events_src):
    events, src, tmp = events_src
    dest, ckpt = str(tmp / "lake"), str(tmp / "ckpt")
    schema = SCHEMAS["events"]

    available_now_ingest(spark, src, schema, dest, ckpt)
    assert spark.read.parquet(dest).count() == events.filter("event_id % 2 = 0").count()

    # rerun with no new files → nothing reprocessed (checkpoint, not last_run.txt)
    available_now_ingest(spark, src, schema, dest, ckpt)
    n_after_rerun = spark.read.parquet(dest).count()
    assert n_after_rerun == events.filter("event_id % 2 = 0").count()

    # second arrival batch → only the new file is processed
    events.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    available_now_ingest(spark, src, schema, dest, ckpt)
    assert spark.read.parquet(dest).count() == events.count()


def test_streaming_window_equals_batch(spark, events_src):
    events, src, tmp = events_src
    # stream the first batch through a watermarked tumbling window
    stream = spark.readStream.schema(SCHEMAS["events"]).parquet(src)
    # complete mode: append would hold back windows newer than the final
    # watermark (correct streaming behavior, but here we compare totals)
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["total_value"], 2))
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = events.filter("event_id % 2 = 0")
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["total_value"], 2))
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        ).collect()
    }
    assert got == want


def test_stateful_running_totals(spark, events_src):
    events, src, tmp = events_src
    stream = spark.readStream.schema(SCHEMAS["events"]).parquet(src)
    q = (
        running_totals_per_user(stream)
        .writeStream.format("memory")
        .queryName("state_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user must equal the batch aggregate
    got = {
        r["user_id"]: (r["events_seen"], round(r["value_sum"], 2))
        for r in spark.sql(
            "SELECT user_id, events_seen, value_sum FROM state_out"
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 2))
        for r in events.filter("event_id % 2 = 0")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    # memory sink in update mode keeps the latest row per key per batch;
    # with a single batch the totals are final
    assert got == want


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Cross-batch duplicates inside the watermark horizon are dropped
    exactly once; state is bounded by the watermark (SURVEY.md §2.6/§2.9)."""
    from datetime import datetime, timedelta

    from serverless_etl_reporting_pipeline_spark.streaming.windows import dedup_within_watermark

    src = str(tmp_path / "dup_src")
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    t = datetime(2024, 3, 1, 10, 0, 0)

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    # batch 1 carries an in-batch duplicate of event 1
    write_batch(
        [
            (1, t, 1, "view", 1.0),
            (1, t, 1, "view", 1.0),
            (2, t + timedelta(minutes=5), 2, "view", 1.0),
        ]
    )

    dest, ckpt = str(tmp_path / "dup_out"), str(tmp_path / "dup_ckpt")

    def run():
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = (
            dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", dest)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # batch 2: a cross-batch duplicate of event 2 (within the horizon) + a new row
    write_batch(
        [
            (2, t + timedelta(minutes=6), 2, "view", 99.0),
            (3, t + timedelta(minutes=10), 3, "click", 1.0),
        ]
    )
    run()

    out = spark.read.parquet(dest).collect()
    ids = sorted(r["event_id"] for r in out)
    assert ids == [1, 2, 3], f"duplicates must be dropped exactly once, got {ids}"


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    """Stream-stream watermarked interval join over the real events data
    must emit exactly the batch interval-join pairs (SURVEY.md §2.9)."""
    from serverless_etl_reporting_pipeline_spark.operators.rangejoin import interval_join
    from serverless_etl_reporting_pipeline_spark.streaming.joins import stream_interval_join

    events = load_table(spark, sf_dir, "events").filter("user_id < 20")
    errors = events.filter("event_type = 'error'").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    clicks = events.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    err_dir, clk_dir = str(tmp_path / "err"), str(tmp_path / "clk")
    errors.coalesce(1).write.parquet(err_dir)
    clicks.coalesce(1).write.parquet(clk_dir)

    se = spark.readStream.schema(errors.schema).parquet(err_dir)
    sc = spark.readStream.schema(clicks.schema).parquet(clk_dir)
    q = (
        stream_interval_join(se, sc, key="user_id", left_ts="ts", right_ts="cts",
                             span_seconds=300, watermark="10 minutes")
        .select("error_id", "click_id")
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["error_id"], r["click_id"]) for r in spark.sql("SELECT * FROM ssj_out").collect()}
    want = {
        (r["error_id"], r["click_id"])
        for r in interval_join(errors, clicks, on=["user_id"], left_ts="ts",
                               right_ts="cts", lower_us=-300_000_000, upper_us=0).collect()
    }
    assert want, "fixture should produce matches"
    assert got == want


def test_watermark_drops_late_data(spark, sf_dir, tmp_path):
    """Append-mode windows must finalize once the watermark passes, and
    a row arriving later with an older event time must NOT reopen them —
    the principled fix for the reference's +1s-bump data loss
    (extract.py:50-57, SURVEY.md §2.9)."""
    from datetime import datetime, timedelta

    src = str(tmp_path / "late_src")
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    t = datetime(2024, 3, 1, 10, 0, 0)
    # batch 1: two rows in the 10:00 window, one at 14:00 (advances the
    # watermark far past 10:00 + 1h once processed)
    write_batch(
        [
            (1, t, 1, "view", 1.0),
            (2, t + timedelta(minutes=10), 1, "view", 1.0),
            (3, t + timedelta(hours=4), 1, "view", 1.0),
        ],
        "b1",
    )

    dest = str(tmp_path / "late_out")

    def run():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = (
            windowed_counts(stream, window="1 hour", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", dest)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # batch 2: a LATE row for the long-closed 10:00 window
    write_batch([(4, t + timedelta(minutes=5), 1, "view", 99.0)], "b2")
    # and a fresh row so the batch isn't empty
    write_batch([(5, t + timedelta(hours=6), 1, "view", 1.0)], "b3")
    run()

    out = spark.read.parquet(dest).collect()
    rows = {}
    for r in out:
        assert r["window_start"] not in rows, "window emitted twice"
        rows[r["window_start"]] = r["n_events"]
    # the 10:00 window was emitted with exactly the 2 on-time rows; the
    # late row (id 4) was dropped, not double-counted
    assert rows[t] == 2


def test_streaming_kmv_equals_batch(spark, events_src):
    """The stateful streaming KMV, drained over two file micro-batches,
    must land on EXACTLY the batch sketch of the union — same k-min
    state, same integer estimate."""
    from serverless_etl_reporting_pipeline_spark.operators.sketch import kmv_sketch_grouped
    from serverless_etl_reporting_pipeline_spark.streaming.sketches import streaming_kmv_by_group

    events, src, tmp = events_src
    # second arrival batch → at least two micro-batch state merges
    events.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMAS["events"]).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_kmv_by_group(stream, "event_type", F.col("user_id"), k=64)
        .writeStream.format("memory")
        .queryName("kmv_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp / "kmv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM kmv_out").collect()
    assert len(rows) > len({r["group_key"] for r in rows}), "expected >1 micro-batch of updates"
    latest = {}
    for r in rows:  # update mode: last emission per group wins
        if r["group_key"] not in latest or r["n_rows"] > latest[r["group_key"]]["n_rows"]:
            latest[r["group_key"]] = r
    got = {
        g: (r["n_rows"], r["k_used"], r["kth_hash"], r["est_distinct"])
        for g, r in latest.items()
    }
    want = {
        r["event_type"]: (r["n_rows"], r["k_used"], r["kth_hash"], r["est_distinct"])
        for r in kmv_sketch_grouped(events, ["event_type"], F.col("user_id"), k=64).collect()
    }
    assert got == want


def test_streaming_funnel_equals_batch(spark, sf_dir, tmp_path):
    """THE streaming capstone: the pipe01/pipe02 curation funnel drained
    as a checkpointed AvailableNow job over two document micro-batches
    must produce EXACTLY the per-document (q, dd, clean) annotations of
    one batch run over the union (benchmark frozen at the first
    snapshot) — and a re-drain with no new files processes nothing
    (checkpoint, not last_run.txt)."""
    from serverless_etl_reporting_pipeline_spark.operators.funnel import (
        annotate_batch,
        shingle_set,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        funnel_table,
        incremental_funnel_drain,
    )

    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    wm = int(0.8 * (max_id + 1))
    src, work = str(tmp_path / "docs_src"), str(tmp_path / "funnel_work")

    docs.filter(f"doc_id < {wm}").coalesce(1).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, docs.schema, work) == 1
    docs.filter(f"doc_id >= {wm}").coalesce(1).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, docs.schema, work) == 1
    assert incremental_funnel_drain(spark, src, docs.schema, work) == 0

    got_ann = {
        r["doc_id"]: (r["q"], r["dd"], r["clean"])
        for r in spark.read.parquet(f"{work}/funnel_ann/batch=*").collect()
    }

    # batch twin: ONE application of the same shared stage over the
    # union, benchmark frozen at wm — drain-composition must equal it
    ev = (F.col("doc_id") < wm) & F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1")
    sh = shingle_set(docs)
    hold = sh.filter(ev).select("s").distinct()
    want_ann = {
        r["doc_id"]: (r["q"], r["dd"], r["clean"])
        for r in annotate_batch(docs, hold, ev=ev, shingle_frame=sh).collect()
    }
    assert len(got_ann) == docs.count()
    assert got_ann == want_ann
    # the quality and decontamination/benchmark stages actually dropped
    # docs (the fixture has no byte-identical texts, so exact dedup is
    # exercised only as a pass-through here — its cross-batch semantics
    # are pinned by the per-doc map equality above and by pipe02's oracle)
    assert any(not q for q, _, _ in want_ann.values())
    assert any(d and not c for _, d, c in want_ann.values())
    # the cumulative funnel table reads back consistently
    ft = funnel_table(spark, work).collect()
    assert sum(r["n_raw"] for r in ft) == len(got_ann)
    assert sum(r["n_clean"] for r in ft) == sum(1 for v in want_ann.values() if v[2])
    # FULL-pipeline parity including the mixture-draw stage: the report
    # computed purely from streamed state (lake counts + latest batch)
    # must equal pipe02's batch computation on ALL columns — n_raw,
    # n_quality, n_dedup, n_clean, cum_clean, target_docs, n_selected
    from serverless_etl_reporting_pipeline_spark.plans.pipeline import (
        _PIPE2_BUDGET,
        pipe02_incremental_funnel,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        incremental_mixture_report,
    )

    got_rep = [
        r.asDict()
        for r in incremental_mixture_report(spark, work, budget=_PIPE2_BUDGET).collect()
    ]
    want_rep = [r.asDict() for r in pipe02_incremental_funnel(spark, sf_dir).collect()]
    assert got_rep == want_rep
    assert sum(r["n_selected"] for r in got_rep) > 0  # the draw actually drew


def test_streaming_funnel_cross_batch_dedup_and_decontamination(spark, tmp_path):
    """Synthetic corpus forcing the cross-batch state hits the fixture
    lacks: a batch-2 doc byte-identical to a batch-1 doc must lose
    keep-first dedup against the STORED hash index, and a batch-2 doc
    sharing an 8-gram with the frozen benchmark must be contaminated."""
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        incremental_funnel_drain,
    )

    # doc 0 hits the md5-prefix benchmark split (md5('0') = 'cf...'? —
    # choose ids empirically: md5('1')='c4..', we need prefix '0'/'1');
    # id 6 has md5('6')='16...' -> benchmark member
    good = " ".join(f"tok{i} and the of to is in a" for i in range(8))  # quality-passing
    uniq = " ".join(f"zzz{i} and the of to is in a" for i in range(8))
    rows1 = [(6, "s", "en", good), (7, "s", "en", uniq)]
    # batch 2: id 10 duplicates doc 7's text exactly (cross-batch dedup
    # hit); id 11 shares doc 6's text (contaminated vs frozen benchmark);
    # id 12 is novel and clean
    fresh = " ".join(f"qqq{i} and the of to is in a" for i in range(8))
    rows2 = [(10, "s", "en", uniq), (11, "s", "en", good), (12, "s", "en", fresh)]
    schema = "doc_id long, source string, lang string, text string"
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    import hashlib
    assert hashlib.md5(b"6").hexdigest()[0] in "01", "doc 6 must be a benchmark member"
    assert hashlib.md5(b"7").hexdigest()[0] not in "01"

    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    d1 = spark.createDataFrame(rows1, schema)
    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1

    ann = {
        r["doc_id"]: (r["q"], r["dd"], r["clean"])
        for r in spark.read.parquet(f"{work}/funnel_ann/batch=*").collect()
    }
    assert ann[6] == (True, True, False)  # benchmark member: never training data
    assert ann[7] == (True, True, True)
    assert ann[10] == (True, False, False)  # lost dedup to stored hash of doc 7
    assert ann[11] == (True, False, False)  # dup of 6 AND contaminated
    assert ann[12] == (True, True, True)


def test_streaming_funnel_state_format_guard(spark, tmp_path):
    """The r11 ADVICE state-format break: a seen-hashes index persisted
    under the pre-casefold hash space (md5(lower(text))) must not be
    silently consulted by a casefold-keyed drain — previously-seen docs
    containing a casefold-divergent code point would be re-admitted
    with no detection. The drain now version-tags the work_dir
    (`_state_format=<token>`) and REFUSES unversioned or mismatched
    state with a rebuild instruction."""
    import pytest

    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        FUNNEL_STATE_FORMAT,
        incremental_funnel_drain,
    )

    good = " ".join(f"tok{i} and the of to is in a" for i in range(8))
    schema = "doc_id long, source string, lang string, text string"
    src = str(tmp_path / "src")
    spark.createDataFrame([(6, "s", "en", good)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    d = spark.createDataFrame([(6, "s", "en", good)], schema)

    # fresh work_dir: drain succeeds and stamps the current token
    work = tmp_path / "work"
    assert incremental_funnel_drain(spark, src, d.schema, str(work)) == 1
    assert (work / f"_state_format={FUNNEL_STATE_FORMAT}").exists()
    # re-drain on correctly-stamped state: fine (no new files -> 0 batches)
    assert incremental_funnel_drain(spark, src, d.schema, str(work)) == 0

    # UNVERSIONED prior state (pre-r12 layout): refused, not consulted
    legacy = tmp_path / "legacy"
    (legacy / "state_hashes" / "batch=0").mkdir(parents=True)
    with pytest.raises(RuntimeError, match="unversioned"):
        incremental_funnel_drain(spark, src, d.schema, str(legacy))

    # MISMATCHED token (a future format bump): refused, both tokens named
    other = tmp_path / "other"
    other.mkdir()
    (other / "_state_format=v1-md5-lower").touch()
    with pytest.raises(RuntimeError, match="v1-md5-lower"):
        incremental_funnel_drain(spark, src, d.schema, str(other))


def test_stateful_drain_format_guards_cover_all_modules(spark, tmp_path):
    """r12 ADVICE: EVERY stateful drain versions its work_dir the way
    the funnel does (not just the casefold-hash module the r11 guard
    was built for), and the token embeds the drain's geometry
    parameters — so a dir drained with different knobs (band count,
    sketch capacity, CDC event type, LSH seed) is refused with a
    rebuild instruction instead of silently merging incompatible
    state. The guard fires BEFORE any stream starts, so a bogus marker
    is enough to pin each module's coverage."""
    import pytest

    from pyspark.sql import types as T
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        incremental_ivf_ingest_drain,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        incremental_text_dedup_drain,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        incremental_scd2_drain,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.sketches import kmv_drain
    from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
        incremental_vector_dedup_drain,
    )

    dschema = T.StructType([T.StructField("doc_id", T.LongType())])
    src = str(tmp_path / "nosrc")  # never read: the guard fires first
    drains = {
        "text": lambda wd: incremental_text_dedup_drain(spark, src, dschema, wd),
        "vectors": lambda wd: incremental_vector_dedup_drain(spark, src, dschema, wd),
        "ivf": lambda wd: incremental_ivf_ingest_drain(spark, src, dschema, wd),
        "scd2": lambda wd: incremental_scd2_drain(spark, src, dschema, wd),
        "kmv": lambda wd: kmv_drain(spark, src, dschema, wd, "g", F.lit(1), k=64),
    }
    for name, drain in drains.items():
        wd = tmp_path / name
        wd.mkdir()
        (wd / "_state_format=bogus-token").touch()
        with pytest.raises(RuntimeError, match="bogus-token"):
            drain(str(wd))

    # the PARAMETERIZED half of the contract, driven end-to-end on the
    # text module: a real drain stamps the geometry-bearing token, and
    # re-draining the same dir with a different band count is refused
    # naming both tokens
    ta = "the quick brown fox jumps over the lazy dog again and again"
    real_src = str(tmp_path / "src")
    spark.createDataFrame([(0, ta)], "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(real_src)
    d = spark.createDataFrame([(0, ta)], "doc_id long, text string")
    work = tmp_path / "textwork"
    assert incremental_text_dedup_drain(spark, real_src, d.schema, str(work)) == 1
    assert (work / "_state_format=v3-xxh64shingleids-bandfan64-h64-b32-k3-j0.5").exists()
    with pytest.raises(RuntimeError, match="b16"):
        incremental_text_dedup_drain(spark, real_src, d.schema, str(work), bands=16)


def test_streaming_funnel_replay_idempotent(spark, tmp_path):
    """Checkpoint-recovery replay: a micro-batch whose OWN ``batch=<id>``
    state dirs were already written by a failed prior attempt (crash after
    the writes, before the checkpoint commit) must overwrite them and emit
    the SAME annotations — its quality docs must not be anti-joined away
    by their own replayed hashes."""
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        incremental_funnel_drain,
    )

    good = " ".join(f"tok{i} and the of to is in a" for i in range(8))
    uniq = " ".join(f"zzz{i} and the of to is in a" for i in range(8))
    fresh = " ".join(f"qqq{i} and the of to is in a" for i in range(8))
    rows1 = [(6, "s", "en", good), (7, "s", "en", uniq)]
    rows2 = [(10, "s", "en", uniq), (12, "s", "en", fresh)]
    schema = "doc_id long, source string, lang string, text string"
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    d1 = spark.createDataFrame(rows1, schema)
    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1

    # stage batch 2's file, then fake the failed first attempt: its own
    # hash-state and annotation dirs already on disk under batch=1
    d2 = spark.createDataFrame(rows2, schema)
    d2.coalesce(1).write.mode("append").parquet(src)
    from serverless_etl_reporting_pipeline_spark.operators.funnel import quality_hash

    d2.select(quality_hash().alias("h")).distinct().write.mode(
        "overwrite"
    ).parquet(f"{work}/state_hashes/batch=1")
    d2.select(
        "doc_id", "source", "lang",
        F.lit(False).alias("q"), F.lit(False).alias("dd"), F.lit(False).alias("clean"),
    ).write.mode("overwrite").parquet(f"{work}/funnel_ann/batch=1")

    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1
    ann = {
        r["doc_id"]: (r["q"], r["dd"], r["clean"])
        for r in spark.read.parquet(f"{work}/funnel_ann/batch=*").collect()
    }
    # doc 10 still loses keep-first to the STORED batch-0 hash of doc 7;
    # doc 12 survives — it must NOT be deduped against its own replayed
    # hash, and the failed attempt's all-False annotations are overwritten
    assert ann[10] == (True, False, False)
    assert ann[12] == (True, True, True)


def test_prior_hash_state_propagates_corruption(spark, tmp_path):
    """A corrupt (non-parquet) hash-state dir must raise, not silently
    disable cross-batch dedup; a missing dir or no prior batches is None."""
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import _prior_hash_state

    hashes_dir = str(tmp_path / "state_hashes")
    assert _prior_hash_state(spark, hashes_dir, 1) is None
    import os

    os.makedirs(f"{hashes_dir}/batch=0")
    with open(f"{hashes_dir}/batch=0/part-0.parquet", "w") as f:
        f.write("not parquet")
    assert _prior_hash_state(spark, hashes_dir, 0) is None  # own batch excluded
    with pytest.raises(Exception):
        _prior_hash_state(spark, hashes_dir, 1).collect()


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# texts drawn from a small pool force duplicate hashes and shared
# shingles across arbitrary batch boundaries
_POOL = [
    " ".join(f"w{p}{i} and the of to is in a" for i in range(8)) for p in range(6)
]
_DOCS = st.lists(
    st.integers(min_value=0, max_value=len(_POOL) - 1), min_size=2, max_size=24
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(picks=_DOCS, cut=st.integers(min_value=0, max_value=100))
def test_annotate_batch_split_equals_union_property(spark, picks, cut):
    """THE incremental contract as a property: for ANY corpus (dup-heavy
    by construction) and ANY split point, annotating base then delta
    against the base's state (hold index + quality hashes) equals one
    annotate over the union with the benchmark frozen at the split —
    doc ids monotone across batches, exactly the watermark-extract
    regime pipe02 and the streaming funnel run in."""
    from serverless_etl_reporting_pipeline_spark.operators.funnel import (
        annotate_batch,
        quality_hashes,
        shingle_set,
    )

    rows = [(i, "s", "en", _POOL[p]) for i, p in enumerate(picks)]
    wm = min(max(1, cut % len(rows)), len(rows) - 1)  # both sides non-empty
    schema = "doc_id long, source string, lang string, text string"
    docs = spark.createDataFrame(rows, schema)
    base = spark.createDataFrame(rows[:wm], schema)
    delta = spark.createDataFrame(rows[wm:], schema)

    ev_u = (F.col("doc_id") < wm) & F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1")
    want = {
        r["doc_id"]: (r["q"], r["dd"], r["clean"])
        for r in annotate_batch(docs, shingle_set(docs).filter(ev_u).select("s").distinct(),
                                ev=ev_u).collect()
    }

    ev_b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    hold = shingle_set(base).filter(ev_b).select("s").distinct()
    got = {
        r["doc_id"]: (r["q"], r["dd"], r["clean"])
        for r in annotate_batch(base, hold, ev=ev_b).collect()
    }
    got.update(
        {
            r["doc_id"]: (r["q"], r["dd"], r["clean"])
            for r in annotate_batch(
                delta, hold, seen_hashes=quality_hashes(base)
            ).collect()
        }
    )
    assert got == want


def test_streaming_vector_dedup_equals_batch_probe(spark, sf_dir, tmp_path):
    """The embedding twin of the funnel capstone: draining vector
    micro-batches through the on-disk band index must give each batch
    EXACTLY the annotations of neardup_vector_index_probe(prior
    batches, batch) — the operator v12's oracle pins — and a re-drain
    with no new files processes nothing."""
    from serverless_etl_reporting_pipeline_spark.operators.vectors import (
        neardup_vector_index_probe,
    )
    from serverless_etl_reporting_pipeline_spark.plans.vectors import (
        _V09_BANDS,
        _V09_BITS,
        _V09_SEED,
        _V12_TAU,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
        incremental_vector_dedup_drain,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    wm = int(0.8 * (max_id + 1))
    src, work = str(tmp_path / "vec_src"), str(tmp_path / "vec_work")
    kw = dict(
        threshold=float(_V12_TAU), n_bits=_V09_BITS, bands=_V09_BANDS, seed=_V09_SEED
    )

    # explicit dim= pins the code space without the per-micro-batch
    # modal _dim_of job (r9 watch item); it must land the drain on the
    # exact annotations of the dim-inferring batch operator below
    dim = len(emb.select("embedding").first()[0])
    kw["dim"] = dim

    # prove the modal aggregate is SKIPPED when dim is explicit: any
    # _dim_of call inside the drain would trip this sentinel
    import serverless_etl_reporting_pipeline_spark.streaming.vectors as sv

    def _boom(*a, **k):  # pragma: no cover - sentinel
        raise AssertionError("_dim_of ran despite explicit dim=")

    real_dim_of, sv._dim_of = sv._dim_of, _boom

    # try/finally: a failing drain must not leave the module poisoned
    # for every later test in the session (r10 ADVICE)
    try:
        base = emb.filter(f"vec_id < {wm}")
        delta = emb.filter(f"vec_id >= {wm}")
        base.coalesce(1).write.mode("append").parquet(src)
        assert incremental_vector_dedup_drain(spark, src, emb.schema, work, **kw) == 1
        delta.coalesce(1).write.mode("append").parquet(src)
        assert incremental_vector_dedup_drain(spark, src, emb.schema, work, **kw) == 1
        assert incremental_vector_dedup_drain(spark, src, emb.schema, work, **kw) == 0
    finally:
        sv._dim_of = real_dim_of

    # batch 0: no prior state — nothing may be flagged
    b0 = spark.read.parquet(f"{work}/vec_ann/batch=0")
    assert b0.count() == base.count() and b0.filter("is_dup").count() == 0
    # batch 1 must equal the v12-oracle-pinned operator on (base, delta)
    got = {
        r["vec_id"]: (r["is_dup"], r["dup_src"], r["cos"])
        for r in spark.read.parquet(f"{work}/vec_ann/batch=1").collect()
    }
    want = {
        r["vec_id"]: (r["is_dup"], r["dup_src"], r["cos"])
        for r in neardup_vector_index_probe(base, delta, **kw).collect()
    }
    assert got == want
    assert any(v[0] for v in want.values()), "fixture should contain cross-side near-dups"


def test_streaming_vector_dedup_replay_idempotent(spark, tmp_path):
    """Checkpoint-recovery replay for the vector module: a micro-batch
    whose OWN index segment and annotations were written by a failed
    prior attempt must overwrite them and must NOT flag its vectors as
    duplicates of themselves via its own replayed segment."""
    import numpy as np

    from serverless_etl_reporting_pipeline_spark.operators.vectors import (
        _band_code_fan,
        random_hyperplanes,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
        incremental_vector_dedup_drain,
    )

    schema = "vec_id long, embedding array<float>"
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    d1 = spark.createDataFrame([(0, v)], schema)
    d2 = spark.createDataFrame([(10, v), (11, w)], schema)  # 10 dups batch-0's vector
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    kw = dict(threshold=0.9, n_bits=8, bands=4, seed=7)

    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_vector_dedup_drain(spark, src, d1.schema, work, **kw) == 1

    # stage batch 2, then fake its failed first attempt on disk
    d2.coalesce(1).write.mode("append").parquet(src)
    P = np.array(random_hyperplanes(8, 4, 7), dtype=np.float64)
    _band_code_fan(d2, P, 4, 2, "vec_id", "embedding").write.mode("overwrite").parquet(
        f"{work}/band_index/batch=1"
    )
    d2.select(
        F.col("vec_id"), F.lit(True).alias("is_dup"),
        F.lit(999).cast("long").alias("dup_src"), F.lit(0.0).alias("cos"),
    ).write.mode("overwrite").parquet(f"{work}/vec_ann/batch=1")

    assert incremental_vector_dedup_drain(spark, src, d1.schema, work, **kw) == 1
    ann = {
        r["vec_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/vec_ann/batch=*").collect()
    }
    # 10 dups the STORED batch-0 vector; 11 must NOT be flagged against
    # its own replayed segment, and the garbage annotations are gone
    assert ann[0] == (False, None)
    assert ann[10] == (True, 0)
    assert ann[11] == (False, None)


def test_streaming_ivf_ingest_equals_batch_assign(spark, sf_dir, tmp_path):
    """The SEARCH twin of the vector-dedup drain: growing the on-disk
    IVF index one micro-batch at a time must leave EXACTLY the postings
    of assign_cells(frozen centroids, union of all batches), and a
    probe of the streamed index must equal the batch-built probe."""
    from serverless_etl_reporting_pipeline_spark.operators.vectors import (
        assign_cells,
        ivf_batch_probe,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        incremental_ivf_ingest_drain,
        load_ivf_state,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus, queries = emb.filter("vec_id >= 10"), emb.filter("vec_id < 10")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    cut = int(0.6 * (max_id + 1))
    src, work = str(tmp_path / "ivf_src"), str(tmp_path / "ivf_work")

    corpus.filter(f"vec_id < {cut}").coalesce(1).write.mode("append").parquet(src)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 1
    corpus.filter(f"vec_id >= {cut}").coalesce(1).write.mode("append").parquet(src)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 1
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 0

    cent, postings = load_ivf_state(spark, work)
    got = {(r["_cell"], r["_id"]) for r in postings.collect()}
    want = {(r["_cell"], r["_id"]) for r in assign_cells(cent, corpus).collect()}
    assert got == want and len(got) == corpus.count()

    q = queries.select(F.col("vec_id").alias("qid"), "embedding")
    streamed = ivf_batch_probe(cent, postings, q, k=3, nprobe=2).collect()
    batch = ivf_batch_probe(cent, assign_cells(cent, corpus), q, k=3, nprobe=2).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
    assert len(streamed) == 10 * 3


def test_streaming_ivf_compaction_preserves_state(spark, sf_dir, tmp_path):
    """compact_ivf_segments folds segments into one cell-partitioned
    parquet; loaders must read compacted + later tail with no loss and
    no double-counting, across multiple compactions."""
    from serverless_etl_reporting_pipeline_spark.operators.vectors import assign_cells
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        compact_ivf_segments,
        incremental_ivf_ingest_drain,
        load_ivf_state,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter("vec_id >= 10")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    c1, c2 = int(0.4 * max_id), int(0.7 * max_id)
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    emb.filter(f"vec_id < {c1}").coalesce(1).write.mode("append").parquet(src)
    emb.filter(f"vec_id >= {c1} and vec_id < {c2}").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 2
    assert compact_ivf_segments(spark, work) == 1

    emb.filter(f"vec_id >= {c2}").coalesce(1).write.mode("append").parquet(src)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 1

    cent, postings = load_ivf_state(spark, work)
    want = {(r["_cell"], r["_id"]) for r in assign_cells(cent, emb).collect()}
    assert {(r["_cell"], r["_id"]) for r in postings.collect()} == want
    assert postings.count() == emb.count()  # no double-read of folded segments

    # a second compaction supersedes the first; state is unchanged
    assert compact_ivf_segments(spark, work) == 2
    _, postings2 = load_ivf_state(spark, work)
    assert {(r["_cell"], r["_id"]) for r in postings2.collect()} == want
    assert postings2.count() == emb.count()


def test_streaming_ivf_replay_idempotent_and_frozen_centroids(spark, tmp_path):
    """A replayed micro-batch overwrites its own garbage posting
    segment; the quantizer stays frozen at batch 0's centroids; a
    zero-norm arrival is quarantined in cell -1."""
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        incremental_ivf_ingest_drain,
        load_ivf_state,
    )

    schema = "vec_id long, embedding array<float>, label long"
    b0 = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 0), (1, [0.0, 1.0, 0.0, 0.0], 1)], schema
    )
    # 10 → cell 0, 11 → cell 1, 12 zero-norm → quarantine; labels here
    # are DELIBERATELY wrong: post-freeze arrivals are filed by nearest
    # centroid, their label column is ignored
    b1 = spark.createDataFrame(
        [
            (10, [0.9, 0.1, 0.0, 0.0], 1),
            (11, [0.0, 0.8, 0.2, 0.0], 0),
            (12, [0.0, 0.0, 0.0, 0.0], 0),
        ],
        schema,
    )
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    b0.coalesce(1).write.mode("append").parquet(src)
    assert incremental_ivf_ingest_drain(spark, src, b0.schema, work) == 1
    frozen = sorted(tuple(r) for r in spark.read.parquet(f"{work}/centroids").collect())

    # stage batch 1, then fake its failed first attempt on disk
    b1.coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(99, 99, [0.0])], "_cell long, _id long, _qv array<double>"
    ).write.mode("overwrite").parquet(f"{work}/postings/batch=1")

    assert incremental_ivf_ingest_drain(spark, src, b0.schema, work) == 1
    assert (
        sorted(tuple(r) for r in spark.read.parquet(f"{work}/centroids").collect())
        == frozen
    )
    _, postings = load_ivf_state(spark, work)
    cells = {r["_id"]: r["_cell"] for r in postings.collect()}
    assert cells == {0: 0, 1: 1, 10: 0, 11: 1, 12: -1}


def test_streaming_ivf_refresh_epoch_swap(spark, sf_dir, tmp_path):
    """refresh_ivf_state = one quiesced Lloyd step + epoch swap: the
    committed epoch's quantizer equals lloyd_refresh over the state it
    covered, later drains assign with it, compaction folds only the
    post-epoch tail, and the loaded state equals assign_cells(epoch
    centroids, union of ALL ingested batches)."""
    from serverless_etl_reporting_pipeline_spark.operators.vectors import (
        assign_cells,
        ivf_batch_probe,
        lloyd_refresh,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        compact_ivf_segments,
        incremental_ivf_ingest_drain,
        load_ivf_state,
        refresh_ivf_state,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter("vec_id >= 10")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    c1, c2 = int(0.4 * max_id), int(0.7 * max_id)
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    assert refresh_ivf_state(spark, work) is None  # no state yet
    emb.filter(f"vec_id < {c1}").coalesce(1).write.mode("append").parquet(src)
    emb.filter(f"vec_id >= {c1} and vec_id < {c2}").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 2
    assert refresh_ivf_state(spark, work) == 1
    assert refresh_ivf_state(spark, work) is None  # nothing new since epoch 1

    # the swapped quantizer IS one Lloyd step over what it covered
    frozen = spark.read.parquet(f"{work}/centroids")
    got_cent = spark.read.parquet(f"{work}/refresh/epoch=1/centroids")
    want_cent = lloyd_refresh(frozen, emb.filter(f"vec_id < {c2}"))
    as_map = lambda df: {r[0]: [float(x) for x in r[1]] for r in df.collect()}
    assert as_map(got_cent) == as_map(want_cent)

    # post-epoch drain assigns with the refreshed quantizer
    emb.filter(f"vec_id >= {c2}").coalesce(1).write.mode("append").parquet(src)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 1
    cent_e, postings = load_ivf_state(spark, work)
    assert as_map(cent_e) == as_map(want_cent)
    pairs = lambda df: {(r["_cell"], r["_id"]) for r in df.collect()}
    want_post = assign_cells(cent_e, emb)
    assert pairs(postings) == pairs(want_post)
    assert postings.count() == emb.count()  # disjoint tiling, no double-read

    # compaction after the epoch folds ONLY the post-epoch tail
    assert compact_ivf_segments(spark, work) == 2
    _, post2 = load_ivf_state(spark, work)
    assert pairs(post2) == pairs(want_post) and post2.count() == emb.count()

    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter("vec_id < 10")
        .select(F.col("vec_id").alias("qid"), "embedding")
    )
    streamed = ivf_batch_probe(cent_e, post2, q, k=3, nprobe=2).collect()
    batch = ivf_batch_probe(cent_e, want_post, q, k=3, nprobe=2).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_streaming_ivf_uncommitted_epoch_invisible(spark, tmp_path):
    """A refresh that crashed before its _COMMITTED marker must be
    invisible: drains keep the frozen quantizer, loaders keep the
    segment state, and a re-run refresh overwrites the dir."""
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        incremental_ivf_ingest_drain,
        load_ivf_state,
        refresh_ivf_state,
    )

    schema = "vec_id long, embedding array<float>, label long"
    b0 = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 1)], schema
    )
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    b0.coalesce(1).write.mode("append").parquet(src)
    assert incremental_ivf_ingest_drain(spark, src, b0.schema, work) == 1

    # fake a crashed refresh: epoch dir with garbage, NO _COMMITTED
    spark.createDataFrame([(77, [9.0, 9.0])], "_cell long, cv array<double>").write.mode(
        "overwrite"
    ).parquet(f"{work}/refresh/epoch=0/centroids")
    spark.createDataFrame(
        [(77, 77, [9.0, 9.0])], "_cell long, _id long, _qv array<double>"
    ).write.mode("overwrite").parquet(f"{work}/refresh/epoch=0/postings")

    cent, postings = load_ivf_state(spark, work)
    assert {r["_id"] for r in postings.collect()} == {0, 1}
    assert {r[0] for r in cent.collect()} == {0, 1}  # frozen quantizer

    # re-running the refresh overwrites the garbage and commits
    assert refresh_ivf_state(spark, work) == 0
    cent2, post2 = load_ivf_state(spark, work)
    assert {r[0] for r in cent2.collect()} == {0, 1}
    assert {(r["_cell"], r["_id"]) for r in post2.collect()} == {(0, 0), (1, 1)}


def test_streaming_ivf_crashed_maintenance_dirs_ignored(spark, tmp_path):
    """Durability of the maintenance surface: a compaction dir without
    _SUCCESS (crashed fold) is invisible to loaders and healed by the
    next compact; a partial posting segment without _SUCCESS is never
    folded or refreshed over, so the stream's replay can still heal it."""
    import os

    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        compact_ivf_segments,
        incremental_ivf_ingest_drain,
        load_ivf_state,
        refresh_ivf_state,
    )

    schema = "vec_id long, embedding array<float>, label long"
    b0 = spark.createDataFrame([(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 1)], schema)
    b1 = spark.createDataFrame([(2, [0.9, 0.1], 0)], schema)
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    b0.coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_ivf_ingest_drain(spark, src, b0.schema, work) == 2

    # crashed compaction: parquet written but _SUCCESS removed
    spark.createDataFrame(
        [(99, 99, [9.0, 9.0])], "_cell long, _id long, _qv array<double>"
    ).write.partitionBy("_cell").mode("overwrite").parquet(
        f"{work}/postings_compacted/upto=1"
    )
    os.remove(f"{work}/postings_compacted/upto=1/_SUCCESS")
    _, postings = load_ivf_state(spark, work)
    assert {r["_id"] for r in postings.collect()} == {0, 1, 2}
    # the next compact heals it (same span, but the crashed dir doesn't
    # trigger the idempotent short-circuit — it never committed)
    assert compact_ivf_segments(spark, work) == 1
    _, post2 = load_ivf_state(spark, work)
    assert {r["_id"] for r in post2.collect()} == {0, 1, 2}
    # committed span already folded -> idempotent no-op, same answer
    assert compact_ivf_segments(spark, work) == 1

    # partial posting segment (crashed drain write): invisible to
    # refresh (epoch floor stays at the committed max) and loaders
    spark.createDataFrame(
        [(77, 77, [9.0, 9.0])], "_cell long, _id long, _qv array<double>"
    ).write.mode("overwrite").parquet(f"{work}/postings/batch=7")
    os.remove(f"{work}/postings/batch=7/_SUCCESS")
    assert refresh_ivf_state(spark, work) == 1  # not 7
    cent, post3 = load_ivf_state(spark, work)
    assert {r["_id"] for r in post3.collect()} == {0, 1, 2}


def test_streaming_vector_dedup_compaction_preserves_probes(spark, sf_dir, tmp_path):
    """compact_band_index folds segments with a row-level _bid tag;
    probes of later batches must see exactly the same prior state as
    the uncompacted layout (batch ann ≡ the v12-oracle-pinned operator
    over the folded prior batches)."""
    from serverless_etl_reporting_pipeline_spark.operators.vectors import (
        neardup_vector_index_probe,
    )
    from serverless_etl_reporting_pipeline_spark.plans.vectors import (
        _V09_BANDS,
        _V09_BITS,
        _V09_SEED,
        _V12_TAU,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
        compact_band_index,
        incremental_vector_dedup_drain,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    c1, c2 = int(0.5 * max_id), int(0.8 * max_id)
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    kw = dict(
        threshold=float(_V12_TAU), n_bits=_V09_BITS, bands=_V09_BANDS, seed=_V09_SEED
    )

    emb.filter(f"vec_id < {c1}").coalesce(1).write.mode("append").parquet(src)
    emb.filter(f"vec_id >= {c1} and vec_id < {c2}").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert incremental_vector_dedup_drain(spark, src, emb.schema, work, **kw) == 2
    assert compact_band_index(spark, work) == 1
    assert compact_band_index(spark, work) == 1  # idempotent no-op

    emb.filter(f"vec_id >= {c2}").coalesce(1).write.mode("append").parquet(src)
    assert incremental_vector_dedup_drain(spark, src, emb.schema, work, **kw) == 1

    got = {
        r["vec_id"]: (r["is_dup"], r["dup_src"], r["cos"])
        for r in spark.read.parquet(f"{work}/vec_ann/batch=2").collect()
    }
    want = {
        r["vec_id"]: (r["is_dup"], r["dup_src"], r["cos"])
        for r in neardup_vector_index_probe(
            emb.filter(f"vec_id < {c2}"), emb.filter(f"vec_id >= {c2}"), **kw
        ).collect()
    }
    assert got == want
    assert any(v[0] for v in want.values()), "fixture should contain cross-side near-dups"


def test_streaming_vector_dedup_replay_after_compaction_excludes_self(spark, tmp_path):
    """The hard replay case compaction could break: a batch's OWN
    committed segment is folded into the compaction before the
    checkpoint-recovery replay. The row-level _bid filter must still
    exclude the batch's own rows — its vectors may not be flagged as
    duplicates of themselves."""
    import numpy as np

    from serverless_etl_reporting_pipeline_spark.operators.vectors import (
        _band_code_fan,
        random_hyperplanes,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
        compact_band_index,
        incremental_vector_dedup_drain,
    )

    schema = "vec_id long, embedding array<float>"
    v, w = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    d1 = spark.createDataFrame([(0, v)], schema)
    d2 = spark.createDataFrame([(10, v), (11, w)], schema)  # 10 dups batch-0's vector
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    kw = dict(threshold=0.9, n_bits=8, bands=4, seed=7)

    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_vector_dedup_drain(spark, src, d1.schema, work, **kw) == 1

    # crashed attempt of batch 1: its index segment COMMITTED (written
    # with _SUCCESS) but the checkpoint never advanced...
    d2.coalesce(1).write.mode("append").parquet(src)
    P = np.array(random_hyperplanes(8, 4, 7), dtype=np.float64)
    _band_code_fan(d2, P, 4, 2, "vec_id", "embedding").write.mode("overwrite").parquet(
        f"{work}/band_index/batch=1"
    )
    # ...and a compaction ran between the crash and the replay,
    # folding the orphaned segment
    assert compact_band_index(spark, work) == 1

    assert incremental_vector_dedup_drain(spark, src, d1.schema, work, **kw) == 1
    ann = {
        r["vec_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/vec_ann/batch=*").collect()
    }
    assert ann[0] == (False, None)
    assert ann[10] == (True, 0)   # dups the compacted batch-0 vector
    assert ann[11] == (False, None)  # NOT a dup of its own folded rows


def test_streaming_funnel_hash_compaction_and_replay(spark, tmp_path):
    """compact_hash_state folds the hash index with row-level _bid
    tags: cross-batch dedup still hits through the compacted state, and
    the hard replay case — a batch's own committed hash segment folded
    before its checkpoint-recovery replay — must NOT anti-join the
    batch's docs away against their own hashes."""
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        compact_hash_state,
        incremental_funnel_drain,
    )

    good = " ".join(f"tok{i} and the of to is in a" for i in range(8))
    uniq = " ".join(f"zzz{i} and the of to is in a" for i in range(8))
    fresh = " ".join(f"qqq{i} and the of to is in a" for i in range(8))
    schema = "doc_id long, source string, lang string, text string"
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    d1 = spark.createDataFrame([(6, "s", "en", good), (7, "s", "en", uniq)], schema)
    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1
    assert compact_hash_state(spark, work) == 0
    assert compact_hash_state(spark, work) == 0  # idempotent no-op

    # batch 1 arrives; fake its crashed first attempt: the hash segment
    # COMMITTED on disk, then a compaction folded it — but the
    # checkpoint never advanced, so the drain replays batch 1
    d2 = spark.createDataFrame(
        [(10, "s", "en", uniq), (12, "s", "en", fresh)], schema
    )
    d2.coalesce(1).write.mode("append").parquet(src)
    from serverless_etl_reporting_pipeline_spark.operators.funnel import quality_hash

    d2.filter("doc_id = 12").select(quality_hash().alias("h")).write.mode(
        "overwrite"
    ).parquet(f"{work}/state_hashes/batch=1")
    assert compact_hash_state(spark, work) == 1

    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1
    ann = {
        r["doc_id"]: (r["dd"], r["clean"])
        for r in spark.read.parquet(f"{work}/funnel_ann/batch=*").collect()
    }
    # 10 loses dedup to batch-0's stored hash THROUGH the compaction;
    # 12's own folded hash (_bid=1) must not debounce itself
    assert ann[10] == (False, False)
    assert ann[12] == (True, True)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    segments=st.lists(
        st.lists(st.integers(min_value=0, max_value=99), min_size=0, max_size=4),
        min_size=1,
        max_size=4,
    ),
    fold_after=st.integers(min_value=0, max_value=4),
    probe_id=st.integers(min_value=0, max_value=5),
)
def test_prior_segments_equals_uncompacted_read_property(
    spark, tmp_path_factory, segments, fold_after, probe_id
):
    """For ANY segment contents, fold point, and probing batch id,
    _prior_segments must return exactly the rows of the segments with
    id < probe_id — compaction (including of the probing batch's own
    committed segment) must never change what a batch sees."""
    from serverless_etl_reporting_pipeline_spark.streaming.state import (
        _fold_segments,
        _prior_segments,
    )

    root = str(tmp_path_factory.mktemp("ps"))
    seg_dir, comp_dir = f"{root}/segs", f"{root}/comp"
    for i, vals in enumerate(segments):
        spark.createDataFrame([(i, v) for v in vals] or [], "seg int, v int").write.mode(
            "overwrite"
        ).parquet(f"{seg_dir}/batch={i}")
        if i + 1 == fold_after:
            _fold_segments(spark, seg_dir, comp_dir)
    got = _prior_segments(spark, seg_dir, comp_dir, probe_id)
    want = sorted(
        (i, v) for i, vals in enumerate(segments) if i < probe_id for v in vals
    )
    if got is None:
        assert not want
    else:
        assert sorted((r["seg"], r["v"]) for r in got.collect()) == want


def test_streaming_ivf_deep_interleaving_invariant(spark, sf_dir, tmp_path):
    """Scripted drain/compact/refresh walk: after EVERY maintenance
    step, the loaded state must equal assign_cells(current quantizer,
    union of everything ingested) — covering compaction superseded by
    a later refresh, post-epoch compaction floors, and a second
    refresh built on an epoch base."""
    from serverless_etl_reporting_pipeline_spark.operators.vectors import assign_cells
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        compact_ivf_segments,
        incremental_ivf_ingest_drain,
        load_ivf_state,
        refresh_ivf_state,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter("vec_id >= 10")
    mx = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    cuts = [10, int(0.3 * mx), int(0.5 * mx), int(0.7 * mx), int(0.85 * mx), mx]
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    def feed(i):
        emb.filter(f"vec_id >= {cuts[i]} and vec_id < {cuts[i + 1]}").coalesce(
            1
        ).write.mode("append").parquet(src)

    def check(upto_slice):
        cent, postings = load_ivf_state(spark, work)
        ingested = emb.filter(f"vec_id < {cuts[upto_slice + 1]}")
        want = {(r["_cell"], r["_id"]) for r in assign_cells(cent, ingested).collect()}
        assert {(r["_cell"], r["_id"]) for r in postings.collect()} == want
        assert postings.count() == ingested.count()

    feed(0); feed(1)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 2
    check(1)
    assert compact_ivf_segments(spark, work) == 1
    check(1)
    feed(2)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 1
    check(2)
    assert refresh_ivf_state(spark, work) == 2  # supersedes the upto=1 compaction
    check(2)
    feed(3)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 1
    check(3)
    assert compact_ivf_segments(spark, work) == 3  # folds ONLY batch 3 (floor = epoch 2)
    check(3)
    assert refresh_ivf_state(spark, work) == 3  # second refresh, built on epoch-2 state
    check(3)
    feed(4)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 1
    check(4)


def test_streaming_funnel_lake_compaction_invariant(spark, tmp_path):
    """compact_funnel_lake must leave the funnel table and the mixture
    report bit-identical — the lake readers see compaction + tail as
    one seamless log, including a fold in the middle of a drain
    sequence."""
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        compact_funnel_lake,
        funnel_table,
        incremental_funnel_drain,
        incremental_mixture_report,
    )

    good = " ".join(f"tok{i} and the of to is in a" for i in range(8))
    uniq = " ".join(f"zzz{i} and the of to is in a" for i in range(8))
    fresh = " ".join(f"qqq{i} and the of to is in a" for i in range(8))
    schema = "doc_id long, source string, lang string, text string"
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    d1 = spark.createDataFrame([(6, "s", "en", good), (7, "t", "en", uniq)], schema)
    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1
    assert compact_funnel_lake(spark, work) == 0

    d2 = spark.createDataFrame([(10, "s", "en", uniq), (12, "t", "en", fresh)], schema)
    d2.coalesce(1).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1

    before_tbl = [tuple(r) for r in funnel_table(spark, work).collect()]
    before_rep = sorted(tuple(r) for r in incremental_mixture_report(spark, work).collect())
    assert compact_funnel_lake(spark, work) == 1
    assert [tuple(r) for r in funnel_table(spark, work).collect()] == before_tbl
    assert (
        sorted(tuple(r) for r in incremental_mixture_report(spark, work).collect())
        == before_rep
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    segments=st.lists(
        st.lists(st.integers(min_value=0, max_value=99), min_size=0, max_size=4),
        min_size=1,
        max_size=4,
    ),
    fold_after=st.integers(min_value=1, max_value=4),
    refold=st.booleans(),
    probe_id=st.integers(min_value=0, max_value=5),
)
def test_prior_segments_survives_vacuum_property(
    spark, tmp_path_factory, segments, fold_after, refold, probe_id
):
    """For ANY segment contents, fold/vacuum point, and probing batch
    id, vacuuming the folded segment dirs (and optionally folding AGAIN
    afterwards — the fold-from-fold path over a vacuumed log) must
    never change what _prior_segments returns: still exactly the rows
    of the segments with id < probe_id."""
    from serverless_etl_reporting_pipeline_spark.streaming.state import (
        _fold_segments,
        _prior_segments,
        _vacuum_segments,
    )

    root = str(tmp_path_factory.mktemp("pv"))
    seg_dir, comp_dir = f"{root}/segs", f"{root}/comp"
    for i, vals in enumerate(segments):
        spark.createDataFrame([(i, v) for v in vals] or [], "seg int, v int").write.mode(
            "overwrite"
        ).parquet(f"{seg_dir}/batch={i}")
        if i + 1 == fold_after:
            upto = _fold_segments(spark, seg_dir, comp_dir)
            assert sorted(_vacuum_segments(spark, seg_dir, comp_dir)) == list(
                range(upto + 1)
            )
    if refold:
        _fold_segments(spark, seg_dir, comp_dir)
    got = _prior_segments(spark, seg_dir, comp_dir, probe_id)
    want = sorted(
        (i, v) for i, vals in enumerate(segments) if i < probe_id for v in vals
    )
    if got is None:
        assert not want
    else:
        assert sorted((r["seg"], r["v"]) for r in got.collect()) == want


def test_streaming_funnel_vacuum_preserves_reports(spark, tmp_path):
    """Vacuuming the folded hash-state and funnel-lake segments must
    leave the funnel table, the mixture report, and later batches'
    cross-batch dedup identical to an unvacuumed twin draining the same
    source — including a re-fold after the vacuum."""
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        compact_funnel_lake,
        compact_hash_state,
        funnel_table,
        incremental_funnel_drain,
        incremental_mixture_report,
        vacuum_funnel_lake,
        vacuum_hash_state,
    )

    good = " ".join(f"tok{i} and the of to is in a" for i in range(8))
    uniq = " ".join(f"zzz{i} and the of to is in a" for i in range(8))
    fresh = " ".join(f"qqq{i} and the of to is in a" for i in range(8))
    schema = "doc_id long, source string, lang string, text string"
    src = str(tmp_path / "src")
    w_vac, w_ref = str(tmp_path / "vac"), str(tmp_path / "ref")

    d1 = spark.createDataFrame([(6, "s", "en", good), (7, "t", "en", uniq)], schema)
    d1.coalesce(1).write.mode("append").parquet(src)
    for w in (w_vac, w_ref):
        assert incremental_funnel_drain(spark, src, d1.schema, w) == 1
    assert compact_hash_state(spark, w_vac) == 0
    assert compact_funnel_lake(spark, w_vac) == 0
    assert vacuum_hash_state(spark, w_vac) == [0]
    assert vacuum_funnel_lake(spark, w_vac) == [0]
    assert not glob.glob(f"{w_vac}/state_hashes/batch=*")
    assert not glob.glob(f"{w_vac}/funnel_ann/batch=*")

    # batch 1: doc 10 must STILL lose dedup to batch-0's hash, now
    # only reachable through the vacuumed-and-folded state
    d2 = spark.createDataFrame([(10, "s", "en", uniq), (12, "t", "en", fresh)], schema)
    d2.coalesce(1).write.mode("append").parquet(src)
    for w in (w_vac, w_ref):
        assert incremental_funnel_drain(spark, src, d1.schema, w) == 1

    ref_tbl = [tuple(r) for r in funnel_table(spark, w_ref).collect()]
    ref_rep = sorted(tuple(r) for r in incremental_mixture_report(spark, w_ref).collect())
    assert [tuple(r) for r in funnel_table(spark, w_vac).collect()] == ref_tbl
    assert (
        sorted(tuple(r) for r in incremental_mixture_report(spark, w_vac).collect())
        == ref_rep
    )

    # re-fold over the vacuumed log (fold-from-fold) + vacuum again:
    # the mixture report's latest-batch rows now live ONLY in the fold
    assert compact_funnel_lake(spark, w_vac) == 1
    assert vacuum_funnel_lake(spark, w_vac) == [1]
    assert compact_hash_state(spark, w_vac) == 1
    assert vacuum_hash_state(spark, w_vac) == [1]
    assert [tuple(r) for r in funnel_table(spark, w_vac).collect()] == ref_tbl
    assert (
        sorted(tuple(r) for r in incremental_mixture_report(spark, w_vac).collect())
        == ref_rep
    )


def test_streaming_funnel_replay_after_vacuum_excludes_self(spark, tmp_path):
    """The hardest retention case: a batch's own committed hash segment
    is folded AND the segment dir vacuumed before the checkpoint-
    recovery replay. The replay must still exclude its own hashes via
    the row-level _bid filter on the fold — not anti-join its docs
    away against themselves."""
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        compact_hash_state,
        incremental_funnel_drain,
        vacuum_hash_state,
    )

    good = " ".join(f"tok{i} and the of to is in a" for i in range(8))
    uniq = " ".join(f"zzz{i} and the of to is in a" for i in range(8))
    fresh = " ".join(f"qqq{i} and the of to is in a" for i in range(8))
    schema = "doc_id long, source string, lang string, text string"
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    d1 = spark.createDataFrame([(6, "s", "en", good), (7, "s", "en", uniq)], schema)
    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1

    d2 = spark.createDataFrame([(10, "s", "en", uniq), (12, "s", "en", fresh)], schema)
    d2.coalesce(1).write.mode("append").parquet(src)
    from serverless_etl_reporting_pipeline_spark.operators.funnel import quality_hash

    d2.filter("doc_id = 12").select(quality_hash().alias("h")).write.mode(
        "overwrite"
    ).parquet(f"{work}/state_hashes/batch=1")
    assert compact_hash_state(spark, work) == 1
    assert sorted(vacuum_hash_state(spark, work)) == [0, 1]
    assert not glob.glob(f"{work}/state_hashes/batch=*")

    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1
    ann = {
        r["doc_id"]: (r["dd"], r["clean"])
        for r in spark.read.parquet(f"{work}/funnel_ann/batch=*").collect()
    }
    assert ann[10] == (False, False)  # still dedups against batch 0's fold
    assert ann[12] == (True, True)    # its own vacuumed+folded hash: no self-dedup


def test_streaming_vector_dedup_vacuum_preserves_probes(spark, sf_dir, tmp_path):
    """vacuum_band_index after a fold must not change any later probe:
    batch ann ≡ the v12-oracle-pinned operator over the prior batches,
    with every prior segment dir deleted."""
    from serverless_etl_reporting_pipeline_spark.operators.vectors import (
        neardup_vector_index_probe,
    )
    from serverless_etl_reporting_pipeline_spark.plans.vectors import (
        _V09_BANDS,
        _V09_BITS,
        _V09_SEED,
        _V12_TAU,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
        compact_band_index,
        incremental_vector_dedup_drain,
        vacuum_band_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    c1, c2 = int(0.5 * max_id), int(0.8 * max_id)
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    kw = dict(
        threshold=float(_V12_TAU), n_bits=_V09_BITS, bands=_V09_BANDS, seed=_V09_SEED
    )

    emb.filter(f"vec_id < {c1}").coalesce(1).write.mode("append").parquet(src)
    emb.filter(f"vec_id >= {c1} and vec_id < {c2}").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert incremental_vector_dedup_drain(spark, src, emb.schema, work, **kw) == 2
    assert compact_band_index(spark, work) == 1
    assert sorted(vacuum_band_index(spark, work)) == [0, 1]
    assert not glob.glob(f"{work}/band_index/batch=*")
    assert vacuum_band_index(spark, work) == []  # idempotent no-op

    emb.filter(f"vec_id >= {c2}").coalesce(1).write.mode("append").parquet(src)
    assert incremental_vector_dedup_drain(spark, src, emb.schema, work, **kw) == 1

    got = {
        r["vec_id"]: (r["is_dup"], r["dup_src"], r["cos"])
        for r in spark.read.parquet(f"{work}/vec_ann/batch=2").collect()
    }
    want = {
        r["vec_id"]: (r["is_dup"], r["dup_src"], r["cos"])
        for r in neardup_vector_index_probe(
            emb.filter(f"vec_id < {c2}"), emb.filter(f"vec_id >= {c2}"), **kw
        ).collect()
    }
    assert got == want
    assert any(v[0] for v in want.values()), "fixture should contain cross-side near-dups"


def test_streaming_ivf_vacuum_interleaving_invariant(spark, sf_dir, tmp_path):
    """The deep drain/compact/refresh walk with a vacuum after every
    maintenance step: the loaded state must stay equal to
    assign_cells(current quantizer, union of everything ingested), with
    the superseded posting segments, folds, and epochs actually gone."""
    from serverless_etl_reporting_pipeline_spark.operators.vectors import assign_cells
    from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
        compact_ivf_segments,
        incremental_ivf_ingest_drain,
        load_ivf_state,
        refresh_ivf_state,
        vacuum_ivf_segments,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter("vec_id >= 10")
    mx = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    cuts = [10, int(0.3 * mx), int(0.5 * mx), int(0.7 * mx), int(0.85 * mx), mx]
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    def feed(i):
        emb.filter(f"vec_id >= {cuts[i]} and vec_id < {cuts[i + 1]}").coalesce(
            1
        ).write.mode("append").parquet(src)

    def check(upto_slice):
        cent, postings = load_ivf_state(spark, work)
        ingested = emb.filter(f"vec_id < {cuts[upto_slice + 1]}")
        want = {(r["_cell"], r["_id"]) for r in assign_cells(cent, ingested).collect()}
        assert {(r["_cell"], r["_id"]) for r in postings.collect()} == want
        assert postings.count() == ingested.count()

    feed(0); feed(1)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 2
    assert compact_ivf_segments(spark, work) == 1
    assert sorted(vacuum_ivf_segments(spark, work)) == [0, 1]
    assert not glob.glob(f"{work}/postings/batch=*")
    check(1)
    feed(2)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 1
    check(2)
    # refresh sees the vacuumed log: new_e from the fold's upto + tail
    assert refresh_ivf_state(spark, work) == 2
    assert vacuum_ivf_segments(spark, work) == [2]
    assert not glob.glob(f"{work}/postings_compacted/upto=*")
    check(2)
    feed(3); feed(4)
    assert incremental_ivf_ingest_drain(spark, src, emb.schema, work) == 2
    assert compact_ivf_segments(spark, work) == 4
    assert sorted(vacuum_ivf_segments(spark, work)) == [3, 4]
    check(4)
    # second refresh on a fully vacuumed log, then final vacuum: only
    # the newest epoch remains
    assert refresh_ivf_state(spark, work) == 4
    assert vacuum_ivf_segments(spark, work) == []
    assert glob.glob(f"{work}/refresh/epoch=4")
    assert not glob.glob(f"{work}/refresh/epoch=2")
    check(4)


def _scd2_rebuild(events_df):
    """The e01 SCD2 construction (plans/lakehouse.py) over a batch
    frame — the expected table for the streaming twin's equality
    assertions."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        events_df.filter("event_type = 'purchase'")
        .select(
            "user_id",
            "event_id",
            "value",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
    )


def _rows(df):
    # event_id (position 2) is unique, so mixed None/datetime columns
    # further right are never compared during the sort
    return sorted((r["user_id"], r["event_id"], r["value"], r["valid_from"], r["valid_to"], r["is_current"]) for r in df.collect())


def test_streaming_scd2_matches_batch_rebuild(spark, sf_dir, tmp_path):
    """Draining the events table in two time-ordered arrival files (the
    CDC contract: event time monotone across batches) must yield the
    SAME SCD2 history as e01's one-shot build over the union — open
    rows from the first batch closed by the second batch's first event
    per user, untouched rows byte-identical."""
    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        incremental_scd2_drain,
        scd2_table,
    )

    events = load_table(spark, sf_dir, "events")
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    events.filter("ts <= '2024-01-24'").coalesce(1).write.mode("append").parquet(src)
    assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1
    events.filter("ts > '2024-01-24'").coalesce(1).write.mode("append").parquet(src)
    assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1

    assert _rows(scd2_table(spark, work)) == _rows(_scd2_rebuild(events))


def test_streaming_scd2_cross_batch_close(spark, tmp_path):
    """Hand-checkable chain: a user spanning batches gets its open row
    closed by ITS first event of the next batch; single-batch users
    stay open; non-purchase events never become versions."""
    import datetime as dt

    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        incremental_scd2_drain,
        scd2_table,
    )

    t = [dt.datetime(2024, 1, 1 + i) for i in range(6)]
    b0 = [
        (1, t[0], 1, "purchase", 10.0, "{}"),
        (2, t[1], 1, "purchase", 11.0, "{}"),
        (3, t[0], 2, "purchase", 20.0, "{}"),
        (4, t[1], 2, "click", 0.0, "{}"),
    ]
    b1 = [
        (5, t[2], 1, "purchase", 12.0, "{}"),
        (6, t[3], 3, "purchase", 30.0, "{}"),
    ]
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for rows in (b0, b1):
        spark.createDataFrame(rows, SCHEMAS["events"]).select(cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1

    got = {r["event_id"]: (r["valid_to"], r["is_current"]) for r in scd2_table(spark, work).collect()}
    assert set(got) == {1, 2, 3, 5, 6}          # click (4) filtered out
    assert got[1] == (t[1], False)               # closed within batch 0
    assert got[2] == (t[2], False)               # closed ACROSS batches by event 5
    assert got[3] == (None, True)                # user 2 never reappears
    assert got[5] == (None, True)                # user 1's new current row
    assert got[6] == (None, True)                # user 3 first seen in batch 1


def test_streaming_scd2_redelivery_is_idempotent(spark, tmp_path):
    """The r11 monotone-CDC enforcement (found by the streaming
    degenerate sweep): an at-least-once redelivery — a NEW arrival file
    re-sending already-committed events — used to hand the reader's
    deferred close an earlier _first_ts than the open row's valid_from
    (a backward-travelling, negative-duration version). The drain now
    filters each batch to ts strictly above the committed tip, so a
    full redelivery is a no-op and a PARTIAL overlap keeps only the
    genuinely-new rows."""
    import datetime as dt

    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        incremental_scd2_drain,
        scd2_table,
    )

    t = [dt.datetime(2024, 1, 1 + i) for i in range(6)]
    b0 = [
        (1, t[0], 1, "purchase", 10.0, "{}"),
        (2, t[1], 1, "purchase", 11.0, "{}"),
    ]
    b1 = [
        (3, t[2], 1, "purchase", 12.0, "{}"),
        (4, t[3], 2, "purchase", 20.0, "{}"),
    ]
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def arrive(rows):
        spark.createDataFrame(rows, SCHEMAS["events"]).select(cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        return incremental_scd2_drain(spark, src, SCHEMAS["events"], work)

    assert arrive(b0) == 1
    assert arrive(b1) == 1
    want = {r["event_id"]: (r["valid_to"], r["is_current"])
            for r in scd2_table(spark, work).collect()}
    # FULL redelivery of the last batch: filtered to empty, not counted
    assert arrive(b1) == 0
    # PARTIAL overlap: one already-committed event + one new one —
    # only the new row may land
    assert arrive([b1[1], (5, t[4], 1, "purchase", 13.0, "{}")]) == 1
    got = {r["event_id"]: (r["valid_to"], r["is_current"])
           for r in scd2_table(spark, work).collect()}
    assert set(got) == set(want) | {5}
    assert got[5] == (None, True)
    assert got[3] == (t[4], False)      # old open row closed by the NEW event only
    assert got[4] == want[4] == (None, True)  # redelivered row did not re-version
    # and no version ever travels backward
    for r in scd2_table(spark, work).collect():
        if r["valid_to"] is not None:
            assert r["valid_to"] >= r["valid_from"]
    # TIE AT THE TIP (r11 ADVICE, semantics now stated in the module
    # docstring): a row whose ts EQUALS the committed tip is dropped.
    # Under the strictly-greater upstream extract, consecutive CDC
    # batches are strictly ts-separated, so a tie can only be a
    # redelivery — a genuinely-new same-microsecond event is excluded
    # one stage up by the extract itself, never silently here.
    assert arrive([(5, t[4], 1, "purchase", 13.0, "{}")]) == 0  # exact redelivery
    assert arrive([(6, t[4], 3, "purchase", 30.0, "{}")]) == 0  # tie: contract says redelivery
    after = {r["event_id"]: (r["valid_to"], r["is_current"])
             for r in scd2_table(spark, work).collect()}
    assert after == got  # the log is byte-stable under tie arrivals


def test_streaming_scd2_drain_session_tz_invariant(spark, tmp_path):
    """The r11 timezone-literal hazard, pinned at the drain: the
    monotone-CDC watermark tip is a collected naive datetime turned
    back into a plan literal — via lit(datetime) it would be read
    through the SESSION zone, shifting the boundary by the whole
    offset under a non-UTC session (5 h under America/New_York) and
    silently dropping every batch-2 event within the offset of the
    batch-1 tip. ntz_lit (functions/timelit.py) parses it
    timezone-free; this drains under a hostile session with events
    placed INSIDE the would-be shift window and asserts the table
    equals the batch rebuild."""
    import datetime as dt

    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        incremental_scd2_drain,
        scd2_table,
    )

    hostile = spark.newSession()
    hostile.conf.set("spark.sql.session.timeZone", "America/New_York")

    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    b0 = [(1, base, 1, "purchase", 10.0, "{}"),
          (2, base + dt.timedelta(hours=1), 2, "purchase", 20.0, "{}")]
    # batch-1 events 1-4 hours after the tip — inside the 5 h window a
    # session-zoned literal would have swallowed
    b1 = [(3, base + dt.timedelta(hours=2), 1, "purchase", 11.0, "{}"),
          (4, base + dt.timedelta(hours=4), 2, "purchase", 21.0, "{}")]
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for rows in (b0, b1):
        hostile.createDataFrame(rows, SCHEMAS["events"]).select(cols).coalesce(1)\
            .write.mode("append").parquet(src)
        assert incremental_scd2_drain(hostile, src, SCHEMAS["events"], work) == 1

    union = hostile.createDataFrame(b0 + b1, SCHEMAS["events"]).select(cols)
    assert _rows(scd2_table(hostile, work)) == _rows(_scd2_rebuild(union))


def test_streaming_scd2_replay_idempotent(spark, tmp_path):
    """A failed first attempt leaves a wrong/partial batch=1 segment on
    disk; the checkpoint-recovery replay must overwrite it — the drain
    reads no prior state, so the segment is a pure function of the
    batch's source rows."""
    import datetime as dt

    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        incremental_scd2_drain,
        scd2_table,
    )

    t = [dt.datetime(2024, 1, 1 + i) for i in range(4)]
    b0 = [(1, t[0], 1, "purchase", 10.0, "{}")]
    b1 = [(2, t[1], 1, "purchase", 11.0, "{}"), (3, t[2], 2, "purchase", 20.0, "{}")]
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    d0 = spark.createDataFrame(b0, SCHEMAS["events"]).select(cols)
    d0.coalesce(1).write.mode("append").parquet(src)
    assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1

    # stage batch 1's file, then fake the failed attempt: a segment
    # with WRONG contents already sits under batch=1
    d1 = spark.createDataFrame(b1, SCHEMAS["events"]).select(cols)
    d1.coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(99, 99.0, 99, t[3], None, True, None)],
        "event_id long, value double, user_id long, valid_from timestamp_ntz, "
        "valid_to timestamp_ntz, is_current boolean, _first_ts timestamp_ntz",
    ).write.mode("overwrite").parquet(f"{work}/scd2_hist/batch=1")

    assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1
    union = d0.unionByName(d1)
    assert _rows(scd2_table(spark, work)) == _rows(_scd2_rebuild(union))


def test_streaming_scd2_compaction_vacuum_invariant(spark, sf_dir, tmp_path):
    """Fold + vacuum of the version log between (and after) drains must
    never change the SCD2 table: three time-ordered arrival batches
    with maintenance interleaved always read back as e01's one-shot
    rebuild over everything drained so far."""
    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        compact_scd2_hist,
        incremental_scd2_drain,
        scd2_table,
        vacuum_scd2_hist,
    )

    events = load_table(spark, sf_dir, "events")
    cuts = ["ts <= '2024-01-12'", "ts > '2024-01-12' AND ts <= '2024-01-24'", "ts > '2024-01-24'"]
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    events.filter(cuts[0]).coalesce(1).write.mode("append").parquet(src)
    assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1
    events.filter(cuts[1]).coalesce(1).write.mode("append").parquet(src)
    assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1

    two = _rows(scd2_table(spark, work))
    assert two == _rows(_scd2_rebuild(events.filter(f"({cuts[0]}) OR ({cuts[1]})")))
    assert compact_scd2_hist(spark, work) == 1
    assert _rows(scd2_table(spark, work)) == two
    assert sorted(vacuum_scd2_hist(spark, work)) == [0, 1]
    assert not glob.glob(f"{work}/scd2_hist/batch=*")
    assert _rows(scd2_table(spark, work)) == two

    # drain over the vacuumed log, then fold-from-fold + vacuum again
    events.filter(cuts[2]).coalesce(1).write.mode("append").parquet(src)
    assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1
    full = _rows(_scd2_rebuild(events))
    assert _rows(scd2_table(spark, work)) == full
    assert compact_scd2_hist(spark, work) == 2
    assert vacuum_scd2_hist(spark, work) == [2]
    assert _rows(scd2_table(spark, work)) == full


def test_streaming_scd2_table_plan_shape(spark, tmp_path):
    """The read-side fix-up must stay metadata-sized: the is_current
    split reaches both parquet scans as pushed filters, the closed path
    prunes _first_ts (map-only into the union), there is NO join, and
    the only hash exchange is the open-rows fix-up window — the
    trailing range exchange is the presentation ORDER BY."""
    import datetime as dt
    import re

    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        incremental_scd2_drain,
        scd2_table,
    )

    t = [dt.datetime(2024, 1, 1 + i) for i in range(2)]
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, rows in enumerate(
        [[(1, t[0], 1, "purchase", 1.0, "{}")], [(2, t[1], 1, "purchase", 2.0, "{}")]]
    ):
        spark.createDataFrame(rows, SCHEMAS["events"]).select(cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1

    df = scd2_table(spark, work)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    tree = plan.split("\n\n")[0]
    assert not re.findall(r"Join", tree), tree
    assert "BroadcastExchange" not in tree, tree
    # both halves of the is_current split are pushed into the scans
    assert "Not(EqualTo(is_current,true))" in plan, plan
    assert "EqualTo(is_current,true)]" in plan, plan
    # the closed path never reads _first_ts or _bid off disk
    closed_schemas = [
        s for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan) if "valid_to" in s
    ]
    assert closed_schemas and all("_first_ts" not in s for s in closed_schemas), plan
    # one hash exchange (the fix-up window); one range exchange (ORDER BY)
    assert len(re.findall(r"Arguments: hashpartitioning\(user_id", plan)) == 1, plan
    assert len(re.findall(r"Arguments: rangepartitioning", plan)) == 1, plan


def test_streaming_scd2_current_and_snapshot(spark, sf_dir, tmp_path):
    """scd2_current ≡ the rebuild's is_current rows; scd2_snapshot(T) ≡
    the rebuild's interval covering T — before, at, and after the batch
    boundary, and unchanged by fold+vacuum. The current read must also
    never scan closed rows (is_current=true pushed into every scan)."""
    import re

    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        compact_scd2_hist,
        incremental_scd2_drain,
        scd2_current,
        scd2_snapshot,
        vacuum_scd2_hist,
    )

    events = load_table(spark, sf_dir, "events")
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    events.filter("ts <= '2024-01-24'").coalesce(1).write.mode("append").parquet(src)
    assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1
    events.filter("ts > '2024-01-24'").coalesce(1).write.mode("append").parquet(src)
    assert incremental_scd2_drain(spark, src, SCHEMAS["events"], work) == 1

    rebuild = _scd2_rebuild(events)
    assert _rows(scd2_current(spark, work)) == _rows(rebuild.filter("is_current"))
    for t in ("2024-01-05", "2024-01-24", "2024-01-29"):
        want = rebuild.filter(
            f"valid_from <= '{t}' AND (valid_to IS NULL OR valid_to > '{t}')"
        )
        assert _rows(scd2_snapshot(spark, work, t)) == _rows(want)
        # at most one version per user is visible at any instant
        n_users = scd2_snapshot(spark, work, t).select("user_id").distinct().count()
        assert scd2_snapshot(spark, work, t).count() == n_users

    # current must read only open rows: every scan carries the pushed
    # is_current=true filter, none the closed path's negation
    plan = scd2_current(spark, work)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Not(EqualTo(is_current,true))" not in plan, plan
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == len(re.findall(r"EqualTo\(is_current,true\)\]", plan)) == 2, plan

    # maintenance-invisible, like every other reader
    cur = _rows(scd2_current(spark, work))
    snap = _rows(scd2_snapshot(spark, work, "2024-01-24"))
    assert compact_scd2_hist(spark, work) == 1
    assert sorted(vacuum_scd2_hist(spark, work)) == [0, 1]
    assert _rows(scd2_current(spark, work)) == cur
    assert _rows(scd2_snapshot(spark, work, "2024-01-24")) == snap


def test_log_state_bounds_at_committed_tip_and_vacuum_reclaims_crashed_fold(
    spark, tmp_path
):
    """Whole-log readers must stop at the committed tip: a partial
    segment above it (in-flight or crashed drain — parquet files
    present, no _SUCCESS) is invisible instead of silently read as the
    latest batch. And vacuum must reclaim a crashed fold dir (no
    _SUCCESS) — later folds target higher upto ids and would otherwise
    leak it forever."""
    import os

    from serverless_etl_reporting_pipeline_spark.streaming.state import (
        _fold_segments,
        _log_state,
        _vacuum_segments,
    )

    seg, comp = str(tmp_path / "segs"), str(tmp_path / "comp")
    for i in (0, 1):
        spark.createDataFrame([(i, 10 + i)], "seg int, v int").write.mode(
            "overwrite"
        ).parquet(f"{seg}/batch={i}")
    df, tip = _log_state(spark, seg, comp)
    assert tip == 1 and sorted(r["seg"] for r in df.collect()) == [0, 1]

    # in-flight batch=2: committed marker stripped
    spark.createDataFrame([(2, 12)], "seg int, v int").write.mode("overwrite").parquet(
        f"{seg}/batch=2"
    )
    os.remove(f"{seg}/batch=2/_SUCCESS")
    df, tip = _log_state(spark, seg, comp)
    assert tip == 1 and sorted(r["seg"] for r in df.collect()) == [0, 1]

    # crashed fold at upto=0 (no _SUCCESS), then a real fold at upto=1:
    # vacuum must delete the crashed dir, the folded segments, and spare
    # the in-flight batch=2 (above the fold)
    spark.createDataFrame([(0, 10)], "seg int, v int").withColumn(
        "_bid", F.lit(0)
    ).write.mode("overwrite").parquet(f"{comp}/upto=0")
    os.remove(f"{comp}/upto=0/_SUCCESS")
    assert _fold_segments(spark, seg, comp) == 1
    assert sorted(_vacuum_segments(spark, seg, comp)) == [0, 1]
    assert not os.path.exists(f"{comp}/upto=0")
    assert os.path.exists(f"{comp}/upto=1/_SUCCESS")
    assert os.path.exists(f"{seg}/batch=2")
    df, tip = _log_state(spark, seg, comp)
    assert tip == 1 and sorted(r["seg"] for r in df.collect()) == [0, 1]


def test_streaming_funnel_report_ignores_partial_inflight_segment(spark, tmp_path):
    """A crashed drain's partial funnel_ann segment (no _SUCCESS) must
    not become the mixture report's 'latest batch' — the report keys on
    the committed tip and reads identical results before and after the
    partial dir appears."""
    import os

    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        funnel_table,
        incremental_funnel_drain,
        incremental_mixture_report,
    )

    good = " ".join(f"tok{i} and the of to is in a" for i in range(8))
    uniq = " ".join(f"zzz{i} and the of to is in a" for i in range(8))
    schema = "doc_id long, source string, lang string, text string"
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    d1 = spark.createDataFrame([(6, "s", "en", good), (7, "t", "en", uniq)], schema)
    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, d1.schema, work) == 1

    tbl = [tuple(r) for r in funnel_table(spark, work).collect()]
    rep = sorted(tuple(r) for r in incremental_mixture_report(spark, work).collect())

    # fake the crash: a partial batch=9 annotation dir, no _SUCCESS
    spark.createDataFrame(
        [(99, "x", "en", False, False, False)],
        "doc_id long, source string, lang string, q boolean, dd boolean, clean boolean",
    ).write.mode("overwrite").parquet(f"{work}/funnel_ann/batch=9")
    os.remove(f"{work}/funnel_ann/batch=9/_SUCCESS")

    assert [tuple(r) for r in funnel_table(spark, work).collect()] == tbl
    assert (
        sorted(tuple(r) for r in incremental_mixture_report(spark, work).collect())
        == rep
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    segments=st.lists(
        st.lists(st.integers(min_value=0, max_value=99), min_size=0, max_size=3),
        min_size=1,
        max_size=4,
    ),
    n_inflight=st.integers(min_value=0, max_value=2),
    fold=st.booleans(),
    vacuum=st.booleans(),
)
def test_log_state_property(spark, tmp_path_factory, segments, n_inflight, fold, vacuum):
    """For ANY committed segment log with a trailing run of in-flight
    (uncommitted) writes — the only pattern a crashed AvailableNow
    drain can leave — and any fold/vacuum state, _log_state returns
    exactly the committed rows with tip = the newest committed id."""
    import os

    from serverless_etl_reporting_pipeline_spark.streaming.state import (
        _fold_segments,
        _log_state,
        _vacuum_segments,
    )

    root = str(tmp_path_factory.mktemp("ls"))
    seg_dir, comp_dir = f"{root}/segs", f"{root}/comp"
    n_committed = len(segments)
    # trailing in-flight dirs carry rows that must never be visible
    all_segs = list(segments) + [[77]] * n_inflight
    for i, vals in enumerate(all_segs):
        spark.createDataFrame([(i, v) for v in vals] or [], "seg int, v int").write.mode(
            "overwrite"
        ).parquet(f"{seg_dir}/batch={i}")
        if i >= n_committed:
            os.remove(f"{seg_dir}/batch={i}/_SUCCESS")
    if fold:
        _fold_segments(spark, seg_dir, comp_dir)
        if vacuum:
            _vacuum_segments(spark, seg_dir, comp_dir)
    got, tip = _log_state(spark, seg_dir, comp_dir)
    want = sorted((i, v) for i, vals in enumerate(segments) for v in vals)
    assert tip == n_committed - 1
    if got is None:
        assert not want
    else:
        assert sorted((r["seg"], r["v"]) for r in got.collect()) == want


def test_streaming_text_dedup_equals_batch_probe(spark, sf_dir, tmp_path):
    """The document twin of the vector-dedup capstone: draining doc
    micro-batches through the on-disk MinHash index must give each
    batch EXACTLY the annotations of incremental_neardup_flags(prior
    batches, batch) — the operator t20's oracle pins — and a re-drain
    with no new files processes nothing."""
    from serverless_etl_reporting_pipeline_spark.operators.minhash import (
        incremental_neardup_flags,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        incremental_text_dedup_drain,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    wm = int(0.8 * (max_id + 1))
    src, work = str(tmp_path / "doc_src"), str(tmp_path / "doc_work")

    base = docs.filter(f"doc_id < {wm}")
    delta = docs.filter(f"doc_id >= {wm}")
    base.coalesce(1).write.mode("append").parquet(src)
    assert incremental_text_dedup_drain(spark, src, docs.schema, work) == 1
    delta.coalesce(1).write.mode("append").parquet(src)
    assert incremental_text_dedup_drain(spark, src, docs.schema, work) == 1
    assert incremental_text_dedup_drain(spark, src, docs.schema, work) == 0

    # batch 0: no prior state — nothing may be flagged
    b0 = spark.read.parquet(f"{work}/doc_ann/batch=0")
    assert b0.count() == base.count() and b0.filter("is_dup").count() == 0
    # batch 1 must equal the t20-oracle-pinned operator on (base, delta)
    got = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/doc_ann/batch=1").collect()
    }
    want = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in incremental_neardup_flags(base, delta).collect()
    }
    assert got == want
    assert any(v[0] for v in want.values()), "fixture should contain cross-side near-dups"


def test_streaming_text_dedup_replay_idempotent(spark, tmp_path):
    """Checkpoint-recovery replay for the text module: a micro-batch
    whose OWN index segments and annotations were written by a failed
    prior attempt must overwrite them and must NOT flag its documents
    as duplicates of themselves (every doc is jaccard-1.0 with itself,
    so a leaked own-segment probe would flag the whole batch)."""
    from serverless_etl_reporting_pipeline_spark.operators.minhash import (
        _shingle_sets,
        minhash_signatures,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        incremental_text_dedup_drain,
    )

    schema = "doc_id long, text string"
    ta = "the quick brown fox jumps over the lazy dog again and again"
    tb = "completely different words appear here instead tonight my friend"
    d1 = spark.createDataFrame([(0, ta)], schema)
    d2 = spark.createDataFrame([(10, ta), (11, tb)], schema)  # 10 dups batch-0's doc
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_text_dedup_drain(spark, src, d1.schema, work) == 1

    # stage batch 2, then fake its failed first attempt on disk: both
    # index segments committed, garbage annotations written
    d2.coalesce(1).write.mode("append").parquet(src)
    sh = _shingle_sets(d2, "doc_id", "text", 3)
    sh.write.mode("overwrite").parquet(f"{work}/shingle_index/batch=1")
    minhash_signatures(sh, "doc_id", 64).write.mode("overwrite").parquet(
        f"{work}/sig_index/batch=1"
    )
    d2.select(
        F.col("doc_id"), F.lit(True).alias("is_dup"), F.lit(999).cast("long").alias("dup_src")
    ).write.mode("overwrite").parquet(f"{work}/doc_ann/batch=1")

    assert incremental_text_dedup_drain(spark, src, d1.schema, work) == 1
    ann = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/doc_ann/batch=*").collect()
    }
    # 10 dups the STORED batch-0 doc; 11 must NOT be flagged against its
    # own replayed segments, and the garbage annotations are gone
    assert ann[0] == (False, None)
    assert ann[10] == (True, 0)
    assert ann[11] == (False, None)


def test_streaming_text_dedup_compaction_and_vacuum_preserve_probes(spark, sf_dir, tmp_path):
    """compact_text_index folds BOTH index logs with row-level _bid
    tags and vacuum_text_index reclaims the folded dirs; probes of
    later batches must see exactly the same prior state as the
    uncompacted layout (batch ann ≡ the t20-oracle-pinned operator over
    the folded prior batches)."""
    from serverless_etl_reporting_pipeline_spark.operators.minhash import (
        incremental_neardup_flags,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        compact_text_index,
        incremental_text_dedup_drain,
        vacuum_text_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    c1, c2 = int(0.5 * max_id), int(0.8 * max_id)
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    docs.filter(f"doc_id < {c1}").coalesce(1).write.mode("append").parquet(src)
    docs.filter(f"doc_id >= {c1} and doc_id < {c2}").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert incremental_text_dedup_drain(spark, src, docs.schema, work) == 2
    assert compact_text_index(spark, work) == 1
    assert compact_text_index(spark, work) == 1  # idempotent no-op
    assert vacuum_text_index(spark, work) == [0, 1]

    docs.filter(f"doc_id >= {c2}").coalesce(1).write.mode("append").parquet(src)
    assert incremental_text_dedup_drain(spark, src, docs.schema, work) == 1

    got = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/doc_ann/batch=2").collect()
    }
    want = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in incremental_neardup_flags(
            docs.filter(f"doc_id < {c2}"), docs.filter(f"doc_id >= {c2}")
        ).collect()
    }
    assert got == want
    assert any(v[0] for v in want.values()), "fixture should contain cross-side near-dups"


def test_streaming_text_dedup_half_written_batch_heals(spark, tmp_path):
    """Crash window unique to the two-log module: a drain that died
    between the shingle write and the signature write leaves the logs
    out of lockstep. compact_text_index must surface that loudly (not
    fold a skewed view silently), probes must stay correct throughout,
    and the checkpoint replay must heal everything."""
    import pytest as _pytest

    from serverless_etl_reporting_pipeline_spark.operators.minhash import _shingle_sets
    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        compact_text_index,
        incremental_text_dedup_drain,
    )

    schema = "doc_id long, text string"
    ta = "the quick brown fox jumps over the lazy dog again and again"
    tb = "completely different words appear here instead tonight my friend"
    d1 = spark.createDataFrame([(0, ta)], schema)
    d2 = spark.createDataFrame([(10, ta), (11, tb)], schema)
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_text_dedup_drain(spark, src, d1.schema, work) == 1

    # crashed attempt of batch 1: shingle segment COMMITTED, signature
    # segment never written, checkpoint never advanced
    d2.coalesce(1).write.mode("append").parquet(src)
    _shingle_sets(d2, "doc_id", "text", 3).write.mode("overwrite").parquet(
        f"{work}/shingle_index/batch=1"
    )
    with _pytest.raises(RuntimeError, match="lockstep"):
        compact_text_index(spark, work)

    # the replay overwrites both segments and the logs re-converge
    assert incremental_text_dedup_drain(spark, src, d1.schema, work) == 1
    assert compact_text_index(spark, work) == 1
    ann = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/doc_ann/batch=*").collect()
    }
    assert ann == {0: (False, None), 10: (True, 0), 11: (False, None)}


def test_streaming_text_dedup_torn_drain_fault_injection(spark, tmp_path):
    """The r11 verdict's torn-drain probe, pinned for the riskiest
    module (two lockstep logs): unlike the hand-simulated twin above,
    this CRASHES the real drain at every parquet write boundary via
    fault injection (tools/degenerate_streaming._tear_after), so it
    also pins the drain's write ORDER — shingle segment first, then
    the signature sibling, then the discovery fan, then annotations.
    Tears #1/#2 must leave the logs de-synced on disk exactly as
    documented (earlier logs committed with _SUCCESS, later absent);
    every restart replays the uncommitted batch; the converged state
    must equal a never-crashed run's."""
    import os as _os

    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        compact_text_index,
        incremental_text_dedup_drain,
    )
    from tools.degenerate_streaming import _drain_with_tears

    schema = "doc_id long, text string"
    ta = "the quick brown fox jumps over the lazy dog again and again"
    tb = "completely different words appear here instead tonight my friend"
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    spark.createDataFrame([(0, ta)], schema).coalesce(1).write.mode("append").parquet(src)
    d = spark.createDataFrame([(0, ta)], schema)
    assert incremental_text_dedup_drain(spark, src, d.schema, work) == 1

    spark.createDataFrame([(10, ta), (11, tb)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    shapes = []

    def on_tear(k):
        shapes.append((
            k,
            _os.path.exists(f"{work}/shingle_index/batch=1/_SUCCESS"),
            _os.path.exists(f"{work}/sig_index/batch=1/_SUCCESS"),
            _os.path.exists(f"{work}/band_fan/batch=1/_SUCCESS"),
            _os.path.exists(f"{work}/doc_ann/batch=1/_SUCCESS"),
        ))

    rec = {}
    n = _drain_with_tears(
        lambda: incremental_text_dedup_drain(spark, src, d.schema, work), rec, on_tear
    )
    assert n == 1 and rec["tears"] == 4
    # the torn shapes prove the write order AND the de-sync windows:
    # tear #1 = shingle only; #2 = +sig; #3 = +fan (ann missing,
    # checkpoint uncommitted); #4 = all four written, commit torn off
    assert shapes == [
        (1, True, False, False, False),
        (2, True, True, False, False),
        (3, True, True, True, False),
        (4, True, True, True, True),
    ]
    # converged state is indistinguishable from a never-crashed run
    assert compact_text_index(spark, work) == 1
    ann = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/doc_ann/batch=*").collect()
    }
    assert ann == {0: (False, None), 10: (True, 0), 11: (False, None)}


def test_text_fan_fold_layout_size_gated(spark, tmp_path, monkeypatch):
    """r13: the band-fan fold's (band, _bkt) directory layout is
    SIZE-GATED — a small fold writes one plain parquet (2 048 KB-sized
    files cost more to list/open than the data costs to scan), a fold
    past the byte threshold writes the IVF-cells dirs. Probes must
    annotate identically over both layouts."""
    import glob as _glob
    import os as _os

    from serverless_etl_reporting_pipeline_spark.streaming import state as state_mod
    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        compact_text_index,
        incremental_text_dedup_drain,
    )

    schema = "doc_id long, text string"
    ta = "the quick brown fox jumps over the lazy dog again and again"
    tb = "completely different words appear here instead tonight my friend"

    def drive(work_dir, src_dir):
        spark.createDataFrame([(0, ta), (1, tb)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        assert incremental_text_dedup_drain(
            spark, src_dir, spark.createDataFrame([], schema).schema, work_dir
        ) == 1
        assert compact_text_index(spark, work_dir) == 0
        # probe the folded state with a fresh batch
        spark.createDataFrame([(10, ta), (11, "too short")], schema).coalesce(
            1
        ).write.mode("append").parquet(src_dir)
        assert incremental_text_dedup_drain(
            spark, src_dir, spark.createDataFrame([], schema).schema, work_dir
        ) == 1
        return {
            r["doc_id"]: (r["is_dup"], r["dup_src"])
            for r in spark.read.parquet(f"{work_dir}/doc_ann/batch=1").collect()
        }

    # tiny fold + default threshold -> plain layout, no partition dirs
    ann_plain = drive(str(tmp_path / "w_plain"), str(tmp_path / "s_plain"))
    assert not _glob.glob(str(tmp_path / "w_plain/band_fan_compacted/upto=0/band=*"))
    assert _os.path.exists(str(tmp_path / "w_plain/band_fan_compacted/upto=0/_SUCCESS"))

    # threshold forced to 0 -> the directory layout engages
    monkeypatch.setattr(state_mod, "_PARTITION_FOLD_MIN_BYTES", 0)
    ann_dirs = drive(str(tmp_path / "w_dirs"), str(tmp_path / "s_dirs"))
    assert _glob.glob(str(tmp_path / "w_dirs/band_fan_compacted/upto=0/band=*/_bkt=*"))

    assert ann_plain == ann_dirs == {10: (True, 0), 11: (False, None)}


def test_streaming_text_index_torn_compaction(spark, tmp_path):
    """r12 verdict ask #5: compaction rewrites multi-segment state, a
    crash window DISTINCT from a drain's — a tear between 'compacted
    segment written' and the remaining lockstep folds (or the vacuum)
    must neither double-count rows nor de-sync the three text-index
    logs. Tears compact_text_index at its fold-write boundaries and
    asserts: the half-folded shape is really torn, a drain probing it
    annotates exactly as an untorn run would, retries converge every
    log to the same upto, and a PARTIAL vacuum (one log's folded dirs
    retired, the siblings' not) stays invisible to probes."""
    import os as _os

    import pytest as _pytest

    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        compact_text_index,
        incremental_text_dedup_drain,
        vacuum_text_index,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.state import _vacuum_segments
    from tools.degenerate_streaming import _tear_after, _TornWrite

    schema = "doc_id long, text string"
    ta = "the quick brown fox jumps over the lazy dog again and again"
    tb = "completely different words appear here instead tonight my friend"
    tc = "yet another unrelated sentence about mountains rivers and weather"
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    def arrive_and_drain(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        assert incremental_text_dedup_drain(
            spark, src, spark.createDataFrame([], schema).schema, work
        ) == 1

    arrive_and_drain([(0, ta)])
    arrive_and_drain([(10, ta), (11, tb)])

    # tear #1: shingle fold committed, sig/fan siblings unfolded
    with _tear_after(1) as hit:
        with _pytest.raises(_TornWrite):
            compact_text_index(spark, work)
    assert hit["fired"]
    assert _os.path.exists(f"{work}/shingle_index_compacted/upto=1/_SUCCESS")
    assert not _os.path.exists(f"{work}/sig_index_compacted")
    assert not _os.path.exists(f"{work}/band_fan_compacted")

    # a drain against the HALF-FOLDED state stays exact (fold+tail per
    # log spans the same rows either way)
    arrive_and_drain([(20, ta), (21, tc)])
    ann2 = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/doc_ann/batch=2").collect()
    }
    assert ann2 == {20: (True, 0), 21: (False, None)}

    # retry tears after the sig fold this time (the attempt's write #1
    # re-folds the shingle tail, #2 is the sig fold); a clean retry
    # then converges every log to the same upto — no double-fold of
    # the already-committed shingle span
    with _tear_after(2) as hit:
        with _pytest.raises(_TornWrite):
            compact_text_index(spark, work)
    assert hit["fired"]
    assert compact_text_index(spark, work) == 2

    # PARTIAL vacuum — only the shingle log's folded dirs retired (a
    # crash between per-log vacuums): probes read fold-only for the
    # shingle side, fold-plus-ignored-segments for the siblings
    _vacuum_segments(spark, f"{work}/shingle_index", f"{work}/shingle_index_compacted")
    arrive_and_drain([(30, tb), (31, "too short")])
    ann3 = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/doc_ann/batch=3").collect()
    }
    assert ann3 == {30: (True, 11), 31: (False, None)}

    # full vacuum + fold converge and stay in lockstep
    vacuum_text_index(spark, work)
    assert compact_text_index(spark, work) == 3


def test_streaming_text_dedup_short_docs_and_gap_batches(spark, tmp_path):
    """Degenerate inputs through the streaming path: a doc with fewer
    tokens than the shingle width has no index rows but must still be
    annotated (is_dup=false), an exact re-arrival of a short doc also
    stays unflagged (no shingles -> no candidates, the t20 operator's
    own semantics), and the segment-id gap left by a batch that
    processed zero rows is invisible to later probes and compaction."""
    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        compact_text_index,
        incremental_text_dedup_drain,
    )

    schema = "doc_id long, text string"
    ta = "the quick brown fox jumps over the lazy dog again and again"
    d1 = spark.createDataFrame([(0, ta), (1, "too short")], schema)
    d2 = spark.createDataFrame([], schema)  # drained, writes nothing
    d3 = spark.createDataFrame(
        # r8 sweep additions: NULL and empty text must be annotated
        # is_dup=false (no shingles -> no candidates), never crash
        [(20, ta), (21, "too short"), (22, None), (23, "")], schema
    )
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    for d in (d1, d2, d3):
        d.coalesce(1).write.mode("append").parquet(src)
    # the empty file is still a micro-batch for the checkpoint, but
    # processes zero rows -> only 2 count as processed, and batch ids
    # on disk are {0, 2}
    assert incremental_text_dedup_drain(spark, src, d1.schema, work) == 2
    assert sorted(
        int(p.rsplit("=", 1)[1]) for p in glob.glob(f"{work}/shingle_index/batch=*")
    ) == [0, 2]

    ann = {
        r["doc_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/doc_ann/batch=*").collect()
    }
    # 20 dups doc 0 across the gap; short/NULL/empty docs unflagged
    assert ann == {
        0: (False, None), 1: (False, None), 20: (True, 0),
        21: (False, None), 22: (False, None), 23: (False, None),
    }
    # compaction folds across the gap and stays in lockstep
    assert compact_text_index(spark, work) == 2


def test_log_state_raises_on_uncommitted_segment_below_tip(spark, tmp_path):
    """An uncommitted segment dir BELOW the committed tip is unreachable
    under the crash model (the checkpoint could not have advanced past
    it), so _log_state must refuse loudly rather than silently fold the
    partial dir's rows into reports — the documented contract."""
    import os as _os

    import pytest as _pytest

    from serverless_etl_reporting_pipeline_spark.streaming.state import _log_state

    seg_dir, comp_dir = str(tmp_path / "seg"), str(tmp_path / "comp")
    for i in (0, 1, 2):
        spark.createDataFrame([(i,)], "v int").write.mode("overwrite").parquet(
            f"{seg_dir}/batch={i}"
        )
    _os.remove(f"{seg_dir}/batch=1/_SUCCESS")  # restore damage, not a crash

    with _pytest.raises(RuntimeError, match="uncommitted segment"):
        _log_state(spark, seg_dir, comp_dir)

    # trailing in-flight dirs (above the tip) stay invisible, not fatal
    _os.remove(f"{seg_dir}/batch=2/_SUCCESS")
    frame, tip = _log_state(spark, seg_dir, comp_dir)
    assert tip == 0 and [r["v"] for r in frame.collect()] == [0]


def test_streaming_funnel_freezer_batch_replay_keeps_ev(spark, sf_dir, tmp_path):
    """Replay of the FIRST micro-batch after its benchmark write
    committed (crash between the freeze and the checkpoint commit): the
    _FROZEN_AT provenance marker tells the replay it IS the freezer, so
    it re-annotates with the md5-split ev — bit-identical to the
    original attempt — instead of flipping every benchmark member to
    ev=False."""
    from serverless_etl_reporting_pipeline_spark.operators.funnel import eval_split
    from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
        incremental_funnel_drain,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    b0 = docs.filter("doc_id < 200")
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    b0.coalesce(1).write.mode("append").parquet(src)

    # first drain freezes the benchmark and annotates batch 0
    assert incremental_funnel_drain(spark, src, docs.schema, work) == 1
    want = {
        r["doc_id"]: (r["q"], r["dd"], r["clean"])
        for r in spark.read.parquet(f"{work}/funnel_ann/batch=0").collect()
    }
    n_ev = b0.filter(eval_split()).count()
    assert n_ev > 0 and not any(
        want[r["doc_id"]][2] for r in b0.filter(eval_split()).collect()
    ), "benchmark members must never be clean"

    # simulate the crash: state written, checkpoint lost -> full replay
    import shutil

    shutil.rmtree(f"{work}/checkpoint")
    spark.createDataFrame([], docs.schema).write.mode("append").parquet(src)
    assert incremental_funnel_drain(spark, src, docs.schema, work) >= 1
    got = {
        r["doc_id"]: (r["q"], r["dd"], r["clean"])
        for r in spark.read.parquet(f"{work}/funnel_ann/batch=0").collect()
    }
    assert got == want


def test_prior_index_raises_on_one_sided_state(spark, tmp_path):
    """r7 advisor: the text-index logs advance in lockstep, so SOME
    sides having committed state while others have none is restore
    damage — the probe must refuse loudly instead of silently treating
    it as 'no prior state' and annotating every doc is_dup=False."""
    import shutil

    import pytest as _pytest

    from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
        _prior_index,
        incremental_text_dedup_drain,
    )

    schema = "doc_id long, text string"
    ta = "the quick brown fox jumps over the lazy dog again and again"
    d1 = spark.createDataFrame([(0, ta)], schema)
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_text_dedup_drain(spark, src, d1.schema, work) == 1

    # healthy three-sided state reads fine
    sh, sigs, fan = _prior_index(spark, work, 1)
    assert sh is not None and sigs is not None and fan is not None

    # one log lost (bad restore): loud refusal, not an empty index
    shutil.rmtree(f"{work}/sig_index")
    with _pytest.raises(RuntimeError, match="state damaged"):
        _prior_index(spark, work, 1)


def test_committed_dirs_survive_glob_metachar_workdir(spark, tmp_path):
    """r7 advisor: _committed_dirs builds a Hadoop glob from the work
    dir verbatim — a path containing glob metacharacters ([, {, *, ?)
    must still see its committed segments (escaped, not silently
    matching nothing)."""
    from serverless_etl_reporting_pipeline_spark.streaming.state import (
        _committed_dirs,
        _prior_segments,
    )

    base = str(tmp_path / "we[ird] {dir}" / "log")
    spark.range(3).coalesce(1).write.parquet(f"{base}/batch=0")
    spark.range(2).coalesce(1).write.parquet(f"{base}/batch=1")
    got = _committed_dirs(spark, base)
    assert [i for i, _ in got] == [0, 1], got
    # the READ path must also take segment URIs literally: an unescaped
    # spark.read.parquet would glob-interpret [ird] / {dir} and either
    # read a sibling dir or throw path-not-found on healthy state
    state = _prior_segments(spark, base, base + "_compacted", 2)
    assert state is not None and state.count() == 5


def test_kmv_drain_log_equals_batch(spark, events_src):
    """The s05 loop at unit level: `kmv_drain` over two file
    micro-batches lands per-batch sketch segments, `kmv_latest` reads
    back exactly the batch sketch of the union — and compaction,
    vacuum, and an empty re-drain are all invisible to that read."""
    from serverless_etl_reporting_pipeline_spark.operators.sketch import kmv_sketch_grouped
    from serverless_etl_reporting_pipeline_spark.streaming.sketches import (
        compact_kmv_log,
        kmv_drain,
        kmv_latest,
        vacuum_kmv_log,
    )

    events, src, tmp = events_src
    events.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    work = str(tmp / "kmvwork")
    assert kmv_drain(spark, src, SCHEMAS["events"], work, "event_type", F.col("user_id"), k=64) >= 2

    def snap():
        return {
            r["group_key"]: (r["n_rows"], r["k_used"], r["kth_hash"], r["est_distinct"])
            for r in kmv_latest(spark, work).filter("k_used > 0").collect()
        }

    want = {
        r["event_type"]: (r["n_rows"], r["k_used"], r["kth_hash"], r["est_distinct"])
        for r in kmv_sketch_grouped(events, ["event_type"], F.col("user_id"), k=64).collect()
    }
    assert snap() == want
    # fold + vacuum: newest-fold-plus-tail means the read can't tell
    assert compact_kmv_log(spark, work) is not None
    assert vacuum_kmv_log(spark, work)
    assert snap() == want
    # re-drain with no new files: checkpoint says nothing to do
    kmv_drain(spark, src, SCHEMAS["events"], work, "event_type", F.col("user_id"), k=64)
    assert snap() == want


def test_s05_registry_equals_batch_operator(spark, sf_dir):
    """Registry-level drain≡batch: the s05 query's staged drain must
    reproduce the batch `kmv_sketch_grouped` row-for-row (the oracle
    asserts the same against DuckDB; this pins it engine-side too)."""
    from serverless_etl_reporting_pipeline_spark.operators.sketch import kmv_sketch_grouped
    from serverless_etl_reporting_pipeline_spark.plans import REGISTRY

    got = {
        r["event_type"]: (r["n_rows"], r["k_used"], r["kth_hash"], r["est_distinct"])
        for r in REGISTRY["s05_kmv_streaming_drain"].builder(spark, sf_dir).collect()
    }
    want = {
        r["event_type"]: (r["n_rows"], r["k_used"], r["kth_hash"], r["est_distinct"])
        for r in kmv_sketch_grouped(
            load_table(spark, sf_dir, "events"), ["event_type"], F.col("user_id"), k=256
        ).collect()
    }
    assert got == want


def test_cache_tag_layout_fingerprint(tmp_path):
    """A drain/read LAYOUT change must invalidate the staged-drain
    scratch cache mechanically — no manual version-suffix bump (the r8
    verdict watch item on s04's /tmp cache)."""
    import os as _os

    from serverless_etl_reporting_pipeline_spark.plans.streams import _cache_tag

    f = tmp_path / "events.parquet"
    f.write_bytes(b"x" * 10)
    t1 = _cache_tag(str(f), "layout v1")
    assert t1 == _cache_tag(str(f), "layout v1")  # deterministic
    assert t1 != _cache_tag(str(f), "layout v2")  # layout change invalidates
    assert t1 != _cache_tag(str(f), "layout v1", "extra module")
    _os.utime(f, (1, 1))  # regenerated source at the same path invalidates
    assert _cache_tag(str(f), "layout v1") != t1


def test_kmv_latest_plan_shape(spark, events_src):
    """The s05 read path must stay bounded: ONE window partitioned by
    group_key over the segment log (never a partition-less global
    window), NO join of any kind — the latest-emission pick is a pure
    windowed filter on a groups×batches frame."""
    import re

    from serverless_etl_reporting_pipeline_spark.streaming.sketches import kmv_drain, kmv_latest

    events, src, tmp = events_src
    work = str(tmp / "kmvlint")
    kmv_drain(spark, src, SCHEMAS["events"], work, "event_type", F.col("user_id"), k=64)
    df = kmv_latest(spark, work)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    tree = plan.split("\n\n")[0]
    assert not re.findall(r"Join", tree), tree
    assert len(re.findall(r"\bWindow\b", tree)) == 1, tree
    # the window is keyed by group_key — a partition-less window would
    # funnel the whole log through one task
    assert re.search(r"partitionBy.*group_key|\[group_key", plan), plan


def test_scd2_empty_log_schema_matches_drained(spark, tmp_path):
    """The drained-but-empty read schema (`_SCD2_SCHEMA`) must stay
    mirror-identical to what a real drain writes — if the drain's
    select ever adds or retypes a column, this is the test that keeps
    an empty log from silently reading back with the stale schema."""
    import datetime as dt

    from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
        _SCD2_SCHEMA,
        incremental_scd2_drain,
        scd2_table,
    )

    t = dt.datetime(2024, 1, 1)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    # a drain whose feed has NO qualifying rows -> empty log
    src_e, work_e = str(tmp_path / "src_e"), str(tmp_path / "work_e")
    spark.createDataFrame([(1, t, 1, "view", 1.0, "{}")], SCHEMAS["events"]).select(
        cols
    ).coalesce(1).write.parquet(src_e)
    assert incremental_scd2_drain(spark, src_e, SCHEMAS["events"], work_e) == 0
    empty = scd2_table(spark, work_e)
    assert empty.count() == 0
    assert empty.schema == spark.createDataFrame([], _SCD2_SCHEMA).schema
    # a real drain must produce exactly that schema
    src_r, work_r = str(tmp_path / "src_r"), str(tmp_path / "work_r")
    spark.createDataFrame([(2, t, 1, "purchase", 2.0, "{}")], SCHEMAS["events"]).select(
        cols
    ).coalesce(1).write.parquet(src_r)
    assert incremental_scd2_drain(spark, src_r, SCHEMAS["events"], work_r) == 1
    assert scd2_table(spark, work_r).schema == empty.schema


def test_streaming_vector_dedup_corrupt_batch(spark, tmp_path):
    """Corrupt vectors flowing through the STREAMING dedup ingest: a
    micro-batch carrying every corrupt-vector class (NULL vector,
    ragged, NULL component, NaN component) must drain crash-free, screen
    each corrupt row as is_dup = false, and still equal the
    oracle-pinned batch operator on the same split — the v-query corrupt
    contract holding at the streaming surface too."""
    from serverless_etl_reporting_pipeline_spark.operators.vectors import (
        neardup_vector_index_probe,
    )
    from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
        incremental_vector_dedup_drain,
    )

    schema = "vec_id long, embedding array<float>"
    d1 = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])], schema
    )
    d2 = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 0.0]),        # true dup of vec 0
            (11, None),                         # NULL vector
            (12, [1.0, 0.0]),                   # ragged (len 2 of 4)
            (13, [1.0, None, 0.0, 0.0]),        # NULL component
            (14, [float("nan"), 0.0, 0.0, 0.0]),  # NaN component
        ],
        schema,
    )
    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    kw = dict(threshold=0.9, n_bits=8, bands=4, seed=7)

    d1.coalesce(1).write.mode("append").parquet(src)
    assert incremental_vector_dedup_drain(spark, src, d1.schema, work, **kw) == 1
    d2.coalesce(1).write.mode("append").parquet(src)
    assert incremental_vector_dedup_drain(spark, src, d1.schema, work, **kw) == 1

    got = {
        r["vec_id"]: (r["is_dup"], r["dup_src"])
        for r in spark.read.parquet(f"{work}/vec_ann/batch=1").collect()
    }
    assert got[10] == (True, 0)
    for corrupt in (11, 12, 13, 14):
        assert got[corrupt] == (False, None), corrupt
    want = {
        r["vec_id"]: (r["is_dup"], r["dup_src"])
        for r in neardup_vector_index_probe(d1, d2, **kw).collect()
    }
    assert got == want
