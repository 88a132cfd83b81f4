"""Composed curation pipeline: the corpus operators chained end-to-end.

The individual stages are each proven by their own oracle-checked
queries (t16 quality rules, t02-style normalized dedup, t19
decontamination, c10/c11 temperature mixture); this module proves they
COMPOSE — one declarative DataFrame job running

    raw corpus → quality filter → exact dedup keep-first
               → benchmark decontamination → temperature-mixture draw

with a per-domain funnel as the output, the accounting table a
pre-training data pipeline publishes after every curation run. The
reference has no equivalent (its ETL is a fixed 4-step
extract/transform/load, `pipeline/pipeline.py:15-31`); this is the
north-star composition those operators exist for.

Every stage is hash-deterministic (integer rules, md5 splits/draws,
explicit tie-breaks), so the ENTIRE five-stage funnel is reproduced
bit-for-bit by the DuckDB oracle — composition does not cost
checkability.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.funnel import (
    PIPE2_BUDGET,
    annotate_batch,
    eval_split,
    mixture_report,
    shingle_set,
)
from serverless_etl_reporting_pipeline_spark.operators.text import duck_casefold
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.plans.curation import _mixture_targets
from serverless_etl_reporting_pipeline_spark.plans.text import (
    _QF_MAX_REPETITION,
    _QF_MIN_STOPWORD_RATIO,
    _QF_MIN_TOKENS,
    _QF_PROFILE_SQL,
)
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table

_PIPE_BUDGET = 150  # selection budget: forces real downsampling at fixture scale


@query(
    "pipe01_pretrain_funnel",
    # One CTE chain restating every stage: the quality rules are ratios
    # of exact integers, dedup is a row_number over md5 of the pinned
    # casefold (operators/text.py duck_casefold, inlined below), the
    # eval split and the mixture draw are md5-prefix tests, and the
    # apportionment is integer largest-remainder — all previously proven
    # in t16/t02/t19/c10/c11; here they are asserted to survive
    # composition.
    oracle=_QF_PROFILE_SQL
    + f""",
    ann0 AS (
        SELECT d.doc_id, d.source, d.lang, d.text, md5(lower(translate(d.text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼'))) AS h,
               coalesce(p.n_tokens >= {_QF_MIN_TOKENS}
                AND p.stop * 1.0 / p.n_tokens >= {_QF_MIN_STOPWORD_RATIO}
                AND p.mx * 1.0 / p.n_tokens <= {_QF_MAX_REPETITION}, FALSE) AS q,
               substr(md5(CAST(d.doc_id AS STRING)), 1, 1) IN ('0', '1') AS ev
        FROM documents d LEFT JOIN profile p USING (doc_id)
    ),
    ded AS (
        -- winners keyed by (doc_id, h): under duplicate doc_ids a
        -- doc_id-only join would fan out (r10 duplicate-id hunt)
        SELECT doc_id, h FROM (
            SELECT doc_id, h,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
            FROM ann0 WHERE q
        ) WHERE rn = 1
    ),
    toks AS (
        SELECT doc_id, regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\\w+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, UNNEST(list_transform(
               generate_series(1, greatest(len(t) - 7, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS s
        FROM toks
    ),
    hold_sh AS (
        SELECT DISTINCT s FROM sh
        WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1')
    ),
    cont AS (
        SELECT DISTINCT sh.doc_id FROM sh JOIN hold_sh USING (s)
    ),
    ann AS (
        SELECT a.doc_id, a.source, a.lang, a.q,
               (d.doc_id IS NOT NULL) AS dd,
               (d.doc_id IS NOT NULL AND NOT a.ev AND c.doc_id IS NULL) AS clean
        FROM ann0 a
        LEFT JOIN ded d ON a.doc_id = d.doc_id AND a.h = d.h
        LEFT JOIN cont c ON a.doc_id = c.doc_id
    ),
    dom AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(round(sqrt(count(*)) * 1000000) AS BIGINT) AS w_micro
        FROM ann WHERE clean GROUP BY 1, 2
    ),
    t2 AS (
        SELECT dom.*, (SELECT sum(w_micro) FROM dom) AS s FROM dom
    ),
    b AS (
        SELECT *, ({_PIPE_BUDGET} * w_micro) // s AS base_t,
                  ({_PIPE_BUDGET} * w_micro) % s AS rem
        FROM t2
    ),
    r AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, source, lang) AS rk,
               (SELECT {_PIPE_BUDGET} - sum(base_t) FROM b) AS deficit
        FROM b
    ),
    tgt AS (
        SELECT source, lang, n_docs,
               CAST(base_t + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS target_docs
        FROM r
    ),
    selc AS (
        SELECT a.source, a.lang, CAST(count(*) AS BIGINT) AS n_sel
        FROM ann a JOIN tgt ON a.source = tgt.source AND a.lang = tgt.lang
        WHERE a.clean
          AND ('0x' || substr(md5(CAST(a.doc_id AS STRING)), 1, 8))::BIGINT
              / 4294967296.0 < tgt.target_docs / CAST(tgt.n_docs AS DOUBLE)
        GROUP BY 1, 2
    )
    SELECT a.source, a.lang,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(CASE WHEN a.q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN a.dd THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
           CAST(sum(CASE WHEN a.clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           CAST(coalesce(max(tgt.target_docs), 0) AS BIGINT) AS target_docs,
           CAST(coalesce(max(selc.n_sel), 0) AS BIGINT) AS n_selected
    FROM ann a
    LEFT JOIN tgt ON a.source = tgt.source AND a.lang = tgt.lang
    LEFT JOIN selc ON a.source = selc.source AND a.lang = selc.lang
    GROUP BY a.source, a.lang
    ORDER BY a.source, a.lang
    """,
    doc=f"END-TO-END curation pipeline (the capstone composition): quality filter "
    "(t16 rules) → normalized exact dedup keep-first (t02) → benchmark "
    "decontamination against the md5-prefix eval split (t19) → temperature-"
    f"mixture draw with budget {_PIPE_BUDGET} (c10+c11), reported as the per-"
    "(source, lang) funnel n_raw → n_quality → n_dedup → n_clean → n_selected. "
    "Scale shape: every stage is the already-audited shape of its standalone "
    "query — doc-keyed aggregates and windows, ONE persisted shingle subtree "
    "feeding both decontamination sides, the benchmark-sized shingle set and the "
    "domain target frame as the only broadcasts — so the composition adds joins "
    "keyed on doc_id (co-partitioned) and nothing super-linear",
)
def pipe01_pretrain_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ev = eval_split()
    # one persisted tokenize→shingle→distinct subtree feeds BOTH
    # decontamination sides (the t19 discipline)
    sh = shingle_set(docs).persist()
    hold_sh = sh.filter(ev).select("s").distinct()
    # the shared funnel stage (operators/funnel.py); the annotated frame
    # feeds THREE consumers (target build, selection, final funnel) —
    # persist it or the whole profile+dedup+decontamination upstream
    # recomputes per consumer (the t19 lesson at composition level)
    ann = (
        annotate_batch(docs, hold_sh, ev=ev, shingle_frame=sh)
        .select("doc_id", "source", "lang", "q", "dd", "clean")
        .persist()
    )

    tgt = _mixture_targets(ann.filter("clean"), budget=_PIPE_BUDGET).select(
        "source", "lang", "n_docs", "target_docs"
    )
    # the shared draw + report (operators/funnel.py mixture_report)
    return mixture_report(ann, tgt)


# cumulative-corpus selection budget for the incremental run — defined
# in operators/funnel.py so the streaming twin's default cannot drift
_PIPE2_BUDGET = PIPE2_BUDGET


@query(
    "pipe02_incremental_funnel",
    # The oracle is the FULL recompute over the union (the t20
    # discipline): one CTE chain restating quality, union-wide
    # keep-first dedup, frozen-benchmark decontamination and the
    # cumulative-count mixture draw, with the output restricted to the
    # delta snapshot. The Spark side computes the SAME rows
    # incrementally from persisted base state — the hash-equality is
    # the proof that incremental == recompute.
    oracle=_QF_PROFILE_SQL
    + f""",
    wm AS (
        SELECT CAST(floor(0.8 * (max(doc_id) + 1)) AS BIGINT) AS w FROM documents
    ),
    ann0 AS (
        SELECT d.doc_id, d.source, d.lang, d.text, md5(lower(translate(d.text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼'))) AS h,
               coalesce(p.n_tokens >= {_QF_MIN_TOKENS}
                AND p.stop * 1.0 / p.n_tokens >= {_QF_MIN_STOPWORD_RATIO}
                AND p.mx * 1.0 / p.n_tokens <= {_QF_MAX_REPETITION}, FALSE) AS q,
               (d.doc_id < wm.w
                AND substr(md5(CAST(d.doc_id AS STRING)), 1, 1) IN ('0', '1')) AS ev
        FROM documents d LEFT JOIN profile p USING (doc_id) CROSS JOIN wm
    ),
    ded AS (
        -- winners keyed by (doc_id, h): under duplicate doc_ids a
        -- doc_id-only join would fan out (r10 duplicate-id hunt)
        SELECT doc_id, h FROM (
            SELECT doc_id, h,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
            FROM ann0 WHERE q
        ) WHERE rn = 1
    ),
    toks AS (
        SELECT doc_id, regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\\w+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, UNNEST(list_transform(
               generate_series(1, greatest(len(t) - 7, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS s
        FROM toks
    ),
    hold_sh AS (
        SELECT DISTINCT s FROM sh CROSS JOIN wm
        WHERE doc_id < wm.w
          AND substr(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1')
    ),
    cont AS (
        SELECT DISTINCT sh.doc_id FROM sh JOIN hold_sh USING (s)
    ),
    ann AS (
        SELECT a.doc_id, a.source, a.lang, a.q,
               (d.doc_id IS NOT NULL) AS dd,
               (d.doc_id IS NOT NULL AND NOT a.ev AND c.doc_id IS NULL) AS clean
        FROM ann0 a
        LEFT JOIN ded d ON a.doc_id = d.doc_id AND a.h = d.h
        LEFT JOIN cont c ON a.doc_id = c.doc_id
    ),
    dom AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(round(sqrt(count(*)) * 1000000) AS BIGINT) AS w_micro
        FROM ann WHERE clean GROUP BY 1, 2
    ),
    t2 AS (
        SELECT dom.*, (SELECT sum(w_micro) FROM dom) AS s FROM dom
    ),
    b AS (
        SELECT *, ({_PIPE2_BUDGET} * w_micro) // s AS base_t,
                  ({_PIPE2_BUDGET} * w_micro) % s AS rem
        FROM t2
    ),
    r AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, source, lang) AS rk,
               (SELECT {_PIPE2_BUDGET} - sum(base_t) FROM b) AS deficit
        FROM b
    ),
    tgt AS (
        SELECT source, lang, n_docs,
               CAST(base_t + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS target_docs
        FROM r
    ),
    selc AS (
        SELECT a.source, a.lang, CAST(count(*) AS BIGINT) AS n_sel
        FROM ann a
        JOIN tgt ON a.source = tgt.source AND a.lang = tgt.lang
        CROSS JOIN wm
        WHERE a.clean AND a.doc_id >= wm.w
          AND ('0x' || substr(md5(CAST(a.doc_id AS STRING)), 1, 8))::BIGINT
              / 4294967296.0 < tgt.target_docs / CAST(tgt.n_docs AS DOUBLE)
        GROUP BY 1, 2
    )
    SELECT a.source, a.lang,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(CASE WHEN a.q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN a.dd THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
           CAST(sum(CASE WHEN a.clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           CAST(coalesce(max(dom.n_docs), 0) AS BIGINT) AS cum_clean,
           CAST(coalesce(max(tgt.target_docs), 0) AS BIGINT) AS target_docs,
           CAST(coalesce(max(selc.n_sel), 0) AS BIGINT) AS n_selected
    FROM ann a CROSS JOIN wm
    LEFT JOIN dom ON a.source = dom.source AND a.lang = dom.lang
    LEFT JOIN tgt ON a.source = tgt.source AND a.lang = tgt.lang
    LEFT JOIN selc ON a.source = selc.source AND a.lang = selc.lang
    WHERE a.doc_id >= wm.w
    GROUP BY a.source, a.lang
    ORDER BY a.source, a.lang
    """,
    doc=f"INCREMENTAL curation funnel: the pipe01 pipeline re-run on a freshly-"
    "ingested delta snapshot (ids past the 0.8 watermark, t20's split) against "
    "PERSISTED base state — the quality-doc hash index for keep-first dedup, the "
    "frozen benchmark shingle index for decontamination, and cumulative per-domain "
    "clean counts feeding a fresh largest-remainder mixture apportionment "
    f"(budget {_PIPE2_BUDGET}) over base+delta. This is the per-batch shape the "
    "reference's watermark ETL (pipeline/ETL/extract.py:36-81) generalizes to: "
    "work ∝ delta + index probes, never a union recompute — while the oracle IS "
    "the union recompute, so the hash match proves incremental ≡ batch. Scale "
    "shape: delta-side scans carry the pushed watermark filter, the benchmark "
    "index is the only broadcast, the hash-index anti-join is a plain keyed join "
    "(corpus-scale at 100 TB — the c08 lesson), domain state is aggregate-sized",
)
def pipe02_incremental_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.plans.curation import _mixture_targets_from_counts

    docs = load_table(spark, sf_dir, "documents")
    # scalar watermark: parquet max statistic (t20's 1-row-scalar
    # idiom); empty corpus → wm 0, both halves empty. SNAPSHOT
    # semantics: wm is baked into the plan at call time
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    wm = int(0.8 * (max_id + 1)) if max_id is not None else 0
    base = docs.filter(F.col("doc_id") < wm)
    delta = docs.filter(F.col("doc_id") >= wm)
    # the benchmark split is FROZEN at base-ingestion time: eval docs are
    # drawn from the base snapshot only, so later deltas can't mutate the
    # benchmark (and base-side state stays valid as deltas arrive)
    ev = eval_split()

    # ---- persisted base state: built once at base ingestion, reused per
    # delta batch (in-session stand-in for the stored index tables) ----
    # one base shingle subtree feeds the benchmark index AND the base
    # contamination check (the t19/pipe01 discipline)
    sh_b = shingle_set(base).persist()
    # state 1: the frozen benchmark shingle index
    hold_sh = sh_b.filter(ev).select("s").distinct().persist()
    # states 2+3 from ONE persisted base annotation pass: the hash
    # index is exactly the annotation's (q, h) projection, so deriving
    # it from the same frame that feeds the domain counts drops a whole
    # second base-corpus profile+content-hash scan (quality_hashes re-ran
    # _token_profile and the casefold content hash over every base doc — the
    # r13 duplicated-subtree find; the dedup window and contamination
    # join the annotation adds were already being paid by state 3)
    ann_b = (
        annotate_batch(base, hold_sh, ev=ev, shingle_frame=sh_b)
        .select("source", "lang", "h", "q", "clean")
        .persist()
    )
    # state 2: content-hash index of base quality docs (keep-first blocker)
    base_hashes = ann_b.filter("q").select("h").distinct()
    # state 3: cumulative per-domain clean counts (aggregate-sized)
    base_dom = (
        ann_b.filter("clean")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )

    # ---- the incremental delta pass: work ∝ delta + index probes; the
    # SAME shared stage (operators/funnel.py), now probing the persisted
    # state — union keep-first ≡ first-within-delta AND hash unseen in
    # base state (base ids all precede delta ids): a plain keyed
    # anti-join, the hash index is corpus-scale at 100 TB, never
    # broadcast (the c08 lesson). Delta docs are never benchmark members
    # (the split is frozen), so ev defaults to none.
    ann_d = (
        annotate_batch(delta, hold_sh, seen_hashes=base_hashes)
        .select("doc_id", "source", "lang", "q", "dd", "clean")
        .persist()
    )

    delta_dom = (
        ann_d.filter("clean")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    # cumulative counts = persisted base counts + fresh delta counts;
    # targets re-apportion over the cumulative corpus WITHOUT rescanning it
    cum_dom = (
        base_dom.unionByName(delta_dom)
        .groupBy("source", "lang")
        .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
    )
    tgt = _mixture_targets_from_counts(cum_dom, budget=_PIPE2_BUDGET).select(
        "source", "lang", "n_docs", "target_docs"
    )
    # the shared draw + report (operators/funnel.py mixture_report); the
    # selection pool is the delta only, targets span the cumulative corpus
    return mixture_report(ann_d, tgt, with_cum=True)


# ---------------------------------------------------------------------------
# pipe03: the incremental funnel priced the way it DEPLOYS (r12 verdict
# ask #2) — base state persisted ON DISK once per corpus, the query a
# fixed-size delta probe against it.

_P3_DELTA_CAP = 1000  # fixed-size ingest batch: ids past max_id+1-Δ
_P3_BENCH_CAP = 1000  # benchmark frozen from the first-id prefix
_P3_CACHE_ROOT = "/tmp/spark_graft_pipe03"


def _pipe03_splits(n: int) -> tuple[int, int]:
    """(watermark, benchmark cut) for a corpus of id-span ``n``: the
    delta is the newest 20% CAPPED at Δ=1000 docs — a fixed-size ingest
    batch once the corpus outgrows 5Δ, which is what keeps the probe's
    data terms flat as the corpus scales — and the benchmark split is
    frozen over the FIRST min(wm, 1000) ids (the streaming funnel's
    frozen-at-first-ingestion discipline: benchmark-sized, never
    corpus-sized, so its shingle index stays broadcastable at 100 TB
    where pipe02's base-wide eval split would not be)."""
    delta_n = min(_P3_DELTA_CAP, n // 5)
    wm = n - delta_n
    return wm, min(wm, _P3_BENCH_CAP)


def _docs_fingerprint(sf_dir: str) -> str:
    """Cache key for the persisted base state: (name, size, mtime) of
    every file under the documents table — metadata only, no data scan.
    A regenerated corpus (doctored sweeps rewrite in place) changes
    mtimes and invalidates; content-equal rewrites rebuild spuriously,
    which costs a rebuild, never correctness."""
    p = os.path.join(sf_dir, "documents.parquet")
    parts = []
    if os.path.isdir(p):
        for name in sorted(os.listdir(p)):
            st = os.stat(os.path.join(p, name))
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(p):
        st = os.stat(p)
        parts.append(f"doc:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def _pipe03_state(
    spark: SparkSession, sf_dir: str, wm: int, bench_w: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read — or build once PER SPARK APPLICATION — the persisted base
    funnel state for ``sf_dir``: (frozen benchmark shingle index, base
    quality-hash index, per-domain base clean counts), parquet under a
    cache dir keyed by the application id + corpus fingerprint + split
    geometry. The build is the 'base ingestion' event a deployment pays
    exactly once (the streaming funnel's batch-0 freeze,
    `streaming/funnel.py`); later probes in the same session read three
    parquet scans instead. The application id in the key is the
    no-cross-run-precomputation guarantee: every bench/oracle PROCESS
    recomputes the state from the parquet inputs before any probe is
    timed — nothing keyed on the test data outlives the session (the
    in-session reuse is the same CacheManager-equivalence the other
    incremental probes' persist() calls get). The corpus fingerprint
    still invalidates when a sweep rewrites the table mid-session. A
    crashed build leaves no ``_COMMITTED`` marker and is rebuilt with
    overwrite (the segment-log idempotence discipline)."""
    from serverless_etl_reporting_pipeline_spark.sources.reader import scoped_scratch_dir

    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{_docs_fingerprint(sf_dir)}|{wm}|{bench_w}".encode()
    ).hexdigest()
    # scoped_scratch_dir adds the r14 lifecycle hygiene: atexit removal
    # of this application's dir + stale-sibling reaping (crashed runs)
    cache = os.path.join(
        scoped_scratch_dir(_P3_CACHE_ROOT, spark.sparkContext.applicationId), key
    )
    marker = os.path.join(cache, "_COMMITTED")
    if not os.path.exists(marker):
        docs = load_table(spark, sf_dir, "documents")
        base = docs.filter(F.col("doc_id") < wm)
        ev_b = (F.col("doc_id") < bench_w) & eval_split()
        # one base shingle subtree feeds the benchmark index AND the
        # base contamination check (the t19/pipe01 discipline)
        sh_b = shingle_set(base).persist()
        # both state tables from ONE persisted base annotation pass
        # (the pipe02 discipline): the hash index is the annotation's
        # (q, h) projection — a separate quality_hashes build re-ran
        # the profile+content-hash scan over every base doc
        ann_b = None
        try:
            sh_b.filter(ev_b).select("s").distinct().write.mode("overwrite").parquet(
                os.path.join(cache, "hold_sh")
            )
            hold = spark.read.parquet(os.path.join(cache, "hold_sh"))
            ann_b = (
                annotate_batch(base, hold, ev=ev_b, shingle_frame=sh_b)
                .select("source", "lang", "h", "q", "clean")
                .persist()
            )
            ann_b.filter("q").select("h").distinct().write.mode("overwrite").parquet(
                os.path.join(cache, "base_hashes")
            )
            (
                ann_b.filter("clean")
                .groupBy("source", "lang")
                .agg(F.count("*").cast("bigint").alias("n_docs"))
                .write.mode("overwrite")
                .parquet(os.path.join(cache, "base_dom"))
            )
        finally:
            sh_b.unpersist()
            if ann_b is not None:
                ann_b.unpersist()
        open(marker, "w").close()
    return (
        spark.read.parquet(os.path.join(cache, "hold_sh")),
        spark.read.parquet(os.path.join(cache, "base_hashes")),
        spark.read.parquet(os.path.join(cache, "base_dom")),
    )


@query(
    "pipe03_funnel_delta_probe",
    # The oracle IS the union recompute (the t20/pipe02 discipline):
    # quality, union-wide keep-first dedup, decontamination against the
    # first-1000-ids benchmark split, cumulative-count apportionment,
    # output restricted to the fixed-size delta. The Spark side computes
    # the SAME rows from state persisted on disk — the hash equality is
    # the proof that probe-of-stored-state ≡ batch recompute.
    oracle=_QF_PROFILE_SQL
    + f""",
    wm AS (
        SELECT n - least({_P3_DELTA_CAP}, n // 5) AS w,
               least(n - least({_P3_DELTA_CAP}, n // 5), {_P3_BENCH_CAP}) AS bw
        FROM (SELECT greatest(coalesce(max(doc_id), -1) + 1, 0) AS n FROM documents)
    ),
    ann0 AS (
        SELECT d.doc_id, d.source, d.lang, d.text, md5({duck_casefold('d.text')}) AS h,
               coalesce(p.n_tokens >= {_QF_MIN_TOKENS}
                AND p.stop * 1.0 / p.n_tokens >= {_QF_MIN_STOPWORD_RATIO}
                AND p.mx * 1.0 / p.n_tokens <= {_QF_MAX_REPETITION}, FALSE) AS q,
               (d.doc_id < wm.bw
                AND substr(md5(CAST(d.doc_id AS STRING)), 1, 1) IN ('0', '1')) AS ev
        FROM documents d LEFT JOIN profile p USING (doc_id) CROSS JOIN wm
    ),
    ded AS (
        -- winners keyed by (doc_id, h): under duplicate doc_ids a
        -- doc_id-only join would fan out (r10 duplicate-id hunt)
        SELECT doc_id, h FROM (
            SELECT doc_id, h,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
            FROM ann0 WHERE q
        ) WHERE rn = 1
    ),
    toks AS (
        SELECT doc_id, regexp_extract_all({duck_casefold('text')}, '\\w+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, UNNEST(list_transform(
               generate_series(1, greatest(len(t) - 7, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS s
        FROM toks
    ),
    hold_sh AS (
        SELECT DISTINCT s FROM sh CROSS JOIN wm
        WHERE doc_id < wm.bw
          AND substr(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1')
    ),
    cont AS (
        SELECT DISTINCT sh.doc_id FROM sh JOIN hold_sh USING (s)
    ),
    ann AS (
        SELECT a.doc_id, a.source, a.lang, a.q,
               (d.doc_id IS NOT NULL) AS dd,
               (d.doc_id IS NOT NULL AND NOT a.ev AND c.doc_id IS NULL) AS clean
        FROM ann0 a
        LEFT JOIN ded d ON a.doc_id = d.doc_id AND a.h = d.h
        LEFT JOIN cont c ON a.doc_id = c.doc_id
    ),
    dom AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(round(sqrt(count(*)) * 1000000) AS BIGINT) AS w_micro
        FROM ann WHERE clean GROUP BY 1, 2
    ),
    t2 AS (
        SELECT dom.*, (SELECT sum(w_micro) FROM dom) AS s FROM dom
    ),
    b AS (
        SELECT *, ({_PIPE2_BUDGET} * w_micro) // s AS base_t,
                  ({_PIPE2_BUDGET} * w_micro) % s AS rem
        FROM t2
    ),
    r AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, source, lang) AS rk,
               (SELECT {_PIPE2_BUDGET} - sum(base_t) FROM b) AS deficit
        FROM b
    ),
    tgt AS (
        SELECT source, lang, n_docs,
               CAST(base_t + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS target_docs
        FROM r
    ),
    selc AS (
        SELECT a.source, a.lang, CAST(count(*) AS BIGINT) AS n_sel
        FROM ann a
        JOIN tgt ON a.source = tgt.source AND a.lang = tgt.lang
        CROSS JOIN wm
        WHERE a.clean AND a.doc_id >= wm.w
          AND ('0x' || substr(md5(CAST(a.doc_id AS STRING)), 1, 8))::BIGINT
              / 4294967296.0 < tgt.target_docs / CAST(tgt.n_docs AS DOUBLE)
        GROUP BY 1, 2
    )
    SELECT a.source, a.lang,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(CASE WHEN a.q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN a.dd THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
           CAST(sum(CASE WHEN a.clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           CAST(coalesce(max(dom.n_docs), 0) AS BIGINT) AS cum_clean,
           CAST(coalesce(max(tgt.target_docs), 0) AS BIGINT) AS target_docs,
           CAST(coalesce(max(selc.n_sel), 0) AS BIGINT) AS n_selected
    FROM ann a CROSS JOIN wm
    LEFT JOIN dom ON a.source = dom.source AND a.lang = dom.lang
    LEFT JOIN tgt ON a.source = tgt.source AND a.lang = tgt.lang
    LEFT JOIN selc ON a.source = selc.source AND a.lang = selc.lang
    WHERE a.doc_id >= wm.w
    GROUP BY a.source, a.lang
    ORDER BY a.source, a.lang
    """,
    doc="incremental funnel priced the way it DEPLOYS (pipe02's persisted-state "
    "twin, r12 verdict ask #2): the base funnel state — frozen benchmark shingle "
    "index (first-1000-ids eval split, benchmark-sized at any corpus scale), "
    "quality-hash keep-first index, per-domain clean counts — is built ONCE per "
    "corpus into an on-disk parquet cache (_pipe03_state, the streaming funnel's "
    "batch-0 freeze as a batch query), and the priced query is a FIXED-SIZE "
    f"delta probe (newest 20% capped at {_P3_DELTA_CAP} docs) against it: "
    "annotate the delta (bounded_batch scan-only anti-join vs the hash index, "
    "broadcast benchmark decontamination), merge aggregate-sized domain counts, "
    "re-apportion, draw. Work per run ∝ delta + one scan of each state table — "
    "never a base recompute; the oracle IS the union recompute, so the hash "
    "match proves incremental ≡ batch. Scale shape: state scans are columnar "
    "and index-sized, every broadcast is batch- or benchmark-bounded, and the "
    "x64→x256 steady growth the stress ladder prices is the state-scan term "
    "alone (pipe02's in-query base rebuild was 3/4 of its wall)",
)
def pipe03_funnel_delta_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.plans.curation import _mixture_targets_from_counts

    docs = load_table(spark, sf_dir, "documents")
    # scalar watermark from the parquet max statistic (t20's idiom);
    # SNAPSHOT semantics — wm is baked into the plan at call time
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    n = int(mx) + 1 if mx is not None else 0
    wm, bench_w = _pipe03_splits(n)
    hold, base_hashes, base_dom = _pipe03_state(spark, sf_dir, wm, bench_w)

    delta = docs.filter(F.col("doc_id") >= wm)
    # the shared funnel stage probing STORED state: bounded_batch —
    # the delta is Δ-capped by construction, so the keep-first
    # anti-join runs scan-only against the hash index (the r12
    # bounded-probe pattern, here in a registry-priced plan); delta
    # docs are never benchmark members (ids ≥ wm ≥ bench_w), so ev
    # defaults to none
    ann_d = (
        annotate_batch(delta, hold, seen_hashes=base_hashes, bounded_batch=True)
        .select("doc_id", "source", "lang", "q", "dd", "clean")
        .persist()
    )
    delta_dom = (
        ann_d.filter("clean")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    # cumulative counts = stored base counts + fresh delta counts;
    # targets re-apportion over the cumulative corpus without a rescan
    cum_dom = (
        base_dom.unionByName(delta_dom)
        .groupBy("source", "lang")
        .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
    )
    tgt = _mixture_targets_from_counts(cum_dom, budget=_PIPE2_BUDGET).select(
        "source", "lang", "n_docs", "target_docs"
    )
    return mixture_report(ann_d, tgt, with_cum=True)
