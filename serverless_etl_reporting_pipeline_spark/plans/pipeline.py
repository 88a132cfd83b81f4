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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.funnel import (
    PIPE2_BUDGET,
    annotate_batch,
    eval_split,
    mixture_report,
    quality_hashes,
    shingle_set,
)
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
    # state 2: content-hash index of base quality docs (keep-first
    # blocker) — built from the profile subtree alone (quality_hashes),
    # not the full annotation tree: the index does not need the dedup
    # window or the contamination join. NOT persisted: it feeds exactly
    # one action (the delta anti-join)
    base_hashes = quality_hashes(base)
    # state 3: cumulative per-domain clean counts (aggregate-sized)
    base_dom = (
        annotate_batch(base, hold_sh, ev=ev, shingle_frame=sh_b)
        .filter("clean")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .persist()
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
