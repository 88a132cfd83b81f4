"""Corpus-curation queries (c-group): the high-frequency operators of a
large-scale training-data pipeline, beyond the t-group text analysis —
PII/URL scrubbing, Bloom-style decontamination, entropy-based quality,
domain-level corpus stats, weighted domain sampling, and char-n-gram LM
scoring (SURVEY.md §2.11 extension surface).

Every query is oracle-checked against DuckDB on the same parquet inputs.
Engine-portability discipline (FIXTURES.md §3): hashes are md5 (identical
hex in both engines; 4/8-hex-char slices convert exactly to ints via
Spark `conv` / DuckDB `('0x'||h)::BIGINT` — verified bit-identical),
log2-based scores are quantized to 1e-6 integers per TERM so the
aggregating sums are exact integer arithmetic (order-independent), and
final rounding happens at 1e-4 where a last-ulp libm difference cannot
flip the value.

Scale notes are per-query. The synthetic fixtures contain no real PII,
so c01 uses the standard known-answer design for scrubbers: deterministic
PII is injected from doc_id IDENTICALLY in both engines, then scrubbed by
the generic patterns — which makes the oracle comparison a real test of
regex-dialect parity and replacement behavior, not a vacuous no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.text import shingles, tokens
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table, spread_scan

# Generic scrub patterns — valid and equivalent in Java regex (Spark) and
# RE2 (DuckDB): no lookaround, no backrefs.
_RE_URL = r"https?://\S+"
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_RE_PHONE = r"\+\d[\d-]{6,}\d"

# ENGINE-side email pattern (r11 ReDoS hunt): Spark's java.util.regex
# is a backtracking matcher with NO memoization, so the find() loop
# retries the leading `[...]+` at EVERY offset of a long unbroken
# alphanumeric run — O(n^2): one crafted 80 KB run cost 35 s on one
# core (a 1 MB run is hours — a denial-of-service a scraped 100 TB
# corpus WILL eventually contain). The negative lookbehind makes every
# inside-run start fail in O(1), so each run is scanned once — same
# crafted input measured 0.31 s (flat), and the MATCH SET is provably
# identical: a start inside a run reaches exactly the same '@' as the
# run's start, so the leftmost match never changes (pinned by
# tests/test_operators.py::test_pii_email_regex_linear_scan).
# The ORACLE keeps the plain pattern — DuckDB's RE2 is linear by
# construction and does not support lookbehind. URL/IP/PHONE need no
# anchor: their find loops fail in O(1) at non-prefix offsets
# (literal 'h'/'+' heads, bounded {1,3} quantifiers).
_RE_EMAIL_ENGINE = r"(?<![A-Za-z0-9._%+-])" + _RE_EMAIL


@query(
    "c01_pii_scrub",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id,
               text
               || ' see https://example.org/d/' || CAST(doc_id AS STRING)
                  || '?ref=' || substr(md5(CAST(doc_id AS STRING)), 1, 6)
               || CASE WHEN doc_id % 2 = 0
                       THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 3 = 0
                       THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' from 10.' || CAST(doc_id % 256 AS STRING)
                            || '.0.' || CAST((doc_id * 7) % 256 AS STRING)
                       ELSE '' END
               AS t
        FROM documents
    ),
    scrubbed AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_RE_URL}')) AS INT) AS n_urls,
               CAST(len(regexp_extract_all(t, '{_RE_EMAIL}')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(t, '{_RE_PHONE}')) AS INT) AS n_phones,
               CAST(len(regexp_extract_all(t, '{_RE_IP}')) AS INT) AS n_ips,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(t, '{_RE_URL}', '<URL>', 'g'),
                           '{_RE_EMAIL}', '<EMAIL>', 'g'),
                       '{_RE_IP}', '<IP>', 'g'),
                   '{_RE_PHONE}', '<PHONE>', 'g') AS clean
        FROM aug
    )
    SELECT doc_id, n_urls, n_emails, n_phones, n_ips,
           md5(clean) AS scrub_fp,
           CAST(length(clean) AS BIGINT) AS n_chars_clean
    FROM scrubbed
    ORDER BY doc_id
    """,
    doc="PII/URL scrubbing (emails, URLs, phones, IPs → typed placeholders) with "
    "per-class redaction counts — the privacy pass every corpus pipeline runs "
    "before training. Known-answer design: deterministic PII synthesized from "
    "doc_id identically in both engines (fixtures carry none), so the hash "
    "compare exercises real regex/replacement parity. Map-only at any scale: "
    "regexp_count + a regexp_replace chain, all JVM codegen, no shuffle",
)
def c01_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the regex chains — c01
    # is map-only, so at fixture scale the whole 4-pattern scrub of
    # every document ran on one core (1.29 -> 0.83 s isolated at sf0.1);
    # see sources/reader.py spread_scan (no-op on a many-split input)
    docs = spread_scan(docs, "doc_id")
    sid = F.col("doc_id").cast("string")
    aug = F.concat(
        F.col("text"),
        F.lit(" see https://example.org/d/"),
        sid,
        F.lit("?ref="),
        F.substring(F.md5(sid.cast("binary")), 1, 6),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" contact user"), sid, F.lit("@example.com")),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" call +1-555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
            ),
        ).otherwise(""),
    )
    base = docs.select("doc_id", aug.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("t"), _RE_URL, "<URL>"),
                _RE_EMAIL_ENGINE,
                "<EMAIL>",
            ),
            _RE_IP,
            "<IP>",
        ),
        _RE_PHONE,
        "<PHONE>",
    )
    return (
        base.select(
            "doc_id",
            F.regexp_count("t", F.lit(_RE_URL)).alias("n_urls"),
            F.regexp_count("t", F.lit(_RE_EMAIL_ENGINE)).alias("n_emails"),
            F.regexp_count("t", F.lit(_RE_PHONE)).alias("n_phones"),
            F.regexp_count("t", F.lit(_RE_IP)).alias("n_ips"),
            clean.alias("clean"),
        )
        .select(
            "doc_id",
            "n_urls",
            "n_emails",
            "n_phones",
            "n_ips",
            F.md5(F.col("clean").cast("binary")).alias("scrub_fp"),
            F.length("clean").cast("bigint").alias("n_chars_clean"),
        )
        .orderBy("doc_id")
    )


# Bloom geometry for c02: m = 2^16 bits, k = 2 md5-derived hash functions.
# At eval-set sizes within ~m/4 set bits, per-shingle FP rate is density²
# — the classic space/FP trade a real pipeline sizes m against.
_BLOOM_HEX = 4  # 4 hex chars = 16 bits = positions in [0, 65536)


@query(
    "c02_bloom_decontamination",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, UNNEST(list_transform(
               generate_series(1, greatest(len(t) - 7, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS s
        FROM toks
    ),
    h AS (
        SELECT doc_id,
               ('0x' || substr(md5(s), 1, 4))::BIGINT AS h1,
               ('0x' || substr(md5(s), 5, 4))::BIGINT AS h2
        FROM sh
    ),
    bits AS (
        SELECT DISTINCT bit
        FROM (SELECT UNNEST([h1, h2]) AS bit
              FROM h
              WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1'))
    )
    SELECT doc_id, count(*) AS n_hit_shingles
    FROM h
    WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) NOT IN ('0', '1')
      AND h1 IN (SELECT bit FROM bits)
      AND h2 IN (SELECT bit FROM bits)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Bloom-style decontamination: the held-out split's 8-gram shingles set "
    "k=2 md5-derived bit positions in an m=2^16 filter; a training doc is "
    "flagged per shingle whose BOTH positions are set (true overlaps + the "
    "filter's false positives — the semantics a real Bloom gate has, unlike "
    "t19's exact join). Scale shape: the filter is ≤m distinct bit rows, "
    "broadcast to two semi-joins; the training side is map + broadcast-probe "
    "only — at 100 TB the corpus never shuffles until the per-doc count",
)
def c02_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the fan-out (see
    # sources/reader.py spread_scan; no-op on a many-split input)
    docs = spread_scan(docs, "doc_id")
    # one md5 per shingle; both hash slices come from it. The shingle
    # subtree feeds the filter build AND the probe side — persist it.
    hashed = (
        docs.select("doc_id", tokens("text").alias("t"))
        .select("doc_id", F.explode(shingles("t", 8)).alias("s"))
        .distinct()
        .withColumn("_h", F.md5(F.col("s").cast("binary")))
        .select(
            "doc_id",
            F.conv(F.substring("_h", 1, _BLOOM_HEX), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring("_h", _BLOOM_HEX + 1, _BLOOM_HEX), 16, 10).cast("long").alias("h2"),
        )
        .persist()
    )
    is_hold = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1).isin("0", "1")
    bits = (
        hashed.filter(is_hold)
        .select(F.explode(F.array("h1", "h2")).alias("bit"))
        .distinct()
    )
    b1 = bits.withColumnRenamed("bit", "h1")
    b2 = bits.withColumnRenamed("bit", "h2")
    return (
        hashed.filter(~is_hold)
        .join(F.broadcast(b1), "h1", "left_semi")
        .join(F.broadcast(b2), "h2", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_shingles"))
        .orderBy("doc_id")
    )


@query(
    "c03_entropy_quality",
    # Per-term quantization keeps the aggregate exact: round(log2(c)*1e6)
    # is one libm call on the same integer in both engines (a last-ulp
    # difference would have to land within 1e-15 of a .5 boundary to
    # diverge), and after quantization the weighted sum is pure integer
    # arithmetic — order-independent, engine-identical.
    oracle="""
    WITH chars AS (
        SELECT doc_id, UNNEST(string_split(text, '')) AS ch FROM documents
    ),
    counts AS (
        SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
    ),
    agg AS (
        SELECT doc_id,
               sum(c) AS n,
               CAST(count(*) AS BIGINT) AS distinct_chars,
               sum(c * CAST(round(log2(c) * 1000000) AS BIGINT)) AS s
        FROM counts GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars_seen,
           distinct_chars,
           round((log2(n) - s / 1000000.0 / n) * 10000) / 10000.0 AS entropy
    FROM agg
    ORDER BY doc_id
    """,
    doc="entropy-based quality score: per-doc Shannon entropy of the character "
    "distribution (H = log2(n) - Σc·log2(c)/n over exact integer counts) — the "
    "cheap gibberish/boilerplate screen of a curation pipeline (low-entropy = "
    "repetitive filler, high-entropy = random noise). One explode + two "
    "map-side-combined hash aggregates keyed by doc — linear, no skew "
    "(per-doc fan-out is bounded by text length)",
)
def c03_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the fan-out (see
    # sources/reader.py spread_scan; no-op on a many-split input)
    docs = spread_scan(docs, "doc_id")
    counts = (
        docs.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").cast("bigint").alias("distinct_chars"),
        F.sum(F.col("c") * F.round(F.log2("c") * 1000000).cast("bigint")).alias("s"),
    )
    entropy = F.log2("n") - F.col("s") / 1000000.0 / F.col("n")
    return agg.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars_seen"),
        "distinct_chars",
        (F.round(entropy * 10000) / 10000.0).alias("entropy"),
    ).orderBy("doc_id")


@query(
    "c04_domain_stats",
    oracle=r"""
    SELECT source,
           count(*) AS docs,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS langs,
           CAST(count(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')),
                '[^a-z0-9\t\n\x0B\f\r ]', '', 'g'), '[\t\n\x0B\f\r ]+', ' ', 'g')))) AS BIGINT) AS distinct_fp,
           round((count(*) - count(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')),
                '[^a-z0-9\t\n\x0B\f\r ]', '', 'g'), '[\t\n\x0B\f\r ]+', ' ', 'g')))))
                 * 10000.0 / count(*)) / 10000.0 AS dup_ratio,
           round(sum(n_chars) * 100.0 / count(*)) / 100.0 AS mean_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="domain-level corpus stats: per-source doc/char volume, language spread, "
    "distinct normalized fingerprints and the implied duplication ratio, mean "
    "doc length — the per-domain scorecard that drives c05's sampling weights. "
    "Single hash aggregate keyed by source (the fingerprint is t02/t06's md5 "
    "normalization); every output is a ratio of exact integers",
)
def c04_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.operators.text import fingerprint_md5

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("source", "lang", "n_chars", fingerprint_md5("text").alias("fp"))
    return (
        base.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
            F.countDistinct("lang").cast("bigint").alias("langs"),
            F.countDistinct("fp").cast("bigint").alias("distinct_fp"),
        )
        .select(
            "source",
            "docs",
            "chars",
            "langs",
            "distinct_fp",
            (F.round((F.col("docs") - F.col("distinct_fp")) * 10000.0 / F.col("docs")) / 10000.0).alias(
                "dup_ratio"
            ),
            (F.round(F.col("chars") * 100.0 / F.col("docs")) / 100.0).alias("mean_chars"),
        )
        .orderBy("source")
    )


@query(
    "c05_weighted_sample",
    # Acceptance test u < w over exact values: u = first 32 md5 bits / 2^32
    # (an exact dyadic rational), w = (src_num+1)/21 (identical double in
    # both engines) — so the accept/reject decision is bit-identical and
    # the sample is rerun-stable with no RNG.
    oracle="""
    SELECT doc_id, source,
           round(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))::BIGINT
                 / 4294967296.0 * 1000000) / 1000000.0 AS u
    FROM documents
    -- TRY_CAST: a source id outside the srcNN scheme has no defined
    -- weight — the doc is excluded (NULL comparison), never a cast error
    WHERE ('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))::BIGINT / 4294967296.0
          < (TRY_CAST(substr(source, 4) AS INT) + 1) / 21.0
    ORDER BY doc_id
    """,
    doc="weighted domain sampling: per-source acceptance rate w(source) applied "
    "via a deterministic md5-uniform draw per doc (u < w) — the mixture "
    "re-weighting step that up/down-samples domains for a training run. "
    "Map-only at any scale (filter over a hash of the id): no shuffle, no RNG, "
    "identical sample on rerun and across engines; weights here derive from "
    "the source id, in production from c04's quality scorecard",
)
def c05_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    # try_cast: a source id outside the srcNN scheme has no defined
    # weight — u < NULL filters the doc out, instead of an ANSI
    # CAST_INVALID_INPUT crash on the first malformed source
    w = (F.expr("try_cast(substring(source, 4) AS INT)") + 1) / 21.0
    return (
        docs.filter(u < w)
        .select("doc_id", "source", (F.round(u * 1000000) / 1000000.0).alias("u"))
        .orderBy("doc_id")
    )


@query(
    "c07_sequence_packing",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(greatest(len(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+')), 1) AS BIGINT) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, lang, n_tokens,
               -- n_tokens in the tie-break: duplicated doc_ids (r10
               -- duplicate-id hunt) tie on doc_id alone, shifting every
               -- later offset nondeterministically per engine
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id, n_tokens
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS shard_offset
        FROM toks
    )
    SELECT doc_id, lang, n_tokens, shard_offset,
           CAST(shard_offset // 2048 AS BIGINT) AS first_pack,
           CAST((shard_offset + n_tokens - 1) // 2048 AS BIGINT) AS last_pack
    FROM packed
    ORDER BY lang, doc_id
    """,
    doc="sequence packing: concatenate each language shard's token stream in "
    "deterministic doc order and slice it into 2048-token training sequences — "
    "each doc reports its shard offset and the [first_pack, last_pack] range it "
    "lands in (the concat-then-chunk packing used to build pretraining batches "
    "without padding waste). One running-sum window per shard key: shards are "
    "independent, so at 100 TB the only shuffle is partitioning by shard "
    "(refine the key to (lang, bucket) to bound shard size); all arithmetic is "
    "exact integers",
)
def c07_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.greatest(F.size(tokens("text")), F.lit(1)).cast("bigint").alias("n_tokens"),
    )
    # n_tokens joins the pack order: duplicated doc_ids (r10 hunt) tie
    # on doc_id alone — the offsets after them would be nondeterministic
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn("shard_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return packed.select(
        "doc_id",
        "lang",
        "n_tokens",
        "shard_offset",
        F.floor(F.col("shard_offset") / 2048).cast("bigint").alias("first_pack"),
        F.floor((F.col("shard_offset") + F.col("n_tokens") - 1) / 2048).cast("bigint").alias("last_pack"),
    ).orderBy("lang", "doc_id")


@query(
    "c08_leakage_safe_split",
    # Components come from the same exact-verified MinHash graph as t11
    # (recall ≈ 1-1e-14, so the recursive-CTE transitive closure is a
    # valid oracle); the split hash is md5 over the COMPONENT canonical
    # id, not the doc id — that is the whole point.
    oracle=r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, UNNEST(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM common
        JOIN counts ca ON ca.doc_id = id_a
        JOIN counts cb ON cb.doc_id = id_b
        WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst
    ),
    canon AS (SELECT id, min(lbl) AS kept FROM reach GROUP BY id)
    SELECT d.doc_id,
           coalesce(c.kept, d.doc_id) AS canonical_id,
           CASE WHEN substr(md5(CAST(coalesce(c.kept, d.doc_id) AS STRING)), 1, 1)
                     IN ('c', 'd') THEN 'val'
                WHEN substr(md5(CAST(coalesce(c.kept, d.doc_id) AS STRING)), 1, 1)
                     IN ('e', 'f') THEN 'test'
                ELSE 'train' END AS split
    FROM documents d LEFT JOIN canon c ON c.id = d.doc_id
    ORDER BY d.doc_id
    """,
    doc="leakage-safe train/val/test split: every doc is assigned by an md5 hash "
    "of its near-dup COMPONENT's canonical id (t11's connected components over "
    "the exact-verified MinHash graph), so near-duplicates can never straddle "
    "splits — the split-assignment step that prevents eval contamination "
    "through duplicated content (12/2/2 sixteenths train/val/test). Scale "
    "shape: t11's banded-LSH + label propagation, then a plain left join of "
    "the (components-only) label map back to the corpus keyed on doc_id — "
    "deliberately NOT broadcast: at 100 TB with 20-50%% dup rates the label "
    "map is corpus-scale, so the safe default is a shuffled join and AQE "
    "upgrades it to broadcast only when runtime stats say it fits. Singleton "
    "docs never enter the component machinery",
)
def c08_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.operators.minhash import (
        minhash_neardup_pairs,
        neardup_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    comp = neardup_components(pairs).withColumnRenamed("id", "doc_id")
    canon = F.coalesce(F.col("lbl"), F.col("doc_id"))
    h = F.substring(F.md5(canon.cast("string").cast("binary")), 1, 1)
    split = (
        F.when(h.isin("c", "d"), "val")
        .when(h.isin("e", "f"), "test")
        .otherwise("train")
    )
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select("doc_id", canon.alias("canonical_id"), split.alias("split"))
        .orderBy("doc_id")
    )


@query(
    "c09_domain_outliers",
    # Variance is written EXPLICITLY as sumsq/n - (sum/n)² on both
    # engines (never var_pop/stddev: implementations differ — Welford vs
    # textbook — in last-ulp ways): inputs are exact integer sums, so
    # every intermediate double is identical and z is engine-exact
    # before the 1e-4 round.
    oracle="""
    WITH stats AS (
        SELECT source,
               count(*) AS n,
               sum(n_chars) AS s,
               sum(n_chars * n_chars) AS sq
        FROM documents
        GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           round((d.n_chars - s * 1.0 / n)
                 / sqrt(sq * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n)) * 10000) / 10000.0 AS z
    FROM documents d JOIN stats USING (source)
    -- var > 0: a zero-variance domain (single doc, or every doc the
    -- same length) has no outliers by definition — z is undefined there
    -- and unguarded raises DIVIDE_BY_ZERO under Spark ANSI mode
    WHERE sq * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n) > 0
      AND abs((d.n_chars - s * 1.0 / n)
              / sqrt(sq * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n))) > 2.0
    ORDER BY d.doc_id
    """,
    doc="per-domain length-outlier screen: flag docs whose char count sits more "
    "than 2 population-z from their source's mean — the cheap truncation/"
    "boilerplate/concatenation-artifact detector curation pipelines run per "
    "domain before quality modeling. Scale shape: one map-side-combined stats "
    "aggregate per source (exact integer sums) broadcast back over the corpus "
    "scan — no second shuffle of the fact side",
)
def c09_domain_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sq"),
    )
    joined = docs.select("doc_id", "source", "n_chars").join(F.broadcast(stats), "source")
    mean = F.col("s") * 1.0 / F.col("n")
    var = F.col("sq") * 1.0 / F.col("n") - mean * mean
    # the division lives INSIDE the when(): a zero-variance domain
    # (single doc, or every doc the same length) has no outliers by
    # definition — z is undefined there, and guarding at the expression
    # level (not a separate filter Catalyst could reorder) means the
    # ANSI DIVIDE_BY_ZERO branch is never evaluated
    z = F.when(var > 0, (F.col("n_chars") - mean) / F.sqrt(var))
    return (
        joined.filter(F.abs(z) > 2.0)
        .select(
            "doc_id",
            "source",
            "n_chars",
            (F.round(z * 10000) / 10000.0).alias("z"),
        )
        .orderBy("doc_id")
    )


@query(
    "c06_chargram_lm_score",
    # logp per bigram TYPE is quantized to a 1e-6 integer before the
    # per-doc weighted sum, so the aggregation is exact integer math in
    # any order (same discipline as c03).
    # bigrams via list_transform over a ONCE-split code-point list
    # (r11 oversized-doc find, both engines): per-position
    # substr(text, i, 2) walks from byte 0 to find the i-th code point
    # — O(chars^2), 750 s for the 1 MB probe doc — and the lateral
    # UNNEST additionally carried `text` into every row. string_split
    # (DuckDB) and split (Spark) decode code points identically
    # (verified incl. supplementary-plane emoji), and list indexing is
    # O(1), so both sides are linear now.
    oracle="""
    WITH cs AS (
        SELECT doc_id, string_split(text, '') AS c
        FROM documents WHERE length(text) >= 2
    ),
    bg AS (
        SELECT doc_id,
               UNNEST(list_transform(generate_series(1, greatest(len(c) - 1, 0)),
                                     i -> c[i] || c[i+1])) AS b
        FROM cs
    ),
    perdoc AS (
        SELECT doc_id, b, count(*) AS m FROM bg GROUP BY doc_id, b
    ),
    corpus AS (
        SELECT b, sum(m) AS cb FROM perdoc GROUP BY b
    ),
    ctx AS (
        SELECT substr(b, 1, 1) AS c1, sum(cb) AS cc FROM corpus GROUP BY 1
    ),
    lm AS (
        SELECT b, CAST(round((log2(cb) - log2(cc)) * 1000000) AS BIGINT) AS qlogp
        FROM corpus JOIN ctx ON substr(corpus.b, 1, 1) = ctx.c1
    )
    SELECT doc_id,
           CAST(sum(m) AS BIGINT) AS n_bigrams,
           round(sum(m * qlogp) / sum(m) / 100.0) / 10000.0 AS lm_score
    FROM perdoc JOIN lm USING (b)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="char-n-gram LM scoring: average log2 P(c2|c1) of a doc's character "
    "bigrams under the corpus's own bigram model (self-scored MLE — the "
    "KenLM-style fluency/quality filter of curation pipelines; outliers are "
    "gibberish or out-of-domain). Scale shape: the LM is a charset²-sized "
    "aggregate broadcast back to the per-doc counts — two linear hash "
    "aggregates plus one broadcast join, no all-pairs work",
)
def c06_chargram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    # Spread the scan before the ~1000x bigram fan-out (the r10 c06
    # settlement: the whole explode+partial-agg ran as ONE task on the
    # single-split fixture file — 3.5 s -> 1.3 s isolated at sf0.1, and
    # the source of the r9 "conflicting readings"; hashing by doc_id
    # also satisfies the (doc_id, b) grouping, so the 463k post-explode
    # rows never shuffle). See sources/reader.py spread_scan.
    docs = spread_scan(docs, "doc_id")
    # Bigrams via zip_with over two top-level slices of the char array
    # (r11 oversized-doc find): the old per-position form
    # `transform(sequence(1, length-1), i -> substring(text, i, 2))`
    # is O(chars^2) — UTF8String.substring must WALK from byte 0 to
    # find the i-th code point (variable-width encoding), so a 100 KB
    # doc cost 32 s on one core and the 1 MB probe doc never finished.
    # split('') decodes the string into code points ONCE; the slices
    # and zip_with are linear (1 MB doc: 1.15 s). The big expressions
    # stay OUTSIDE the lambda deliberately — Catalyst's CollapseProject
    # inlines project aliases into lambda bodies, and anything
    # O(doc)-sized inside a per-element lambda re-runs PER ELEMENT
    # (measured: the hoisted-looking element_at(split(...)) form was
    # quadratic again after collapse).
    bg = docs.select("doc_id", F.split("text", "").alias("cs")).select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(cs, 1, size(cs) - 1), slice(cs, 2, size(cs) - 1),"
                " (x, y) -> concat(x, y))"
            )
        ).alias("b"),
    )
    # per-doc counts feed BOTH the corpus LM build and the scoring join
    perdoc = bg.groupBy("doc_id", "b").agg(F.count("*").alias("m")).persist()
    corpus = perdoc.groupBy("b").agg(F.sum("m").alias("cb"))
    ctx = corpus.groupBy(F.substring("b", 1, 1).alias("c1")).agg(F.sum("cb").alias("cc"))
    lm = (
        corpus.join(ctx, F.substring(corpus["b"], 1, 1) == ctx["c1"])
        .select(
            "b",
            F.round((F.log2("cb") - F.log2("cc")) * 1000000).cast("bigint").alias("qlogp"),
        )
    )
    return (
        perdoc.join(F.broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            (F.round(F.sum(F.col("m") * F.col("qlogp")) / F.sum("m") / 100.0) / 10000.0).alias(
                "lm_score"
            ),
        )
        .orderBy("doc_id")
    )


_MIX_BUDGET = 100000  # docs to draw across all (source, lang) domains


def _mixture_targets(docs: DataFrame, budget: int = _MIX_BUDGET) -> DataFrame:
    """The c10 target frame (source, lang, n_docs, w_micro, target_docs)
    as a reusable builder — c11 joins it back over the corpus, and the
    composed curation pipeline (plans/pipeline.py) runs it over the
    post-dedup/decontamination survivors with its own budget."""
    dom = docs.groupBy("source", "lang").agg(F.count("*").cast("bigint").alias("n_docs"))
    return _mixture_targets_from_counts(dom, budget)


def _mixture_targets_from_counts(dom: DataFrame, budget: int = _MIX_BUDGET) -> DataFrame:
    """Largest-remainder apportionment over a PREBUILT (source, lang,
    n_docs) count frame — the state-merge entry point: the incremental
    funnel (plans/pipeline.py pipe02) feeds it persisted base counts
    summed with fresh delta counts, so targets re-apportion over the
    cumulative corpus without rescanning it."""
    from pyspark.sql import Window

    dom = dom.withColumn(
        "w_micro", F.round(F.sqrt(F.col("n_docs")) * 1000000).cast("bigint")
    )
    # the domain frame is aggregate-sized (hundreds of rows at 100 TB), so
    # whole-frame windows here are deliberate, not a scale hazard
    wall = Window.partitionBy()
    dom = dom.withColumn("s", F.sum("w_micro").over(wall))
    dom = dom.withColumn(
        "base_t", F.expr(f"CAST(({budget}L * w_micro) DIV s AS BIGINT)")
    ).withColumn("rem", F.expr(f"({budget}L * w_micro) % s"))
    dom = dom.withColumn(
        "rk", F.row_number().over(Window.partitionBy().orderBy(F.desc("rem"), "source", "lang"))
    ).withColumn("deficit", F.lit(budget) - F.sum("base_t").over(wall))
    target = F.col("base_t") + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)
    return dom.select(
        "source", "lang", "n_docs", "w_micro", target.cast("bigint").alias("target_docs")
    )


@query(
    "c10_temperature_mixture",
    # Every step is integer arithmetic once sqrt(n) is quantized to
    # 1e-6 micro-units (sqrt is IEEE-correctly-rounded in both engines,
    # so the quantized weights agree bit-for-bit), which makes the
    # largest-remainder apportionment — floor division, modulo, rank —
    # deterministic and hash-stable.
    oracle=f"""
    WITH dom AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(round(sqrt(count(*)) * 1000000) AS BIGINT) AS w_micro
        FROM documents GROUP BY 1, 2
    ),
    t AS (
        SELECT dom.*, (SELECT sum(w_micro) FROM dom) AS s FROM dom
    ),
    b AS (
        SELECT *, ({_MIX_BUDGET} * w_micro) // s AS base_t,
                  ({_MIX_BUDGET} * w_micro) % s AS rem
        FROM t
    ),
    r AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, source, lang) AS rk,
               (SELECT {_MIX_BUDGET} - sum(base_t) FROM b) AS deficit
        FROM b
    )
    SELECT source, lang, n_docs, w_micro,
           CAST(base_t + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS target_docs
    FROM r
    ORDER BY source, lang
    """,
    doc="temperature-scaled mixture apportionment (alpha = 0.5): per-(source, lang) "
    "domain weights proportional to sqrt(n_docs) — the multilingual/domain "
    "rebalancing used to set sampling targets for a training mix — turned into "
    "exact integer doc budgets by largest-remainder rounding, so the targets sum "
    "to the budget exactly. Scale shape: ONE map-side-combined domain aggregate "
    "(domains number in the hundreds at any corpus size); the windows/apportionment "
    "run on that tiny frame, and the emitted targets drive a c05-style map-only "
    "accept filter over the corpus — no second fact shuffle",
)
def c10_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _mixture_targets(docs).orderBy("source", "lang")


@query(
    "c11_mixture_sample",
    # The accept test u < target/n compares exact dyadic u (first 32 md5
    # bits / 2^32) against the same IEEE bigint/bigint division in both
    # engines, so the accepted set — and therefore the exact integer
    # accepted counts — are bit-identical.
    oracle=f"""
    WITH dom AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(round(sqrt(count(*)) * 1000000) AS BIGINT) AS w_micro
        FROM documents GROUP BY 1, 2
    ),
    t AS (
        SELECT dom.*, (SELECT sum(w_micro) FROM dom) AS s FROM dom
    ),
    b AS (
        SELECT *, ({_MIX_BUDGET} * w_micro) // s AS base_t,
                  ({_MIX_BUDGET} * w_micro) % s AS rem
        FROM t
    ),
    r AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, source, lang) AS rk,
               (SELECT {_MIX_BUDGET} - sum(base_t) FROM b) AS deficit
        FROM b
    ),
    tgt AS (
        SELECT source, lang, n_docs,
               CAST(base_t + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS target_docs
        FROM r
    )
    SELECT d.source, d.lang, tgt.n_docs, tgt.target_docs,
           CAST(sum(CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS STRING)), 1, 8))::BIGINT
                              / 4294967296.0 < tgt.target_docs / CAST(tgt.n_docs AS DOUBLE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS accepted
    FROM documents d JOIN tgt ON d.source = tgt.source AND d.lang = tgt.lang
    GROUP BY d.source, d.lang, tgt.n_docs, tgt.target_docs
    ORDER BY d.source, d.lang
    """,
    doc="temperature-mixture APPLY step: c10's integer targets joined back over the "
    "corpus (aggregate-sized frame broadcast, the c09 pattern) and enforced by the "
    "c05 deterministic md5-uniform accept u < target/n — computing the mix and "
    "drawing it are one pipeline. Scale shape: one domain aggregate + one "
    "broadcast join + a map-only accept filter; the only corpus-keyed shuffle is "
    "the final per-domain count. Output = per-domain planned target vs exact "
    "accepted count (rate-accurate, not quota-exact — quota-exact selection is "
    "t13's ranked stratified sampler)",
)
def c11_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tgt = _mixture_targets(docs).select("source", "lang", "n_docs", "target_docs")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint")
        / F.lit(4294967296.0)
    )
    accept = u < F.col("target_docs") / F.col("n_docs").cast("double")
    return (
        docs.select("doc_id", "source", "lang")
        .join(F.broadcast(tgt), ["source", "lang"])
        .groupBy("source", "lang", "n_docs", "target_docs")
        .agg(F.sum(F.when(accept, 1).otherwise(0)).cast("bigint").alias("accepted"))
        .orderBy("source", "lang")
    )


_TOKEN_BUDGET = 20000


@query(
    "c12_token_budget_mixture",
    # Same integer largest-remainder arithmetic as c10 but over TOKEN
    # totals (sqrt is correctly-rounded on the exact bigint sums in both
    # engines), and a deterministic greedy prefix: docs ordered by
    # md5(doc_id) within each domain, selected while the running token
    # count has not yet reached the domain's target — every column is an
    # exact integer or a comparison of exact integers.
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, lang,
               CAST(len(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\\w+')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    dom AS (
        SELECT source, lang, CAST(sum(n_tokens) AS BIGINT) AS n_docs,
               CAST(round(sqrt(sum(n_tokens)) * 1000000) AS BIGINT) AS w_micro
        FROM d GROUP BY 1, 2
    ),
    t2 AS (
        SELECT dom.*, (SELECT sum(w_micro) FROM dom) AS s FROM dom
    ),
    b AS (
        SELECT *, ({_TOKEN_BUDGET} * w_micro) // s AS base_t,
                  ({_TOKEN_BUDGET} * w_micro) % s AS rem
        FROM t2
    ),
    r AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, source, lang) AS rk,
               (SELECT {_TOKEN_BUDGET} - sum(base_t) FROM b) AS deficit
        FROM b
    ),
    tgt AS (
        SELECT source, lang,
               CAST(base_t + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS target_tokens
        FROM r
    ),
    sel AS (
        SELECT d.doc_id, d.source, d.lang, d.n_tokens, tgt.target_tokens,
               -- n_tokens in the tie-break: duplicated doc_ids tie on
               -- (md5, doc_id) — r10 duplicate-id hunt
               CAST(coalesce(sum(d.n_tokens) OVER (
                   PARTITION BY d.source, d.lang
                   ORDER BY md5(CAST(d.doc_id AS STRING)), d.doc_id, d.n_tokens
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM d JOIN tgt ON d.source = tgt.source AND d.lang = tgt.lang
    )
    SELECT doc_id, source, lang, n_tokens, cum_before, target_tokens,
           cum_before < target_tokens AS selected
    FROM sel
    ORDER BY doc_id
    """,
    doc=f"temperature mixture in TOKEN units (budget {_TOKEN_BUDGET} tokens) — the "
    "unit pre-training budgets are actually set in: per-domain targets ∝ "
    "sqrt(domain token count) via the c10 largest-remainder apportionment, then "
    "a deterministic greedy prefix (docs in md5(doc_id) order, taken while the "
    "running token count is below target — each domain overshoots by < one "
    "document, the standard epoch-boundary convention). Rerun-stable with no "
    "RNG. Scale shape: one token-count map, an aggregate-sized target frame "
    "broadcast back, ONE per-domain window shuffle for the running sum",
)
def c12_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from serverless_etl_reporting_pipeline_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", "lang",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    dom = d.groupBy("source", "lang").agg(F.sum("n_tokens").cast("bigint").alias("n_docs"))
    tgt = _mixture_targets_from_counts(dom, budget=_TOKEN_BUDGET).select(
        "source", "lang", F.col("target_docs").alias("target_tokens")
    )
    # n_tokens joins the greedy-prefix order: a duplicated doc_id with
    # conflicting text (r10 duplicate-id hunt) ties on (md5, doc_id), so
    # without it the running sum — and every row after — is
    # nondeterministic per engine
    w = (
        Window.partitionBy("source", "lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id", "n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(tgt), ["source", "lang"])
        .select(
            "doc_id", "source", "lang", "n_tokens",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint").alias("cum_before"),
            "target_tokens",
        )
        .withColumn("selected", F.col("cum_before") < F.col("target_tokens"))
        .orderBy("doc_id")
    )
