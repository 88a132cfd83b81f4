"""Text-analysis / dedup corpus over the `documents` table
(SURVEY.md §2.11 north-star operators).

Engine-portability discipline: tokenization is `regexp_extract_all`
(same regex dialect for \\w), hashing is md5 (identical hex in Spark and
DuckDB), every ratio is a ratio of exact integers (identical doubles in
both engines), rounding only at integer scale.

Scale notes are per-query; the LSH variants of the expensive joins live
in operators/minhash.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.text import (
    PUNCT_STRIP_RE,
    chunk_tokens,
    exact_dedup,
    fingerprint_md5,
    normalize_text,
    shingles,
    simhash_bits,
    stratified_sample,
    tokens,
)
from serverless_etl_reporting_pipeline_spark.operators.minhash import (
    minhash_neardup_pairs,
    neardup_components,
)
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table, spread_scan


@query(
    "t01_exact_dedup",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    )
    WHERE rn = 1
    """,
    doc="exact dedup on content, keep lowest id — north star; generalizes D2 (transform.py:30-37)",
)
def t01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, ["text"], "doc_id").select("doc_id", "lang", "source")


@query(
    "t02_normalized_dedup_groups",
    oracle=r"""
    SELECT norm_fp, count(*) AS copies, min(doc_id) AS kept_doc_id
    FROM (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '[^a-z0-9\t\n\x0B\f\r ]', '', 'g'), '[\t\n\x0B\f\r ]+', ' ', 'g'))) AS norm_fp
        FROM documents
    )
    GROUP BY norm_fp
    """,
    doc="near-exact dedup via normalized-content fingerprint (md5) — north star",
)
def t02_normalized_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint_md5("text").alias("norm_fp"))
        .groupBy("norm_fp")
        .agg(F.count("*").alias("copies"), F.min("doc_id").alias("kept_doc_id"))
    )


@query(
    "t03_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+')) AS INT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
           round(length(text) * 100.0 / greatest(len(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+')), 1)) / 100.0 AS chars_per_token
    FROM documents
    """,
    doc="token counting (whitespace/word regex + chars/4 BPE-ish estimate) — north star text analysis",
)
def t03_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens("text"))
    n_chars = F.length("text").cast("bigint")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        F.ceil(n_chars / 4.0).alias("est_bpe_tokens"),
        (F.round(n_chars * 100.0 / F.greatest(n_tokens, F.lit(1))) / 100.0).alias("chars_per_token"),
    )


_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "que"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "des", "est", "une"),
}


def _duck_hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"len(list_filter(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\\w+'), x -> x IN ({lst})))"


@query(
    "t04_language_id",
    oracle=f"""
    SELECT lang AS lang_actual, lang_pred, count(*) AS docs
    FROM (
        SELECT lang,
               CASE WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
                    WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
                    WHEN de >= fr AND de > 0 THEN 'de'
                    WHEN fr > 0 THEN 'fr'
                    ELSE 'und' END AS lang_pred
        FROM (
            SELECT lang,
                   {_duck_hits('en')} AS en,
                   {_duck_hits('es')} AS es,
                   {_duck_hits('de')} AS de,
                   {_duck_hits('fr')} AS fr
            FROM documents
        )
    )
    GROUP BY 1, 2
    """,
    doc="language-ID stopword-marker heuristic, confusion counts vs labeled lang — north star",
)
def t04_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", tokens("text"))
    # IN-list inside a higher-order lambda needs the SQL form (Python
    # Column.isin is not supported in lambda scope)
    hits = {
        lang: F.expr(
            "size(filter(toks, x -> x IN ({})))".format(", ".join(f"'{w}'" for w in markers))
        )
        for lang, markers in _MARKERS.items()
    }
    scored = docs.select(F.col("lang").alias("lang_actual"), *[hits[k].alias(k) for k in _MARKERS])
    en, es, de, fr = (F.col(k) for k in ("en", "es", "de", "fr"))
    pred = (
        F.when((en >= es) & (en >= de) & (en >= fr) & (en > 0), "en")
        .when((es >= de) & (es >= fr) & (es > 0), "es")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("und")
    )
    return scored.select("lang_actual", pred.alias("lang_pred")).groupBy("lang_actual", "lang_pred").agg(
        F.count("*").alias("docs")
    )


@query(
    "t05_quality_score",
    oracle=r"""
    SELECT doc_id,
           round((0.4 * (stop * 1.0 / n) + 0.3 * least(n / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / len_g)) * 10000) / 10000.0 AS quality,
           round(stop * 10000.0 / n) / 10000.0 AS stopword_ratio,
           round(punct * 10000.0 / len_g) / 10000.0 AS punct_ratio
    FROM (
        -- greatest(..., 1) floors on BOTH divisors: an empty document
        -- (zero tokens, zero chars) scores 0-ratios instead of raising
        -- DIVIDE_BY_ZERO under Spark ANSI mode (degenerate-input hunt)
        SELECT doc_id, text,
               greatest(len(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+')), 1) AS n,
               greatest(length(text), 1) AS len_g,
               len(list_filter(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+'),
                               x -> x IN ('the', 'a', 'of', 'and', 'to', 'is', 'in'))) AS stop,
               length(regexp_replace(text, '[a-zA-Z0-9\t\n\x0B\f\r ]', '', 'g')) AS punct
        FROM documents
    )
    """,
    doc="quality scoring: stopword/length/punctuation signals (ratios of exact ints) — north star",
)
def t05_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", tokens("text"))
    n = F.greatest(F.size("toks"), F.lit(1))
    stop = F.expr("size(filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to', 'is', 'in')))")
    punct = F.length(F.regexp_replace("text", PUNCT_STRIP_RE, ""))
    # greatest(..., 1) floors BOTH divisors — an empty document scores
    # 0-ratios instead of raising DIVIDE_BY_ZERO under ANSI mode
    base = docs.select(
        "doc_id",
        F.greatest(F.length("text"), F.lit(1)).alias("len"),
        n.alias("n"), stop.alias("stop"), punct.alias("punct"),
    )
    quality = (
        0.4 * (F.col("stop") * 1.0 / F.col("n"))
        + 0.3 * F.least(F.col("n") / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - F.col("punct") * 1.0 / F.col("len"))
    )
    return base.select(
        "doc_id",
        (F.round(quality * 10000) / 10000.0).alias("quality"),
        (F.round(F.col("stop") * 10000.0 / F.col("n")) / 10000.0).alias("stopword_ratio"),
        (F.round(F.col("punct") * 10000.0 / F.col("len")) / 10000.0).alias("punct_ratio"),
    )


@query(
    "t06_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '[^a-z0-9\t\n\x0B\f\r ]', '', 'g'), '[\t\n\x0B\f\r ]+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
    doc="document fingerprinting (md5 of normalized content) — north star",
)
def t06_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_md5("text").alias("fingerprint"))


@query(
    "t07_ngram_jaccard_pairs",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source, regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, source, UNNEST(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(c * 1000000.0 / (ca.n + cb.n - c)) / 1000000.0 AS jaccard
    FROM common
    JOIN counts ca ON ca.doc_id = id_a
    JOIN counts cb ON cb.doc_id = id_b
    WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5
    """,
    doc="n-gram (3-shingle) jaccard near-dup pairs, blocked by source — north star; "
    "exact small-scale oracle for the MinHashLSH scale path (operators/minhash.py)",
)
def t07_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the fan-out (see
    # sources/reader.py spread_scan; no-op on a many-split input)
    docs = spread_scan(docs, "doc_id")
    sh = (
        docs.select("doc_id", "source", tokens("text").alias("t"))
        .select("doc_id", "source", F.explode(shingles("t", 3)).alias("s"))
        .distinct()
    )
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("c"))
    )
    ca = counts.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    union_size = F.col("na") + F.col("nb") - F.col("c")
    return (
        common.join(ca, "id_a")
        .join(cb, "id_b")
        .filter(F.col("c") * 1.0 / union_size >= 0.5)
        .select(
            "id_a",
            "id_b",
            (F.round(F.col("c") * 1000000.0 / union_size) / 1000000.0).alias("jaccard"),
        )
    )


@query(
    "t08_simhash",
    oracle=r"""
    WITH toks AS (
        SELECT DISTINCT doc_id, md5(x) AS h
        FROM (SELECT doc_id, UNNEST(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+')) AS x FROM documents)
    ),
    bits AS (
        SELECT doc_id, j,
               ((instr('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1)
                 // CAST(pow(2, 3 - (j % 4)) AS INT)) % 2 AS bit
        FROM toks, UNNEST(generate_series(0, 63)) AS u(j)
    ),
    summed AS (
        SELECT doc_id, j, sum(bit * 2 - 1) AS s FROM bits GROUP BY doc_id, j
    )
    SELECT doc_id,
           string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
    FROM summed
    GROUP BY doc_id
    """,
    doc="SimHash-64 signatures (md5-nibble construction, engine-portable) — north star near-dup",
)
def t08_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the fan-out (see
    # sources/reader.py spread_scan; no-op on a many-split input)
    docs = spread_scan(docs, "doc_id")
    return simhash_bits(docs, "doc_id", "text")


@query(
    "t09_minhash_lsh_neardup",
    # The banding itself is not SQL-expressible, but the exact-verify
    # stage makes the OUTPUT equal to the unblocked exact-jaccard pairs
    # whenever banding recall is 1 — and with r=2×b=32 the per-pair miss
    # probability at the fixtures' j≥0.8 is ≤(1-0.64)^32≈1e-14, with
    # deterministic xxhash64 (no run-to-run variance). So the exact
    # all-pairs SQL is a valid oracle.
    oracle=r"""
    WITH toks AS (
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
    )
    SELECT id_a, id_b,
           round(c * 1000000.0 / (ca.n + cb.n - c)) / 1000000.0 AS jaccard
    FROM common
    JOIN counts ca ON ca.doc_id = id_a
    JOIN counts cb ON cb.doc_id = id_b
    WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5
    """,
    doc="banded MinHash LSH (xxhash64, r=2 b=32) + exact-verify near-dup pairs — the "
    "100 TB scale path for t07; oracle = unblocked exact jaccard (recall ≈ 1-1e-14)",
)
def t09_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    return pairs.select(
        "id_a", "id_b", (F.round(F.col("jaccard") * 1000000) / 1000000.0).alias("jaccard")
    )


@query(
    "t11_neardup_components",
    # Same recall argument as t09 (exact-verify on banded candidates ⇒
    # output = exact-jaccard graph), then connected components: DuckDB
    # expresses the transitive closure as a recursive CTE; Spark as
    # iterative min-label propagation. Both are exact.
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
    )
    SELECT id AS dup_id, min(lbl) AS kept_id
    FROM reach
    GROUP BY id
    HAVING min(lbl) < id
    ORDER BY dup_id
    """,
    doc="transitive near-dup dedup map: connected components over the exact-verified "
    "MinHash-LSH pair graph, survivor = component-min id — chains A~B~C collapse to A "
    "(operators/minhash.py neardup_components; SURVEY.md §2.11 clustering variant)",
)
def t11_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    comp = neardup_components(pairs)
    return (
        comp.filter(F.col("lbl") < F.col("id"))
        .select(F.col("id").alias("dup_id"), F.col("lbl").alias("kept_id"))
        .orderBy("dup_id")
    )


@query(
    "t10_stable_sample",
    oracle="""
    SELECT lang,
           count(*) AS sampled_docs,
           CAST(sum(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1')
    GROUP BY lang
    ORDER BY lang
    """,
    doc="deterministic content-hash sampling: md5(doc_id) prefix < 1/8 keeps a stable, "
    "engine-portable, rerun-reproducible corpus sample (the curation pattern for stable "
    "eval/holdout splits at 100 TB — no seeded RNG, no sort, map-only filter), then "
    "per-language profile of the sample",
)
def t10_stable_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    return (
        docs.filter(keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("sampled_docs"),
            F.sum("n_chars").alias("sampled_chars"),
        )
        .orderBy("lang")
    )


@query(
    "t12_chunking",
    # Engine-portable construction: same \w+ tokenizer, identical exact
    # integer chunk-count arithmetic (floor over a small exact double),
    # Spark slice(start, length) == DuckDB list_slice(start, stop)
    # inclusive-stop with stop = start + chunk_size - 1, md5 over the
    # space-joined chunk (identical hex in both engines).
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+') AS t FROM documents
        -- NULL text yields no chunks (chunk_tokens' exclusion contract)
        WHERE text IS NOT NULL
    ),
    -- struct-list transform, not a lateral UNNEST join (r11 oversized-
    -- doc find: the lateral copies the full token list per chunk row —
    -- O(chunks x tokens) on a 1 MB doc)
    ch0 AS (
        SELECT doc_id, UNNEST(list_transform(
                   generate_series(0, CAST(greatest(1, floor((len(t) - 20 + 79) / 80.0)) AS BIGINT) - 1),
                   i -> struct_pack(
                       chunk_id := CAST(i AS INT),
                       c := list_slice(t, 1 + i * 80, i * 80 + 100))
               )) AS u
        FROM toks
    ),
    ch AS (
        SELECT doc_id, u.chunk_id AS chunk_id, u.c AS c FROM ch0
    )
    -- coalesce: DuckDB's array_to_string([]) is NULL while Spark's
    -- array_join([]) is '' — an empty doc's one empty chunk must
    -- fingerprint as md5('') in both engines (r8 degenerate sweep)
    SELECT doc_id, chunk_id, CAST(len(c) AS INT) AS n_chunk_tokens,
           md5(coalesce(array_to_string(c, ' '), '')) AS chunk_fp
    FROM ch
    ORDER BY doc_id, chunk_id
    """,
    doc="overlapping token-window chunking (chunk_size=100, overlap=20) — the standard "
    "pre-training/RAG document splitting op; map-only JVM slice arithmetic, no shuffle "
    "(operators/text.py chunk_tokens)",
)
def t12_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the chunk fan-out
    # (tokenize + ~6x explode + slice otherwise runs on one core; the
    # r12 t12-settle A/B measured 0.50 -> 0.36 s at sf0.1)
    docs = spread_scan(docs, "doc_id")
    ch = chunk_tokens(docs, "doc_id", "text", chunk_size=100, overlap=20)
    return ch.select(
        "doc_id",
        "chunk_id",
        "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_fp"),
    ).orderBy("doc_id", "chunk_id")


@query(
    "t14_tfidf_top_terms",
    # Rational idf (N - df + 0.5)/(df + 0.5) — the BM25 idf core without
    # the log — keeps every score a ratio/product of exact integers, so
    # the score doubles (and therefore the per-source ranking) are
    # bit-identical in Spark and DuckDB; ln() would be libm-dependent.
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source, UNNEST(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+')) AS tok
        FROM documents
    ),
    tf AS (SELECT source, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT source, tf.tok AS term, tf,
               tf * ((n - df + 0.5) / (df + 0.5)) AS score,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY tf * ((n - df + 0.5) / (df + 0.5)) DESC, tf.tok
               ) AS rk
        FROM tf JOIN dfreq ON tf.tok = dfreq.tok, n
    )
    SELECT source, term, CAST(tf AS BIGINT) AS tf,
           round(score * 10000) / 10000.0 AS tfidf,
           CAST(rk AS INT) AS rk
    FROM scored WHERE rk <= 5
    ORDER BY source, rk
    """,
    doc="TF-IDF top-5 terms per source (rational BM25-style idf, engine-exact scores) — "
    "the domain/topic term-extraction op of a corpus pipeline; explode + two hash aggs "
    "+ broadcast scalar + per-source ranking window",
)
def t14_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the fan-out (see
    # sources/reader.py spread_scan; no-op on a many-split input)
    docs = spread_scan(docs, "doc_id")
    toks_e = docs.select("doc_id", "source", F.explode(tokens("text")).alias("tok"))
    # DELIBERATELY two passes over the explode: a shared per-(doc, term)
    # pre-aggregate + persist was measured WORSE (r13: task CPU 21->28-35s
    # across 3 A/B runs) — both aggregates below are map-side combined
    # directly on the exploded rows, so the extra exchange and cache
    # serialization of the doc-vocabulary frame cost more than running
    # the cheap tokenize+explode map stage twice.
    tf = toks_e.groupBy("source", "tok").agg(F.count("*").alias("tf"))
    dfreq = toks_e.select("doc_id", "tok").distinct().groupBy("tok").agg(
        F.count("*").alias("df")
    )
    # dfreq is |vocabulary| rows — broadcast; the only big shuffles are
    # the two token aggregates (map-side combined). The corpus size N is
    # a one-number driver-side aggregate folded in as a literal (same
    # two-phase pattern as the v01/v05 query-vector fetch): a lazy
    # cross-join alternative constant-folds into a nested-loop plan,
    # which the plan lint forbids registry-wide.
    n = docs.count()
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .withColumn("n", F.lit(n))
        .withColumn("score", F.col("tf") * ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "source",
            F.col("tok").alias("term"),
            F.col("tf").cast("bigint").alias("tf"),
            (F.round(F.col("score") * 10000) / 10000.0).alias("tfidf"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("source", "rk")
    )


@query(
    "t15_top_bigrams",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+') AS t FROM documents
    ),
    bg AS (
        SELECT UNNEST(list_transform(
               generate_series(1, greatest(len(t) - 1, 0)),
               i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks
    )
    SELECT bigram, count(*) AS occurrences
    FROM bg
    GROUP BY bigram
    ORDER BY occurrences DESC, bigram
    LIMIT 20
    """,
    doc="global top-20 bigram counts — collocation/n-gram frequency analysis; explode + "
    "one map-side-combined hash agg + TakeOrderedAndProject (no global sort)",
)
def t15_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the fan-out (see
    # sources/reader.py spread_scan; no-op on a many-split input)
    docs = spread_scan(docs, "doc_id")
    bg = docs.select(tokens("text").alias("t")).select(
        F.explode(shingles("t", 2)).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("bigram"))
        .limit(20)
    )


# Quality thresholds + the token-profile builder live in operators/text.py
# (shared with operators/funnel.py without a plans-package dependency);
# the names are re-bound here because this module owns their oracle SQL.
from serverless_etl_reporting_pipeline_spark.operators.text import (  # noqa: E402
    _QF_MAX_REPETITION,
    _QF_MIN_STOPWORD_RATIO,
    _QF_MIN_TOKENS,
    _QF_STOPWORDS,
    _token_profile,
)


_QF_PROFILE_SQL = r"""
    WITH per_tok AS (
        SELECT doc_id, tok, count(*) AS n
        FROM (
            SELECT doc_id, UNNEST(regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+')) AS tok
            FROM documents
        )
        GROUP BY doc_id, tok
    ),
    profile AS (
        SELECT doc_id,
               sum(n) AS n_tokens,
               sum(CASE WHEN tok IN ('the', 'a', 'of', 'and', 'to', 'is', 'in') THEN n ELSE 0 END) AS stop,
               max(n) AS mx
        FROM per_tok
        GROUP BY doc_id
    )
"""


@query(
    "t16_quality_filter",
    oracle=_QF_PROFILE_SQL
    + """
    SELECT reason, count(*) AS docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(sum(n_tokens) * 100.0 / count(*)) / 100.0 AS avg_tokens
    FROM (
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens < 25 THEN 'too_short'
                    WHEN stop * 1.0 / n_tokens < 0.03 THEN 'low_stopword'
                    WHEN mx * 1.0 / n_tokens > 0.15 THEN 'high_repetition'
                    ELSE 'keep' END AS reason
        FROM profile
    )
    GROUP BY reason
    ORDER BY reason
    """,
    doc="composite quality filter (Gopher/C4-style rules: length, stopword ratio, "
    "token repetition) with first-match drop reasons, aggregated per reason — the "
    "keep/drop accounting step of a corpus curation pipeline; all rules are ratios "
    "of exact integers so the routing is engine-identical",
)
def t16_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prof = _token_profile(docs)
    reason = (
        F.when(F.col("n_tokens") < _QF_MIN_TOKENS, "too_short")
        .when(F.col("stop") * 1.0 / F.col("n_tokens") < _QF_MIN_STOPWORD_RATIO, "low_stopword")
        .when(F.col("mx") * 1.0 / F.col("n_tokens") > _QF_MAX_REPETITION, "high_repetition")
        .otherwise("keep")
    )
    return (
        prof.select("n_tokens", reason.alias("reason"))
        .groupBy("reason")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (F.round(F.sum("n_tokens") * 100.0 / F.count("*")) / 100.0).alias("avg_tokens"),
        )
        .orderBy("reason")
    )


@query(
    "t17_repetition_ratio",
    oracle=_QF_PROFILE_SQL
    + """
    SELECT doc_id,
           CAST(mx AS BIGINT) AS top_token_count,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(mx * 10000.0 / n_tokens) / 10000.0 AS repetition_ratio
    FROM profile
    ORDER BY doc_id
    """,
    doc="per-document repetition signal: most-frequent-token share of all tokens "
    "(the Gopher repetition rule's core statistic) — explode + two hash aggregates, "
    "exact integer ratio",
)
def t17_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        _token_profile(docs)
        .select(
            "doc_id",
            F.col("mx").cast("bigint").alias("top_token_count"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.round(F.col("mx") * 10000.0 / F.col("n_tokens")) / 10000.0).alias("repetition_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "t18_corpus_manifest",
    oracle="""
    SELECT lang, source, count(*) AS docs,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT) AS est_bpe_tokens,
           round(count(*) * 1000000.0 / sum(count(*)) OVER ()) / 10000.0 AS doc_pct
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    doc="corpus manifest / dataset card: per (lang, source) doc counts, char and "
    "BPE-token estimates, and share of corpus — the mixture-accounting table every "
    "training-data pipeline publishes. Share-of-total window runs over the already-"
    "aggregated (langs x sources) frame, not raw rows (w02 pattern)",
)
def t18_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang", "source").agg(
        F.count("*").alias("docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
        F.sum(F.ceil(F.col("n_chars") / 4.0).cast("bigint")).cast("bigint").alias("est_bpe_tokens"),
    )
    total = F.sum("docs").over(Window.partitionBy())
    return (
        agg.select(
            "lang",
            "source",
            "docs",
            "chars",
            "est_bpe_tokens",
            (F.round(F.col("docs") * 1000000.0 / total) / 10000.0).alias("doc_pct"),
        )
        .orderBy("lang", "source")
    )


@query(
    "t19_decontamination",
    # Contamination rule: a training doc sharing any 8-token shingle
    # with the held-out eval split (the t10 md5-prefix split). 8-grams
    # are long enough to be near-unique, so hits mean real overlap.
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
    hold_sh AS (
        SELECT DISTINCT s FROM sh
        WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1')
    )
    SELECT doc_id, count(*) AS shared_8grams
    FROM sh JOIN hold_sh USING (s)
    WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) NOT IN ('0', '1')
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="benchmark decontamination: flag training docs sharing an 8-token shingle with "
    "the held-out eval split (t10's stable md5-prefix split) — the standard n-gram "
    "overlap contamination check before pre-training. Scale shape: distinct shingles "
    "per side, one equi-join keyed by shingle (the eval side is benchmark-sized — "
    "broadcastable), one hash agg; never all-pairs",
)
def t19_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the fan-out (see
    # sources/reader.py spread_scan; no-op on a many-split input)
    docs = spread_scan(docs, "doc_id")
    # the tokenize→explode→distinct subtree feeds BOTH the held-out and
    # training sides below — persist it or the most expensive map stage
    # runs twice (same rationale as operators/minhash.py:97). Shingles
    # are 64-bit xxhash64 ids, not strings: both consumers only test
    # equality, so the dedup exchange, the persist and the benchmark
    # broadcast carry 8-byte longs (operators/funnel.py shingle_set
    # discipline; the shared count shifts only under a 2⁻⁶⁴ collision)
    sh = (
        docs.select("doc_id", tokens("text").alias("t"))
        .select("doc_id", F.explode(shingles("t", 8)).alias("_s"))
        .select("doc_id", F.xxhash64("_s").alias("s"))
        .distinct()
        .persist()
    )
    is_hold = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    hold_sh = sh.filter(is_hold).select("s").distinct()
    return (
        sh.filter(~is_hold)
        .join(F.broadcast(hold_sh), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_8grams"))
        .orderBy("doc_id")
    )


@query(
    "t13_stratified_sample",
    oracle="""
    SELECT doc_id, lang, sample_rank
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS STRING)), doc_id
               ) AS sample_rank
        FROM documents
    )
    WHERE sample_rank <= 25
    ORDER BY lang, sample_rank
    """,
    doc="deterministic per-language quota sample (25 docs/lang, md5-ordered) — the "
    "corpus balancing step; rerun-stable with no RNG, one shuffle on the stratum key "
    "(operators/text.py stratified_sample)",
)
def t13_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, ["lang"], 25, "doc_id")
        .select("doc_id", "lang", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


@query(
    "t20_incremental_neardup",
    # Same recall argument as t09/c08 (banded candidates + exact verify
    # ⇒ output = exact-jaccard screen), restricted to snapshot×corpus
    # pairs. The watermark split is exact integer math on both engines:
    # floor(0.8 * (max_id + 1)).
    oracle=r"""
    WITH wm AS (
        SELECT CAST(floor(0.8 * (max(doc_id) + 1)) AS BIGINT) AS w FROM documents
    ),
    toks AS (
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
        SELECT a.doc_id AS snap_id, b.doc_id AS corp_id, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s CROSS JOIN wm
        WHERE a.doc_id >= wm.w AND b.doc_id < wm.w
        GROUP BY 1, 2
    ),
    matches AS (
        SELECT snap_id, min(corp_id) AS dup_src
        FROM common
        JOIN counts ca ON ca.doc_id = snap_id
        JOIN counts cb ON cb.doc_id = corp_id
        WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5
        GROUP BY snap_id
    )
    SELECT d.doc_id, m.dup_src IS NOT NULL AS is_dup, m.dup_src
    FROM (SELECT doc_id FROM documents CROSS JOIN wm WHERE doc_id >= wm.w) d
    LEFT JOIN matches m ON m.snap_id = d.doc_id
    ORDER BY d.doc_id
    """,
    doc="incremental near-dup screen: the newest 20%% of docs (ids past a "
    "watermark — the freshly-ingested snapshot) are checked for jaccard≥0.5 "
    "near-duplicates in the EXISTING corpus via the persisted MinHash band "
    "index, the query a continuously-fed training corpus runs per batch "
    "instead of re-deduping the union. Work ∝ snapshot + collision buckets, "
    "never corpus×corpus (operators/minhash.py incremental_neardup_flags); "
    "oracle = exact snapshot×corpus jaccard recompute",
)
def t20_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.operators.minhash import (
        _shingle_sets,
        minhash_signatures,
        neardup_index_probe,
    )

    docs = load_table(spark, sf_dir, "documents")
    # scalar watermark: parquet max statistic, one tiny job (the same
    # 1-row-scalar idiom as the v-group query-vector lookups); empty
    # corpus → wm 0, both probe sides empty (zero-row-table sweep).
    # SNAPSHOT semantics: wm is baked into the plan at call time — the
    # frequent_keys/x04 caveat applies
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    wm = int(0.8 * (max_id + 1)) if max_id is not None else 0
    # Both probe sides come from ONE persisted tokenize→shingle→distinct
    # pass and ONE 64-hash signature aggregate, split by narrow watermark
    # filters — here corpus and snapshot live in the same table, so a
    # second scan would recompute identical subtrees. On a real feed the
    # corpus half arrives PREBUILT (the stored index) and only the
    # snapshot half is computed: neardup_index_probe takes either shape.
    sh = _shingle_sets(docs, "doc_id", "text", 3).persist()
    sigs = minhash_signatures(sh, "doc_id", 64).persist()
    is_snap = F.col("doc_id") >= wm
    # DELIBERATELY the plain probe (AQE picks strategies at runtime):
    # gating the bounded-snapshot plan behind a snapshot count was
    # prototyped in r13 and measured BOTH ways — under cold caches the
    # bounded plan's explicit pruning wins (4.9 -> 3.6 s noop), but
    # under the bench/driver protocol (best-of-N runs sharing the
    # persisted sh/sigs) the plain plan is reliably faster (interleaved
    # A/B: plain 2.4-3.0 s vs bounded 3.1-3.3 s best-of-3), because the
    # gate's per-run driver jobs (snapshot count + LIMIT-bounded
    # candidate collect + local-relation rebuild) are fixed latency the
    # cache cannot amortize. The bounded strategy remains what the
    # maxFilesPerTrigger-bounded streaming drains use, where there is
    # no cached index subtree and the index-sized exchange it avoids is
    # the dominant term.
    return neardup_index_probe(
        sh.filter(~is_snap),
        sigs.filter(~is_snap),
        sh.filter(is_snap),
        sigs.filter(is_snap),
        "doc_id",
        jaccard_threshold=0.5,
        snapshot_ids=docs.filter(is_snap),
    ).orderBy("doc_id")


@query(
    "t21_passage_dedup_stats",
    # Same engine-portable chunk construction as t12 (chunk_size=16,
    # overlap=0), md5 passage fingerprints, exact integer dup counts —
    # the cross-doc duplication profile is hash-stable by construction.
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+') AS t FROM documents
        -- NULL text yields no chunks (chunk_tokens' exclusion contract)
        WHERE text IS NOT NULL
    ),
    ch AS MATERIALIZED (
        -- coalesce: array_to_string([]) is NULL in DuckDB; the empty
        -- chunk must fingerprint as md5('') like Spark's array_join([]).
        -- list_transform, not a lateral UNNEST join: the lateral form
        -- copies the doc's FULL token list into every chunk row —
        -- O(chunks x tokens), 92 s for the sweep's 1 MB probe doc
        -- (the r11 oversized-doc find; the engine side was always a
        -- bounded slice per chunk, 7 s same corpus)
        SELECT doc_id, UNNEST(list_transform(
                   generate_series(0, CAST(greatest(1, ceil(len(t) / 16.0)) AS BIGINT) - 1),
                   i -> md5(coalesce(array_to_string(list_slice(t, 1 + i * 16, i * 16 + 16), ' '), ''))
               )) AS fp
        FROM toks
    ),
    cnts AS (
        SELECT fp, count(*) AS cnt FROM ch GROUP BY fp
    )
    SELECT ch.doc_id,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
           round(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) * 1000000.0 / count(*))
               / 1000000.0 AS dup_ratio
    FROM ch JOIN cnts USING (fp)
    GROUP BY ch.doc_id
    ORDER BY ch.doc_id
    """,
    doc="passage-level duplication profile (RefinedWeb/MassiveText-style sub-document "
    "dedup): each doc split into non-overlapping 16-token passages (t12's chunker, "
    "overlap=0), md5 passage fingerprints counted corpus-wide, per-doc share of "
    "passages that occur ≥2 times anywhere — the granularity at which boilerplate "
    "and templated text survive document-level dedup. Scale shape: map-only chunk "
    "explode, ONE count aggregate keyed on the fingerprint, a same-key join that "
    "reuses the fingerprint shuffle, then a doc-keyed aggregate — no all-pairs work",
)
def t21_passage_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_tokens(docs, "doc_id", "text", chunk_size=16, overlap=0)
    # the tokenize→chunk→hash explode feeds BOTH the corpus count and the
    # scoring join — persist it or the most expensive map stage runs twice
    # (the t19 lesson, asserted in tests/test_plan_quality.py)
    fp = ch.select("doc_id", F.md5("chunk_text").alias("fp")).persist()
    cnts = fp.groupBy("fp").agg(F.count("*").alias("cnt"))
    dup = F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0)).cast("bigint")
    return (
        fp.join(cnts, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_passages"),
            dup.alias("n_dup_passages"),
            (F.round(dup * 1000000.0 / F.count("*")) / 1000000.0).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


_SHARDS_N = 8


@query(
    "t22_shard_plan",
    # Both hashes are md5 prefixes the engines compute identically; the
    # modulo operands are non-negative, so % agrees; rank tie-breaks on
    # doc_id. The plan is therefore bit-stable across engines AND runs.
    oracle=f"""
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))::BIGINT
                % {_SHARDS_N} AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY ('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))::BIGINT
                            % {_SHARDS_N}
               ORDER BY md5('shard-v1|' || CAST(doc_id AS STRING)), doc_id
           ) AS BIGINT) AS pos
    FROM documents
    ORDER BY shard, pos
    """,
    doc=f"deterministic training-shard export plan: every doc gets a shard "
    f"(md5-prefix mod {_SHARDS_N}) and a within-shard pseudo-random position "
    "(second, salted md5) — the reproducible corpus → shards layout a trainer "
    "streams, replacing the reference's y/m/d partition loop "
    "(partition_transactions.py:34-61) for the pre-training use case. Scale "
    "shape: one map + ONE shuffle on shard + per-shard rank — the same single "
    "exchange any partitioned write pays; no RNG state, rerun-identical "
    "(operators/text.py shard_plan)",
)
def t22_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serverless_etl_reporting_pipeline_spark.operators.text import shard_plan

    docs = load_table(spark, sf_dir, "documents")
    return shard_plan(docs, "doc_id", _SHARDS_N).orderBy("shard", "pos")


@query(
    "t23_boilerplate_scrub",
    # Same chunk construction as t21 (16-token passages, md5
    # fingerprints, exact integer counts); the cleaned text is
    # reassembled in chunk order on both engines and compared BY HASH,
    # so the transform itself — not just its stats — is verified.
    # coalesce('') handles docs whose every passage is boilerplate
    # (SQL list() over zero rows is NULL; Spark's collect_list is []).
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(translate(text, 'İΣⰯꟀꟇꟉꟐꟖꟘꟵ𐕰𐕱𐕲𐕳𐕴𐕵𐕶𐕷𐕸𐕹𐕺𐕼𐕽𐕾𐕿𐖀𐖁𐖂𐖃𐖄𐖅𐖆𐖇𐖈𐖉𐖊𐖌𐖍𐖎𐖏𐖐𐖑𐖒𐖔𐖕', 'iσⱟꟁꟈꟊꟑꟗꟙꟶ𐖗𐖘𐖙𐖚𐖛𐖜𐖝𐖞𐖟𐖠𐖡𐖣𐖤𐖥𐖦𐖧𐖨𐖩𐖪𐖫𐖬𐖭𐖮𐖯𐖰𐖱𐖳𐖴𐖵𐖶𐖷𐖸𐖹𐖻𐖼')), '\w+') AS t FROM documents
        -- NULL text yields no chunks (chunk_tokens' exclusion contract)
        WHERE text IS NOT NULL
    ),
    -- struct-list transform, not a lateral UNNEST join: the lateral
    -- form copies the doc's FULL token list into every chunk row —
    -- O(chunks x tokens), 98 s for the sweep's 1 MB probe doc (r11
    -- oversized-doc find; the engine side slices per chunk, 1.7 s)
    ch0 AS (
        SELECT doc_id, UNNEST(list_transform(
                   generate_series(0, CAST(greatest(1, ceil(len(t) / 16.0)) AS BIGINT) - 1),
                   i -> struct_pack(
                       chunk_id := CAST(i AS INT),
                       c := list_slice(t, 1 + i * 16, i * 16 + 16))
               )) AS u
        FROM toks
    ),
    ch AS (
        SELECT doc_id, u.chunk_id AS chunk_id, u.c AS c FROM ch0
    ),
    f AS MATERIALIZED (
        -- coalesce: array_to_string([]) is NULL in DuckDB; empty
        -- chunks must hash/reassemble as '' like Spark (r8 sweep).
        -- MATERIALIZED: f feeds both the count aggregate and the
        -- reassembly join; inlined, the whole chunk build runs twice
        SELECT doc_id, chunk_id,
               md5(coalesce(array_to_string(c, ' '), '')) AS fp,
               len(c) AS n_tok,
               coalesce(array_to_string(c, ' '), '') AS ct
        FROM ch
    ),
    cnts AS (SELECT fp, count(*) AS cnt FROM f GROUP BY fp)
    SELECT f.doc_id,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(coalesce(sum(CASE WHEN cnt = 1 THEN n_tok END), 0) AS BIGINT) AS n_clean_tokens,
           -- ct joins the reassembly order: duplicate doc_ids (r10 hunt)
           -- collide on chunk_id, and the engine's struct sort is
           -- (chunk_id, chunk_text) — mirrored here
           md5(coalesce(array_to_string(list(ct ORDER BY chunk_id, ct) FILTER (WHERE cnt = 1), ' '), '')) AS cleaned_fp
    FROM f JOIN cnts USING (fp)
    GROUP BY f.doc_id
    ORDER BY f.doc_id
    """,
    doc="boilerplate passage scrub (the CCNet-style paragraph dedup TRANSFORM t21 "
    "only reports stats for): 16-token passages duplicated ANYWHERE in the corpus "
    "are dropped from every document, the cleaned text is reassembled in passage "
    "order, and the output carries kept/dropped counts plus an md5 of the cleaned "
    "text so the driver hash-checks the transform itself. Scale shape: map-only "
    "chunk explode persisted once (the t21 lint discipline), ONE shuffle for the "
    "corpus-wide fingerprint counts, a plain fp-keyed join back (the count frame "
    "is corpus-scale — never broadcast, the c08 lesson), one doc-keyed aggregate",
)
def t23_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # one persisted chunk subtree feeds BOTH the count side and the join
    # side — without it the tokenize+chunk explode (the most expensive
    # map stage) runs twice
    ch = (
        chunk_tokens(docs, "doc_id", "text", chunk_size=16, overlap=0)
        .select(
            "doc_id", "chunk_id", "n_chunk_tokens",
            F.md5("chunk_text").alias("fp"),
            "chunk_text",
        )
        .persist()
    )
    cnts = ch.groupBy("fp").agg(F.count("*").alias("cnt"))
    kept_struct = F.when(F.col("cnt") == 1, F.struct("chunk_id", "chunk_text"))
    return (
        ch.join(cnts, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_passages"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(F.col("cnt") == 1, F.col("n_chunk_tokens"))), F.lit(0)
            ).cast("bigint").alias("n_clean_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x.chunk_text,
                    ),
                    " ",
                )
            ).alias("cleaned_fp"),
        )
        .orderBy("doc_id")
    )


@query(
    "t24_contamination_ratio",
    # Exact integer shingle counts on both sides; the 20% policy test is
    # the integer comparison shared*5 >= n_shingles (no float ratio in
    # the verdict), and the reported ratio is micro-rounded once.
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
    hold_sh AS (
        SELECT DISTINCT s FROM sh
        WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1')
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN h.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS shared,
           CAST(round(sum(CASE WHEN h.s IS NOT NULL THEN 1 ELSE 0 END) * 1000000.0
                      / count(*)) AS BIGINT) AS ratio_micro,
           sum(CASE WHEN h.s IS NOT NULL THEN 1 ELSE 0 END) * 5 >= count(*)
               AS contaminated
    FROM sh LEFT JOIN hold_sh h USING (s)
    WHERE substr(md5(CAST(sh.doc_id AS STRING)), 1, 1) NOT IN ('0', '1')
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
    doc="decontamination POLICY verdict (the GPT-3/PaLM-style ratio rule t19's "
    "any-overlap count feeds): every training doc reports its distinct-8-gram "
    "count, how many collide with the frozen eval split, the overlap ratio, and "
    "the contaminated flag at the 20%% threshold — as an exact integer "
    "comparison (shared*5 >= n), so the policy decision itself is hash-checked. "
    "Scale shape: one persisted shingle subtree feeds both sides (t19 "
    "discipline), benchmark-sized eval set broadcast into a LEFT join over the "
    "training shingles, one doc-keyed aggregate — map + broadcast-probe, no "
    "corpus shuffle before the per-doc count",
)
def t24_contamination_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread the single-split fixture scan before the fan-out (see
    # sources/reader.py spread_scan; no-op on a many-split input)
    docs = spread_scan(docs, "doc_id")
    # hashed shingle ids through the persisted subtree and the broadcast
    # (the t19/shingle_set discipline — equality-only consumers)
    sh = (
        docs.select("doc_id", tokens("text").alias("t"))
        .select("doc_id", F.explode(shingles("t", 8)).alias("_s"))
        .select("doc_id", F.xxhash64("_s").alias("s"))
        .distinct()
        .persist()
    )
    is_hold = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    hold_sh = sh.filter(is_hold).select("s").distinct().withColumn("_h", F.lit(True))
    shared = F.sum(F.when(F.col("_h"), 1).otherwise(0)).cast("bigint")
    return (
        sh.filter(~is_hold)
        .join(F.broadcast(hold_sh), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            shared.alias("shared"),
            F.round(shared * 1000000.0 / F.count("*")).cast("bigint").alias("ratio_micro"),
            (shared * 5 >= F.count("*")).alias("contaminated"),
        )
        .orderBy("doc_id")
    )
