"""Text-pipeline operator library (SURVEY.md §2.11 north-star set).

Everything here is built from JVM-side built-ins (regexp, array lambdas,
md5) — no Python UDFs in the hot path — so the operators stay inside
whole-stage codegen and scale linearly with input splits. Determinism
discipline: every hash is md5-derived (stable across engines, versions
and partitionings), every keep-first resolves by lowest id.

At 100 TB:
- tokenize/normalize/fingerprint are map-only (no shuffle);
- exact dedup shuffles once on the dedup key;
- shingle-based similarity must NOT be a naive self-join on shingle —
  use MinHashLSH banding (operators/minhash.py) or block by a coarse
  key; the corpus query blocks by `source`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WORD_RE = r"\w+"


# The engine-portable case-fold contract, PROVEN COMPLETE by the
# exhaustive sweep in tools/casefold_parity.py (r11; every assigned
# Unicode code point, all planes, four word contexts, Spark lower vs
# DuckDB lower): exactly 45 code points diverge between the JVM
# (JDK 17 = Unicode 13, full/contextual case mapping) and DuckDB's
# utf8proc (simple fold, different Unicode data version). Each is
# pinned to the UNICODE-STANDARD simple-fold lowercase via a pre-lower
# translate applied identically on BOTH engines (the oracle SQL carries
# the same translate — duck_casefold() below). Three classes:
#   1. Full-vs-simple mapping (both engines know the char, Java's
#      FULL mapping differs from the simple fold):
#        U+0130 İ  -> 'i'  (Java emits 'i' + U+0307 combining dot —
#                           the original r10 find)
#        U+03A3 Σ  -> 'σ'  (Java applies the CONTEXTUAL final-sigma
#                           rule: word-final Σ -> ς; the r10 probe
#                           tested Σ only in isolation and missed it)
#   2. Unicode-version skew, Java ahead (JDK lowers these; this
#      DuckDB's utf8proc predates their case mapping and keeps them):
#      U+2C2F and seven Latin Extended-D capitals (U+A7C0 A7C7 A7C9
#      A7D0 A7D6 A7D8 A7F5) -> their standard lowercase (+1).
#   3. Unicode-version skew, both wrong (Vithkuqi, Unicode 14): JDK 17
#      has no mapping (identity); this utf8proc build maps the 35
#      capitals by -0x20 INTO THE CAUCASIAN ALBANIAN BLOCK (a data
#      bug); the standard is +0x27. Pinned to the standard; both
#      engines leave the small letters (U+10597+) unchanged, so the
#      translated form folds identically.
_CASEFOLD_PINS: dict[int, int] = {
    0x0130: 0x0069,  # İ -> i
    0x03A3: 0x03C3,  # Σ -> σ (simple fold, never final-form ς)
    0x2C2F: 0x2C5F,  # GLAGOLITIC CAPITAL CAUDATE CHRIVI
    0xA7C0: 0xA7C1,  # LATIN CAPITAL OLD POLISH O
    0xA7C7: 0xA7C8,  # LATIN CAPITAL D WITH SHORT STROKE OVERLAY
    0xA7C9: 0xA7CA,  # LATIN CAPITAL S WITH SHORT STROKE OVERLAY
    0xA7D0: 0xA7D1,  # LATIN CAPITAL CLOSED INSULAR G
    0xA7D6: 0xA7D7,  # LATIN CAPITAL MIDDLE SCOTS S
    0xA7D8: 0xA7D9,  # LATIN CAPITAL SIGMOID S
    0xA7F5: 0xA7F6,  # LATIN CAPITAL REVERSED HALF H
    # Vithkuqi capitals (U+10570-U+10595 minus the three unassigned
    # slots 1057B/1058B/10593) -> standard lowercase at +0x27
    **{cp: cp + 0x27 for cp in range(0x10570, 0x10596) if cp not in (0x1057B, 0x1058B, 0x10593)},
}

CASEFOLD_SRC = "".join(chr(k) for k in _CASEFOLD_PINS)
CASEFOLD_DST = "".join(chr(v) for v in _CASEFOLD_PINS.values())


def duck_casefold(expr: str) -> str:
    """The oracle-side twin of :func:`casefold`: a DuckDB SQL fragment
    applying the SAME 45-code-point pre-lower translate, so both
    engines compute one proven-identical fold. (None of the pinned
    chars needs SQL escaping.) Oracle strings inline the expansion so
    they stay self-contained and greppable."""
    return f"lower(translate({expr}, '{CASEFOLD_SRC}', '{CASEFOLD_DST}'))"


def casefold(col: Column | str) -> Column:
    """Engine-portable lowercase for TEXT columns: the Unicode simple
    fold, identical on Spark and DuckDB for EVERY assigned code point
    (proven by the exhaustive tools/casefold_parity.py sweep — see
    _CASEFOLD_PINS above for the 45 pinned divergences, of which the
    r10 probe had found one, İ). Keeps every token list, token count,
    and content hash identical across engines and across JVM/ICU
    upgrades; oracle SQL applies the same translate via
    duck_casefold()."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.translate(c, CASEFOLD_SRC, CASEFOLD_DST))


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens (F.regexp_extract_all — JVM-side)."""
    return F.regexp_extract_all(casefold(col), F.lit(WORD_RE), 0)


# The whitespace class, written EXPLICITLY on both engines (r12 find,
# the casefold-pin pattern): Java's \s is [ \t\n\x0B\f\r] while RE2's
# (DuckDB) is [ \t\n\f\r] — they disagree on exactly one code point,
# VERTICAL TAB (U+000B; probed against \x0C, \x1C-\x1F, \x85, NBSP,
# U+2028/29, ZWSP — all others agree). A doc containing \x0B normalized
# to different bytes per engine ("a b" vs "ab"), flipping t02/t06/c04
# fingerprints and t05's punct count. Both engines now share these
# literal classes (= Java's \s set, so engine behavior is unchanged
# and \x0B stays whitespace, its Unicode category).
WS = r"\t\n\x0B\f\r "  # class body; spell \s as [WS] on BOTH engines
NORM_STRIP_RE = "[^a-z0-9" + WS + "]"
NORM_WS_RE = "[" + WS + "]+"
PUNCT_STRIP_RE = "[a-zA-Z0-9" + WS + "]"


def normalize_text(col: Column | str) -> Column:
    """Canonical form for near-exact dedup: lowercase, strip non-alnum,
    collapse whitespace (the explicit WS class — see its note)."""
    out = casefold(col)
    out = F.regexp_replace(out, NORM_STRIP_RE, "")
    out = F.regexp_replace(out, NORM_WS_RE, " ")
    return F.trim(out)


def shingles(tokens_col: str, k: int = 3) -> Column:
    """k-word shingles from a token-array column (0-based array expr).

    A document with fewer than k tokens yields an EMPTY array — the
    size guard matters: ``sequence(1, 0)`` in Spark DESCENDS to
    ``[1, 0]`` (it infers step -1) rather than being empty like
    DuckDB's ``generate_series(1, 0)``, so the unguarded form indexes
    past the token array and, under Spark 4's default ANSI mode,
    crashes every shingle consumer on the first short document."""
    parts = ", ' ', ".join(f"{tokens_col}[i - 1 + {j}]" for j in range(k))
    return F.expr(
        f"if(size({tokens_col}) >= {k}, "
        f"transform(sequence(1, size({tokens_col}) - {k - 1}), i -> concat({parts})), "
        f"array())"
    )


# Gopher/C4-style quality-rule thresholds, first matching reason wins.
# Chosen to actually partition the fixture corpus (token counts 10-99,
# stopword ratio 0-0.22, top-token share 0.05-0.30 at sf0.01).
_QF_MIN_TOKENS = 25
_QF_MIN_STOPWORD_RATIO = 0.03
_QF_MAX_REPETITION = 0.15
_QF_STOPWORDS = ("the", "a", "of", "and", "to", "is", "in")


def _token_profile(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop, mx): total tokens, stopword hits, and the
    top single-token count per document — one explode, one (doc, token)
    count, one per-doc aggregate; every downstream ratio is a ratio of
    these exact integers."""
    toks_e = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    per_tok = toks_e.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))
    stop_hits = F.sum(F.when(F.col("tok").isin(*_QF_STOPWORDS), F.col("n")).otherwise(0))
    return per_tok.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        stop_hits.alias("stop"),
        F.max("n").alias("mx"),
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one row per key, deterministically the lowest id (D2 dedup
    generalized; reference transform.py:30-37)."""
    w = Window.partitionBy(*key_cols).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def fingerprint_md5(col: Column | str) -> Column:
    """Stable document fingerprint: md5 hex of the normalized text."""
    return F.md5(normalize_text(col).cast("binary"))


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Split each document into overlapping token windows — the standard
    pre-training/RAG chunking op: chunk i covers tokens
    [i·stride+1, i·stride+chunk_size] with stride = chunk_size - overlap.

    Chunk count is `max(1, ceil((n_tokens - overlap) / stride))`, so every
    token lands in ≥1 chunk, consecutive chunks share `overlap` tokens,
    and an empty/short document still yields one (possibly short) chunk.
    A NULL document has nothing to chunk and yields NO rows (the
    NULL-payload exclusion discipline; unfiltered, Spark's md5(NULL) and
    DuckDB's md5(array_to_string(NULL)) = md5('') would silently
    diverge — found by the r8 degenerate-input sweep).

    Map-only at any scale: tokenize, per-row chunk-count arithmetic, an
    explode bounded by n_tokens/stride, and array `slice` — all JVM
    codegen, no shuffle, parallelism = input splits.

    Returns (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens(text_col).alias("_t")
    )
    # ceil((n - overlap) / stride) in exact integer-over-double math:
    # the dividend is a small int, so floor((x + stride - 1)/stride) is
    # exact and identical in Spark and DuckDB.
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((F.size("_t") - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)),
    ).cast("int")
    fan = base.select(
        id_col, "_t", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    )
    chunk = F.slice(F.col("_t"), F.col("chunk_id") * stride + 1, chunk_size)
    return fan.select(
        id_col,
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Deterministic per-stratum quota sample: the `n_per_stratum` rows
    of each stratum that rank lowest by md5(id) — a rerun-stable,
    engine-portable pick (no RNG, no sampleBy fraction drift), the
    per-language/per-source balancing step of a corpus pipeline.

    Physical shape: one shuffle keyed by the strata columns, then a
    row_number window. The md5 order makes the within-stratum sort key
    uniform, so quota selection is unbiased w.r.t. any natural ordering.
    At 100 TB, a giant stratum still fully sorts inside its partitions;
    when quotas are small relative to strata, a map-only hash-prefix
    pre-filter (t10-style md5 threshold sized to over-cover the quota)
    in front of this window cuts the sorted volume by orders of
    magnitude without changing the selection.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def simhash_bits(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document as a '0'/'1' bitstring column `simhash`.

    Classic Charikar construction over distinct tokens: each token
    hashes to 64 bits (md5 hex digits → nibbles); bit j of the signature
    is the sign of sum(±1) across tokens. Built engine-portably from
    md5 + integer arithmetic so an oracle can reproduce it bit-for-bit.

    Shuffle profile: one token row per (doc, token) with 64 codegen'd
    bit-sum aggregate columns → a single partial+final hash aggregate on
    `id_col`; no ×64 row blow-up (an earlier formulation exploded a bit
    index per token and was ~4× slower at sf0.1), no skew (every doc
    aggregates to exactly one 64-int row).
    """
    # distinct PER DOCUMENT (not per row): the signature is a function
    # of the doc's token SET, so a doc sharded into multiple rows with
    # the same id — the r10 duplicate-id class — hashes the union,
    # row-sharding-invariant like the minhash family's shingle sets
    # (the oracle's SELECT DISTINCT doc_id, md5(tok) frame)
    toks = df.select(
        id_col, F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).distinct()
    # 128-bit md5 as four 32-bit integer chunks (hex chars are MSB-first,
    # so chunk c covers bits 32c..32c+31 — same numbering as the
    # nibble-by-nibble oracle construction); bit extraction is then pure
    # integer shift/mod, no per-bit string ops.
    h = F.md5(F.col("tok").cast("binary"))
    base = toks.select(
        id_col,
        *[
            F.conv(F.substring(h, 8 * c + 1, 8), 16, 10).cast("long").alias(f"c{c}")
            for c in range(2)
        ],
    )
    aggs = []
    for j in range(64):
        bit = F.shiftright(F.col(f"c{j // 32}"), 31 - (j % 32)) % 2
        aggs.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    summed = base.groupBy(id_col).agg(*aggs)
    sig = F.concat(
        *[F.when(F.col(f"s{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(64)]
    )
    return summed.select(id_col, sig.alias("simhash"))


def shard_exprs(id_col: str, n_shards: int, salt: str = "shard-v1") -> tuple[Column, Column]:
    """The (shard, sort_key) column pair shared by `shard_plan` and
    `sources/lake.write_training_shards` — ONE implementation of the
    hash layout, so the planner query (t22) and the materializing writer
    can never drift apart.

    shard = md5-prefix(id) mod n_shards (portable integer hash — the
    same value in DuckDB); sort_key = a SECOND salted md5, so shard
    membership and intra-shard order are independent hashes (changing
    the salt reshuffles order without moving rows between shards).
    Both derive from the id alone — rerun-stable, no RNG state."""
    sid = F.col(id_col).cast("string")
    shard = (
        F.conv(F.substring(F.md5(sid), 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    sort_key = F.md5(F.concat(F.lit(salt + "|"), sid))
    return shard, sort_key


def shard_plan(
    df: DataFrame, id_col: str, n_shards: int, salt: str = "shard-v1"
) -> DataFrame:
    """Deterministic training-shard assignment + within-shard pseudo-
    random order — the EXPORT step of a curation pipeline (the corpus →
    N reproducible shards a trainer streams), replacing the reference's
    y/m/d partition loop (`pipeline/ETL/partition_transactions.py:34-61`)
    with a hash layout a training run can replay bit-for-bit.

    shard = md5-prefix(id) mod n_shards (portable integer hash — the
    same value in DuckDB), pos = rank within the shard ordered by a
    SECOND salted md5 (so shard membership and intra-shard order are
    independent hashes; changing the salt reshuffles order without
    moving rows between shards). Everything is derived from the id —
    rerun-stable with no RNG state to persist.

    Scale shape: one map to compute (shard, sort_key), ONE shuffle on
    shard, rank via row_number per shard — at 100 TB this is the same
    single exchange any partitioned write pays; no global sort.
    """
    shard, sort_key = shard_exprs(id_col, n_shards, salt)
    from pyspark.sql import Window

    return df.select(
        id_col,
        shard.alias("shard"),
        F.row_number()
        .over(Window.partitionBy(shard).orderBy(sort_key, F.col(id_col)))
        .cast("bigint")
        .alias("pos"),
    )
