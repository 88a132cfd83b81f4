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


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens (F.regexp_extract_all — JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), 0)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for near-exact dedup: lowercase, strip non-alnum,
    collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    out = F.regexp_replace(out, r"[^a-z0-9\s]", "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def shingles(tokens_col: str, k: int = 3) -> Column:
    """k-word shingles from a token-array column (0-based array expr)."""
    parts = ", ' ', ".join(f"{tokens_col}[i - 1 + {j}]" for j in range(k))
    return F.expr(
        f"transform(sequence(1, greatest(size({tokens_col}) - {k - 1}, 0)), i -> concat({parts}))"
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one row per key, deterministically the lowest id (D2 dedup
    generalized; reference transform.py:30-37)."""
    w = Window.partitionBy(*key_cols).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def fingerprint_md5(col: Column | str) -> Column:
    """Stable document fingerprint: md5 hex of the normalized text."""
    return F.md5(normalize_text(col).cast("binary"))


def simhash_bits(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document as a '0'/'1' bitstring column `simhash`.

    Classic Charikar construction over distinct tokens: each token
    hashes to 64 bits (md5 hex digits → nibbles); bit j of the signature
    is the sign of sum(±1) across tokens. Built engine-portably from
    md5 + integer arithmetic so an oracle can reproduce it bit-for-bit.

    Shuffle profile: explode(tokens)×64 bits → groupBy(id, j) is a
    single shuffle keyed by (doc, bit) — fully parallel, no skew (all
    docs produce exactly 64 groups).
    """
    toks = df.select(id_col, F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    bits = toks.select(
        id_col,
        F.md5(F.col("tok").cast("binary")).alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("j"),
    )
    digit = F.instr(F.lit("0123456789abcdef"), F.substring("h", (F.col("j") / 4).cast("int") + 1, 1)) - 1
    shift = F.pow(F.lit(2.0), 3 - (F.col("j") % 4)).cast("int")
    bit = (digit / shift).cast("int") % 2
    contrib = (bit * 2 - 1).alias("contrib")
    summed = bits.select(id_col, "j", contrib).groupBy(id_col, "j").agg(F.sum("contrib").alias("s"))
    sig = summed.select(
        id_col, "j", F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0")).alias("b")
    )
    return sig.groupBy(id_col).agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(j, b))), x -> x.b)"), ""
        ).alias("simhash")
    )
