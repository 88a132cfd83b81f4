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

    Shuffle profile: one token row per (doc, token) with 64 codegen'd
    bit-sum aggregate columns → a single partial+final hash aggregate on
    `id_col`; no ×64 row blow-up (an earlier formulation exploded a bit
    index per token and was ~4× slower at sf0.1), no skew (every doc
    aggregates to exactly one 64-int row).
    """
    toks = df.select(id_col, F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
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
