"""MinHash-LSH near-duplicate detection (SURVEY.md §2.11).

Scale path for document near-dup at 100 TB: shingle → hash features →
MinHash signatures → LSH banding (`pyspark.ml.feature.MinHashLSH`
approxSimilarityJoin), which joins only within LSH buckets instead of
the O(n²) all-pairs. Deterministic given the fixed seed.

The exact-jaccard shingle join (plans/text.py t07) is the small-scale
oracle; tests check the LSH pairs against it (recall on true pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.text import shingles, tokens


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) with LSH-estimated
    jaccard distance below (1 - jaccard_threshold)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = (
        df.select(id_col, tokens(text_col).alias("toks"))
        .withColumn("sh", shingles("toks", shingle_k))
        .filter(F.size("sh") > 0)
        .select(id_col, "sh")
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def minhash_dedup_survivors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-dup dedup: drop every doc that has a near-duplicate with a
    lower id (greedy keep-lowest; one anti-join, no connected components
    needed for the keep-first policy)."""
    pairs = minhash_neardup_pairs(df, id_col, text_col, jaccard_threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
