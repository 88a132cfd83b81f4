"""Vector similarity operators over `array<float>` embedding columns
(SURVEY.md §2.11 north-star set).

Cosine is computed JVM-side with array higher-order functions
(`zip_with` + `aggregate` left fold) in DOUBLE — no Python UDF, stays in
codegen, and the float→double promotion is exact so the DuckDB oracle
can reproduce results bit-for-bit (DuckDB's built-in
`list_cosine_similarity` accumulates in float32 — ~1e-8 off — so oracles
use the explicit double formulation instead).

Scale paths:
- brute-force top-k: one map + TakeOrderedAndProject — linear scan,
  embarrassingly parallel, the right baseline even at 100 TB when k is
  small and queries are few;
- `ann_topk_lsh`: BucketedRandomProjectionLSH bucketing for repeated /
  batched queries — prunes the scan to matching buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product (matches DuckDB list_sum order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def knn_bruteforce(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector.

    Plans as scan → project(cosine) → TakeOrderedAndProject: no shuffle
    of the vectors, only k rows cross the network per partition.
    """
    q = F.lit(query_vec)
    cos = cosine(as_double(vec_col), q)
    return (
        df.select(id_col, (F.round(cos * 1000000) / 1000000.0).alias("cos"), cos.alias("_raw"))
        .orderBy(F.desc("_raw"), F.asc(id_col))
        .limit(k)
        .drop("_raw")
    )


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate top-k via random-projection LSH buckets.

    At 100 TB the model's hash tables prune the candidate set to the
    query's buckets; deterministic with the fixed seed. Distance is
    euclidean (the LSH family's metric); for cosine semantics normalize
    vectors upstream.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feats = df.select(id_col, array_to_vector(as_double(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feats)
    return model.approxNearestNeighbors(feats, Vectors.dense(query_vec), k, distCol="dist").select(
        id_col, "dist"
    )
