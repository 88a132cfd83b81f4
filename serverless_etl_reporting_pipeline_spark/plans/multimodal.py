"""Multimodal corpus: binary payload metadata (oracle-checked) and the
stubbed decode pipeline (rows-only; see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.multimodal import attach_binary, decode_media_features
from serverless_etl_reporting_pipeline_spark.plans.base import query
from serverless_etl_reporting_pipeline_spark.sources.reader import load_table


@query(
    "m01_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           'text/plain' AS mime
    FROM documents
    """,
    doc="binary payload + typed metadata carried through relational ops — north star multimodal columns",
)
def m01_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs)
    return media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.col("meta.mime").alias("mime"),
    )


@query(
    "m02_decode_features",
    oracle=None,  # decode kernel is a mapInPandas stub (md5-derived fake, deterministic)
    doc="Arrow-batched decode/feature-extract via mapInPandas (stubbed codec) — north star multimodal",
)
def m02_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = decode_media_features(attach_binary(docs))
    return feats.select("doc_id", "width", "height", "n_channels").orderBy("doc_id")
