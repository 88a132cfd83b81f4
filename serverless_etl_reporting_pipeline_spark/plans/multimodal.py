"""Multimodal corpus: binary payload metadata (oracle-checked) and the
stubbed decode pipeline (rows-only; see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_etl_reporting_pipeline_spark.operators.multimodal import (
    attach_binary,
    decode_media_features,
    frame_sample,
    resize,
)
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
    # the stub decode is md5-derived, so DuckDB can reproduce it:
    # byte k of md5 = two hex nibbles → width/height/channels
    oracle="""
    SELECT doc_id,
           64 + (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
              + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) AS width,
           64 + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
              + (instr('0123456789abcdef', substr(h, 4, 1)) - 1) AS height,
           1 + ((instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
              + (instr('0123456789abcdef', substr(h, 6, 1)) - 1)) % 4 AS n_channels
    FROM (SELECT doc_id, md5(text) AS h FROM documents WHERE text IS NOT NULL)
    """,
    doc="Arrow-batched decode/feature-extract via mapInPandas (stub codec, md5-derived "
    "and therefore oracle-reproducible) — north star multimodal",
)
def m02_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = decode_media_features(attach_binary(docs))
    return feats.select("doc_id", "width", "height", "n_channels")


@query(
    "m03_frame_sample",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS frame_idx, md5(text || '#' || i) AS frame_md5
    FROM (
        SELECT doc_id, text,
               4 + (instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1) % 8 AS n_frames
        FROM documents WHERE text IS NOT NULL
    ), UNNEST(generate_series(0, n_frames - 1)) AS u(i)
    WHERE i % 2 = 0
    """,
    doc="video frame sampling via mapInPandas 1→N fan-out (stub codec, oracle-reproducible "
    "md5 frame fingerprints) — north star multimodal",
)
def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_binary(docs), every_n=2)


@query(
    "m04_resize",
    oracle="""
    SELECT doc_id, 64 AS width, 64 AS height, md5(text || '#resize#64x64') AS resized_md5
    FROM documents WHERE text IS NOT NULL
    """,
    doc="image resize via mapInPandas (stub kernel, real Arrow-batch plumbing) — north star multimodal",
)
def m04_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize(attach_binary(docs), 64, 64)
