from serverless_etl_reporting_pipeline_spark.operators.text import (
    exact_dedup,
    fingerprint_md5,
    normalize_text,
    shingles,
    simhash_bits,
    tokens,
)

__all__ = [
    "tokens",
    "normalize_text",
    "shingles",
    "exact_dedup",
    "fingerprint_md5",
    "simhash_bits",
]
