"""Streaming surface: checkpointed AvailableNow ingest, watermarked
windows, stateful operators, and the five stateful ingest twins
(curation funnel, vector-dedup band index, text MinHash index, IVF
retrieval index, SCD2 version log)."""

from serverless_etl_reporting_pipeline_spark.streaming.funnel import (
    compact_funnel_lake,
    compact_hash_state,
    incremental_funnel_drain,
    vacuum_funnel_lake,
    vacuum_hash_state,
)
from serverless_etl_reporting_pipeline_spark.streaming.ingest import available_now_ingest
from serverless_etl_reporting_pipeline_spark.streaming.minhash import (
    compact_text_index,
    incremental_text_dedup_drain,
    vacuum_text_index,
)
from serverless_etl_reporting_pipeline_spark.streaming.ivf import (
    compact_ivf_segments,
    incremental_ivf_ingest_drain,
    load_ivf_state,
    refresh_ivf_state,
    vacuum_ivf_segments,
)
from serverless_etl_reporting_pipeline_spark.streaming.scd2 import (
    compact_scd2_hist,
    incremental_scd2_drain,
    scd2_current,
    scd2_snapshot,
    scd2_table,
    vacuum_scd2_hist,
)
from serverless_etl_reporting_pipeline_spark.streaming.vectors import (
    compact_band_index,
    incremental_vector_dedup_drain,
    vacuum_band_index,
)
from serverless_etl_reporting_pipeline_spark.streaming.windows import windowed_counts

__all__ = [
    "available_now_ingest",
    "windowed_counts",
    "incremental_funnel_drain",
    "compact_hash_state",
    "compact_funnel_lake",
    "vacuum_hash_state",
    "vacuum_funnel_lake",
    "incremental_vector_dedup_drain",
    "compact_band_index",
    "vacuum_band_index",
    "incremental_text_dedup_drain",
    "compact_text_index",
    "vacuum_text_index",
    "incremental_ivf_ingest_drain",
    "compact_ivf_segments",
    "vacuum_ivf_segments",
    "refresh_ivf_state",
    "load_ivf_state",
    "incremental_scd2_drain",
    "scd2_table",
    "scd2_current",
    "scd2_snapshot",
    "compact_scd2_hist",
    "vacuum_scd2_hist",
]
