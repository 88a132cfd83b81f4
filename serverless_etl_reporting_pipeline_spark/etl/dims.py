"""Dimension extraction from the denormalized fact
(reference `pipeline/ETL/partition_transactions.py:12-18`, D1).

Projection + distinct; the dims are tiny by construction, so downstream
joins against them should always broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TRUCK_DIM_COLUMNS = ("truck_id", "truck_name", "truck_description", "has_card_reader", "fsa_rating")
PAYMENT_DIM_COLUMNS = ("payment_method_id", "payment_method")


def extract_dims(fact: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Return (dim_trucks, dim_payment_methods)."""
    dim_trucks = fact.select(*TRUCK_DIM_COLUMNS).distinct()
    dim_payments = fact.select(*PAYMENT_DIM_COLUMNS).distinct()
    return dim_trucks, dim_payments
