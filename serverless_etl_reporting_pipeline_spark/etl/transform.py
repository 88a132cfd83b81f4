"""Cleaning/casting/dedup transform (reference `pipeline/ETL/transform.py`).

Semantics preserved, re-expressed declaratively so Catalyst fuses the
whole clean into the scan (filters push down, casts stay in whole-stage
codegen):

- drop rows with NULL `total`            (transform.py:15, P2)
- drop rows with zero `total`            (transform.py:16, P3)
- pence → pounds: `total/100` as double  (transform.py:21, P10)
- `at` → timestamp                       (transform.py:24)
- `has_card_reader` → boolean            (transform.py:27)
- keyed dedup keep-first on (at, truck_id, payment_method_id, total)
                                         (transform.py:30-37, D2)
- drop rows NULL in any critical column  (transform.py:40-42, P4)

Two deliberate semantic upgrades (SURVEY.md §7.3):

- pandas' keep-first depends on input order, which doesn't exist in a
  distributed shuffle — we keep the row with the lowest
  `transaction_id`, which is deterministic on any cluster and matches
  pandas whenever input was id-ordered.
- the NULL-critical drop runs BEFORE the dedup (the reference dedupes
  first, then drops NULLs — transform.py:37 vs :40). Under the
  reference's order, a dedup group whose input-order winner happens to
  have a NULL transaction_id vanishes entirely even when the group
  contains valid rows; here NULL-critical rows never enter the dedup,
  so they can neither win a group nor suppress its valid duplicates.
  The swap only changes outcomes for exactly those groups, and keeps
  "every surviving key had at least one fully-valid row" true.

Scale note: the dedup is a window over the dedup key — Spark shuffles by
key once; no global sort. Key cardinality ≈ row count, so skew is not a
concern. At 100 TB this is the one shuffle of the clean stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# what the JDBC extract produces before cleaning (FIXTURES.md §1,
# extract.py:87-97: raw `total` is integer pence, flags are 0/1 ints)
RAW_TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.LongType()),
        T.StructField("at", T.StringType()),
        T.StructField("total", T.LongType()),
        T.StructField("truck_id", T.IntegerType()),
        T.StructField("payment_method_id", T.IntegerType()),
        T.StructField("truck_name", T.StringType()),
        T.StructField("truck_description", T.StringType()),
        T.StructField("has_card_reader", T.IntegerType()),
        T.StructField("fsa_rating", T.IntegerType()),
        T.StructField("payment_method", T.StringType()),
    ]
)

DEDUP_KEY = ("at", "truck_id", "payment_method_id", "total")
CRITICAL_COLUMNS = ("transaction_id", "at", "total", "truck_id", "payment_method_id")


def clean_transactions(raw: DataFrame) -> DataFrame:
    """Full clean: filters → casts → deterministic keep-first dedup."""
    cleaned = (
        raw.filter(F.col("total").isNotNull())  # transform.py:15
        .filter(F.col("total") != 0)  # transform.py:16
        .withColumn("total", F.col("total").cast("double") / 100)  # transform.py:21
        .withColumn("at", F.col("at").cast("timestamp"))  # transform.py:24
        .withColumn("has_card_reader", F.col("has_card_reader").cast("boolean"))  # transform.py:27
        .na.drop(subset=list(CRITICAL_COLUMNS))  # transform.py:40-42
    )
    w = Window.partitionBy(*DEDUP_KEY).orderBy("transaction_id")
    return (
        cleaned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_report(raw: DataFrame) -> DataFrame:
    """Duplicate groups on the dedup key (the reference's warning print,
    transform.py:30-34), as data instead of a log line."""
    return (
        raw.groupBy(*DEDUP_KEY)
        .agg(F.count("*").alias("copies"), F.min("transaction_id").alias("kept_transaction_id"))
        .filter(F.col("copies") > 1)
    )
