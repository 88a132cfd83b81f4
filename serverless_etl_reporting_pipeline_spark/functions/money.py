"""Exact money arithmetic for oracle-stable aggregation.

Why this exists: summing doubles is order-dependent, and with monetary
data the true aggregate often lands *exactly* on a half-cent boundary
(e.g. avg = 141428.955), so ``round(sum(x), 2)`` can round differently in
Spark vs the DuckDB oracle depending on float noise — a guaranteed hash
mismatch eventually. (The reference has the same latent bug in its pandas
float money handling, `transform.py:21`; SURVEY.md §7.3 flags it.)

The fix is integer-cents arithmetic:

- per-row ``cents(x) = CAST(round(x*100) AS BIGINT)`` — deterministic in
  both engines because both evaluate the identical double expression and
  scale-0 rounding of positive-or-negative doubles agrees (HALF_UP ==
  half-away-from-zero away from .5-representable points);
- sums of BIGINT are exact and order-independent — map-side partial
  aggregation stays safe at any scale;
- every derived double (revenue = cents/100.0, avg, percentage) is then
  bit-identical across engines because it is computed from identical
  integers with the identical operation order.

Rounding rule: only ever ``round`` at integer scale (scale 0), and only
on cross-engine-identical doubles. Never ``round(x, 2)`` on a float
aggregate.

DuckDB-side equivalents (for oracle SQL strings):
    sum:  CAST(sum(CAST(round(x * 100) AS BIGINT)) AS BIGINT) / 100.0
    avg:  round(CAST(sum(CAST(round(x * 100) AS BIGINT)) AS BIGINT) / count(*)) / 100.0
    pct:  round(c * 10000.0 / total_c) / 100.0
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer cents from a (conceptually 2-decimal) double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def money_sum(col: Column | str) -> Column:
    """Exact, order-independent money sum as a 2-decimal double."""
    return F.sum(cents(col)) / 100.0


def money_avg(col: Column | str) -> Column:
    """Money average rounded to the cent, deterministic across engines."""
    return F.round(F.sum(cents(col)) / F.count(F.lit(1))) / 100.0


def pct_of(part_cents: Column, total_cents: Column) -> Column:
    """Percentage with 2 decimals from two exact cent totals."""
    return F.round(part_cents * 10000.0 / total_cents) / 100.0


def round2(col: Column) -> Column:
    """Round a cross-engine-identical double to 2 decimals safely.

    Only valid when ``col`` is derived from exact integers (see module
    docstring) — scale-0 round of identical doubles agrees everywhere.
    """
    return F.round(col * 100) / 100.0


# DuckDB SQL snippets for oracle strings (kept next to the Spark helpers
# so the two definitions can't drift):
DUCK_SUM = "CAST(sum(CAST(round({x} * 100) AS BIGINT)) AS BIGINT) / 100.0"
DUCK_AVG = "round(CAST(sum(CAST(round({x} * 100) AS BIGINT)) AS BIGINT) / count(*)) / 100.0"


def duck_sum(x: str) -> str:
    return DUCK_SUM.format(x=x)


def duck_avg(x: str) -> str:
    return DUCK_AVG.format(x=x)


def metric(col: Column | str) -> Column:
    """An UNTRUSTED telemetry metric: NaN is treated as NULL — the
    observation (event row) exists, its measurement doesn't. Feeds the
    money/stat helpers so counts keep the row while every value-derived
    aggregate skips it, and `cents()`'s ANSI bigint cast never sees NaN
    (CAST_OVERFLOW). TPC-H monetary columns are generator-controlled
    and stay on the trusted direct path. Oracle-side mirror:
    ``CASE WHEN isnan(value) THEN NULL ELSE value END`` (DUCK_METRIC).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)


DUCK_METRIC = "CASE WHEN isnan({x}) THEN NULL ELSE {x} END"


def duck_metric(x: str) -> str:
    """DuckDB mirror of `metric()` for oracle strings — NaN → NULL."""
    return DUCK_METRIC.format(x=x)
