"""Timezone-free timestamp literals.

The engine keeps event times TIMESTAMP_NTZ end-to-end and the driver
runs an UNPINNED session, so every timestamp LITERAL must reach the
plan without a session-timezone interpretation. The hazard (r11 find,
demonstrated in the scd2 watermark): ``F.lit(py_datetime)`` types the
naive value as session-zoned TIMESTAMP — under any non-UTC session a
later ``cast("timestamp_ntz")`` (or an implicit coercion against an
NTZ column) shifts it by the whole zone offset (measured: 5 h under
America/New_York), silently mis-routing every comparison near the
boundary. String literals are safe (``CAST('2024-01-03' AS
TIMESTAMP_NTZ)`` parses timezone-free); Python datetimes must be
FORMATTED first — which is all this helper does.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


def ntz_lit(value: "str | datetime") -> Column:
    """A TIMESTAMP_NTZ literal from a string or naive datetime,
    independent of the session timezone."""
    if isinstance(value, datetime):
        if value.tzinfo is not None:
            raise ValueError(
                "ntz_lit takes naive datetimes: an aware value has no "
                "canonical NTZ reading"
            )
        value = value.strftime("%Y-%m-%d %H:%M:%S.%f")
    return F.to_timestamp_ntz(F.lit(value))
