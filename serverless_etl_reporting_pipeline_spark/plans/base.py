"""Registry for the judged query surface.

Each entry pairs a PySpark DataFrame builder with the equivalent ANSI SQL
that DuckDB runs on the same parquet tables (the differential oracle —
SURVEY.md §5.1). Column aliases MUST match between the two: the driver
sorts columns by name before hashing values.

Oracle-stability conventions (FIXTURES.md §3):
- every computed/aggregate column explicitly aliased, lowercase;
- floating aggregates wrapped in ``round(x, 2)`` so sum-order float noise
  cannot flip the hash;
- integer-ish derivations cast to the Spark result type in the oracle SQL
  (DuckDB ``year()`` returns BIGINT, Spark returns INT, …);
- LIMIT/top-k queries carry a unique tie-breaker in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""  # reference citation / operator IDs covered


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    """Decorator registering a corpus query."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return deco
