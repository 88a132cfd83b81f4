"""Skew-mitigation utilities for 100 TB joins and aggregations.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) splits oversized shuffle partitions at runtime and covers
most cases. These utilities cover the two cases AQE cannot:

- **skewed aggregation** (AQE only splits join partitions): two-phase
  salted aggregate — partial agg on (key, salt), final agg on key. Works
  for any algebraic aggregate (sum/count/min/max; avg via sum+count).
- **skewed broadcast-impossible join**: salt the skewed (fact) side with
  a random suffix, explode the replicated (dim) side across all salts,
  join on (key, salt). Turns one hot shuffle partition into `salts`
  even ones at the cost of replicating the dim rows `salts`×.

Salting is deterministic here (hash-based, not rand()) so results are
reproducible and retries/speculative tasks can't diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def _salt_col(cols: list[str], salts: int) -> Column:
    # deterministic per-row salt: hash of the whole row's key + a cheap
    # row discriminator; xxhash64 keeps it JVM-side
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.monotonically_increasing_id()), F.lit(salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    `aggs` maps column → one of sum/count/min/max. Phase 1 aggregates on
    (keys, salt) — map-side combine plus an even shuffle; phase 2 merges
    the ≤`salts` partials per key. For a hot key holding 20% of a 100 TB
    table this bounds any single reducer to 1/salts of the hot key.
    """
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in merge:
            raise ValueError(f"unsupported agg {fn!r}; use sum/count/min/max (avg = sum+count)")

    salted = df.withColumn(_SALT, _salt_col(keys, salts))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[first[fn](c).alias(f"_p_{c}_{fn}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge[fn](f"_p_{c}_{fn}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side, replicate the dim
    side across all salt values, join on (keys, salt).

    Use only when the dim side is too big to broadcast AND the fact key
    distribution is skewed beyond what AQE repairs; otherwise prefer a
    plain join (broadcast or SMJ). Dim replication costs `salts`× its
    size — keep `salts` small (8–32).
    """
    f = fact.withColumn(_SALT, _salt_col(on, salts))
    d = dim.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    out = f.join(d, on + [_SALT], how)
    return out.drop(_SALT)
