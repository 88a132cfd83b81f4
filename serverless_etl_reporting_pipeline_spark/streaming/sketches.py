"""Streaming sketches: incremental per-group KMV distinct estimation.

The batch KMV (`operators/sketch.py`) prunes each split to k minimum
hashes; the streaming form keeps that same k-min set as *keyed state*
across micro-batches (`applyInPandasWithState`), so a continuously-fed
pipeline gets an always-current distinct estimate without ever
re-scanning history — state is O(k) per group, merge is a sorted-union
truncate, and the emitted estimate is the SAME integer arithmetic as
the batch operator (asserted equal in tests/test_streaming.py).

The key hash (48-bit md5 prefix) is computed JVM-side BEFORE the
stateful group step, so the Python kernel only merges integers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from serverless_etl_reporting_pipeline_spark.operators.sketch import HASH_SPACE, md5_hash48

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("k_used", T.LongType()),
        T.StructField("kth_hash", T.LongType()),
        T.StructField("est_distinct", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mins", T.ArrayType(T.LongType())),
    ]
)


def streaming_kmv_by_group(
    events: DataFrame, group_col: str, key: Column, k: int = 256
) -> DataFrame:
    """Per-group streaming KMV: emits (group_key, n_rows, k_used,
    kth_hash, est_distinct) after every micro-batch, estimates exact
    while the group has seen < k distinct keys.

    State per group is the k smallest distinct hashes plus a row count —
    bounded regardless of stream length; identical estimate formula to
    the batch `kmv_sketch_grouped`, so batch and stream agree once the
    stream has drained (equivalence asserted in tests).
    """
    hashed = events.select(
        F.col(group_col).cast("string").alias("group_key"), md5_hash48(key).alias("h")
    )

    def update(key_t, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, mins = state.get if state.exists else (0, [])
        seen = set(mins)
        for pdf in pdfs:
            n += len(pdf)
            seen.update(int(h) for h in pdf["h"])
        mins = sorted(seen)[:k]
        state.update((n, mins))
        k_used = len(mins)
        kth = mins[-1] if mins else None
        est = k_used if k_used < k else (k - 1) * HASH_SPACE // kth
        yield _pd.DataFrame(
            {
                "group_key": [key_t[0]],
                "n_rows": [n],
                "k_used": [k_used],
                "kth_hash": [kth],
                "est_distinct": [est],
            }
        )

    return hashed.groupBy("group_key").applyInPandasWithState(
        update,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
