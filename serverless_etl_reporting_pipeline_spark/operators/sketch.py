"""Distributed sketch operators: KMV distinct-count and frequent-items
candidate pruning.

The reference has no approximate machinery at all — its only
cardinality answer is Athena's exact `COUNT(DISTINCT …)`
(`pipeline/athena_queries.sql:27`, `dashboard.py:188`), which at 100 TB
means shuffling every distinct key. These two operators are the
scale-path replacements, built so their OUTPUT is still deterministic
and oracle-checkable (no RNG, no engine-private hash):

- **KMV (k-minimum-values) distinct estimator.** Hash every key to a
  48-bit integer via an md5 prefix (portable: DuckDB computes the very
  same value), keep the k smallest *distinct* hash values, estimate
  D ≈ (k-1) · 2^48 / h_(k). All integer arithmetic → the estimate is
  bit-identical across engines and partitionings. The Arrow partial
  pass prunes each input split to ≤k candidate hashes, so the final
  exact merge (distinct → top-k) moves ≤ splits·k rows instead of one
  row per distinct key — that is the entire point at 100 TB.

- **Frequent-items candidate pruning (Misra-Gries).** For a threshold
  "freq > n/T", any qualifying key must have per-split frequency
  > n_s/(m+1) in at least one split when m ≥ T (pigeonhole over
  splits), and such a key provably survives that split's m-counter
  Misra-Gries summary. The Arrow pass maintains exactly that bounded
  summary and emits its ≤ m survivors as candidates; a broadcast
  semi-join + exact recount then filters to the TRUE heavy hitters. Output is exact and deterministic
  — only the amount of shuffled data is approximate (candidate keys
  instead of the full key space).

Both partial passes are Arrow-batched `mapInPandas` (vectorized
`pandas.value_counts` / `nsmallest`), never row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 12 hex chars of md5 → 48-bit hash space. Small enough that
# (k-1) · SPACE stays inside BIGINT for k ≤ 2^15, large enough that
# collisions are negligible at fixture scale (and identical in both
# engines when they do happen, since the hash function is shared).
HASH_HEX_CHARS = 12
HASH_SPACE = 16**HASH_HEX_CHARS  # 2^48

_K_MAX = 32768  # (k-1)·2^48 must stay inside BIGINT (see comment above)


def _check_k(k: int) -> None:
    if not 1 < k <= _K_MAX:
        raise ValueError(
            f"KMV sketch size k={k} outside [2, {_K_MAX}]: k=1 degenerates "
            "the (k-1)*2^48 estimator to 0 on any input, and above the cap "
            "(k-1)*2^48 overflows BIGINT"
        )


def md5_hash48(col: Column) -> Column:
    """Portable 48-bit key hash: first 12 hex chars of md5 as BIGINT.

    DuckDB twin: ``('0x' || substr(md5(key), 1, 12))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, HASH_HEX_CHARS), 16, 10).cast(
        "bigint"
    )


def kmv_sketch(df: DataFrame, key: Column, k: int = 256) -> DataFrame:
    """One-row distinct-count estimate of `key` over `df`.

    Returns columns: ``n_rows`` (exact row count), ``k_used`` (hashes
    retained; < k means the sketch saw every distinct key and the
    estimate is exact), ``kth_hash`` (the largest retained hash),
    ``est_distinct``.

    Plan shape: map-only hash projection → ONE Arrow partial per split
    that both prunes to the split's k smallest distinct hashes AND
    counts the split's rows (≤ splits·(k+1) rows survive — the partial
    accumulates across Arrow batches; a per-batch yield would let
    batches·k rows through, and a separate count() would re-scan the
    whole input) → exact distinct+top-k merge on the pruned set →
    1-row aggregate. One pass over the data, no full-cardinality
    shuffle. The pruned frame is persisted: it feeds the sketch branch
    and the row-count branch, and is ≤ splits·(k+1) rows — bounded.

    NULL keys hash to NULL and are excluded from the sketch (but still
    counted in ``n_rows``) — dropped inside the partial so pandas
    ``nsmallest`` (NaN-dropping) and Spark's nulls-first ordering can
    never disagree.
    """
    _check_k(k)
    hashed = df.select(key.alias("_k")).select(md5_hash48(F.col("_k")).alias("h"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc, n = None, 0
        for b in batches:
            if len(b):
                n += len(b)
                s = b["h"].dropna().drop_duplicates()
                acc = s if acc is None else pd.concat([acc, s]).drop_duplicates()
                acc = acc.nsmallest(k)
        if n:
            yield pd.DataFrame(
                {"h": acc.astype("Int64"), "cnt": pd.array([None] * len(acc), dtype="Int64")}
            )
            yield pd.DataFrame(
                {"h": pd.array([None], dtype="Int64"), "cnt": pd.array([n], dtype="Int64")}
            )

    pruned = hashed.mapInPandas(partial, schema="h long, cnt long").persist()
    topk = pruned.filter(F.col("h").isNotNull()).select("h").distinct().orderBy("h").limit(k)
    sketch = topk.agg(
        F.count("*").cast("bigint").alias("k_used"),
        F.max("h").alias("kth_hash"),
    )
    est = (
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(F.expr(f"CAST({k - 1} * {HASH_SPACE}L DIV kth_hash AS BIGINT)"))
        .cast("bigint")
    )
    # combine the two 1-row aggregates by union + max — a join on a
    # constant key constant-folds into a nested-loop shape the corpus
    # lint (rightly) bans, so don't join at all
    n = pruned.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_rows")).select(
        "n_rows",
        F.lit(None).cast("bigint").alias("k_used"),
        F.lit(None).cast("bigint").alias("kth_hash"),
    )
    merged = n.unionByName(
        sketch.select(F.lit(None).cast("bigint").alias("n_rows"), "k_used", "kth_hash")
    ).agg(
        F.max("n_rows").alias("n_rows"),
        F.max("k_used").alias("k_used"),
        F.max("kth_hash").alias("kth_hash"),
    )
    return merged.select("n_rows", "k_used", "kth_hash", est.alias("est_distinct"))


def _kmin_sets(df: DataFrame, group_cols: list[str], key: Column, k: int) -> DataFrame:
    """Per-group k-minimum hash SETS: (*group_cols, h, rk) with rk ≤ k —
    the mergeable sketch state behind both the per-group estimator
    (`kmv_sketch_grouped`) and the pairwise set algebra
    (`kmv_set_algebra`). Each split prunes to ≤k candidates per group
    (Arrow partial) BEFORE the distinct+rank shuffle, so the exchange
    moves ≤ splits·k·groups rows, never the key space. The partial
    accumulates ACROSS Arrow batches and yields once per split — a
    per-batch yield would let up to batches·k·groups rows survive,
    silently voiding the bound at real split sizes (~10k rows/batch)."""
    _check_k(k)
    bad = set(group_cols) & {"h", "rk"}
    if bad:
        raise ValueError(
            f"group column(s) {sorted(bad)} collide with internal sketch "
            "columns — rename them first (the kmv_set_algebra guard, here "
            "for every _kmin_sets caller)"
        )
    hashed = df.select(*group_cols, md5_hash48(key).alias("h")).filter(
        F.col("h").isNotNull()
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for b in batches:
            if len(b):
                d = b if acc is None else pd.concat([acc, b], ignore_index=True)
                acc = (
                    d.drop_duplicates()
                    .sort_values("h", kind="mergesort")
                    .groupby(group_cols, sort=False, dropna=False)
                    .head(k)
                )
        if acc is not None:
            yield acc

    from pyspark.sql import Window

    pruned = hashed.mapInPandas(partial, schema=hashed.schema)
    return (
        pruned.distinct()
        .withColumn("rk", F.row_number().over(Window.partitionBy(*group_cols).orderBy("h")))
        .filter(F.col("rk") <= k)
    )


def kmv_sketch_grouped(
    df: DataFrame, group_cols: list[str], key: Column, k: int = 256
) -> DataFrame:
    """Per-group KMV distinct estimate — the mergeable form that matters
    at 100 TB: each split prunes to ≤k candidate hashes *per group it
    sees*, the per-group merge (distinct → rank ≤ k) runs on pruned
    data, and only group-cardinality-sized aggregates ever join.

    Returns ``*group_cols, n_rows, k_used, kth_hash, est_distinct``
    (one row per group; ``k_used < k`` ⇒ the estimate is exact).

    NULL semantics are defined and engine-matched: NULL *key values*
    hash to NULL and are excluded from the sketch (still counted in
    ``n_rows``); NULL *group keys* are kept as their own group
    (``dropna=False`` in the pandas partial, matching Spark groupBy and
    SQL GROUP BY) — a NULL group would otherwise get an n_rows row but
    no sketch row and vanish through the inner join.
    """
    bad = set(group_cols) & {"k_used", "kth_hash", "n_rows", "est_distinct"}
    if bad:
        raise ValueError(
            f"group column(s) {sorted(bad)} collide with the estimator's "
            "output columns — rename them first"
        )
    ranked = _kmin_sets(df, group_cols, key, k)
    sk = ranked.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("k_used"),
        F.max("h").alias("kth_hash"),
    )
    n = df.groupBy(*group_cols).agg(F.count("*").cast("bigint").alias("n_rows"))
    est = (
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(F.expr(f"CAST({k - 1} * {HASH_SPACE}L DIV kth_hash AS BIGINT)"))
        .cast("bigint")
    )
    # null-safe equi-join so a NULL group keeps its sketch row (oracle
    # twin: IS NOT DISTINCT FROM); groups whose EVERY key is NULL have no
    # sketch row and are (deliberately, documented) absent from the output
    cond = [n[c].eqNullSafe(sk[c]) for c in group_cols]
    return n.join(sk, cond).select(
        *[n[c] for c in group_cols], "n_rows", "k_used", "kth_hash", est.alias("est_distinct")
    )


def frequent_keys(df: DataFrame, key: Column, threshold_denom: int, capacity: int) -> DataFrame:
    """Exact keys with ``count > n / threshold_denom`` via candidate pruning.

    ``capacity`` (m) must be ≥ ``threshold_denom`` (T) for the
    superset guarantee: freq > n/T ⇒ per-split freq > n_s/(m+1)
    somewhere ⇒ the key survives that split's m-counter Misra-Gries
    summary (its counter stays > 0 through every decrement round) ⇒ it
    reaches the candidate set. The recount pass is exact, so the output
    equals the plain groupBy answer — verified by the oracle stating
    the plain form.

    The per-split summary is a true bounded Misra-Gries: counters are
    merged batch-by-batch and, when more than ``capacity`` survive, the
    (m+1)-th largest count is subtracted from all (the Agarwal et al.
    mergeable-summaries step) — so split memory is O(capacity + batch)
    and ≤ capacity candidates leave each split, instead of the
    unbounded per-batch emission that would shuffle batches·capacity
    rows.

    NULL keys are excluded from candidates and the output (pandas
    value_counts drops them; the final filter removes them explicitly)
    while ``n`` still counts every row — i.e. the plain-groupBy
    equality is over NON-NULL keys, with NULL rows raising the bar as
    threshold mass. Callers needing the NULL group must count it
    directly.

    Returns ``key_value, cnt`` (unsorted; caller orders/annotates).
    """
    if capacity < threshold_denom:
        raise ValueError(f"capacity {capacity} must be >= threshold_denom {threshold_denom}")
    keyed = df.select(key.cast("string").alias("key_value"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = None
        for b in batches:
            if len(b):
                vc = b["key_value"].value_counts()
                counters = vc if counters is None else counters.add(vc, fill_value=0)
                if len(counters) > capacity:
                    # MG merge: subtract the (m+1)-th largest count, drop
                    # non-positive counters — any key with split frequency
                    # > n_split/(m+1) provably survives to the end
                    sub = counters.nlargest(capacity + 1).iloc[-1]
                    counters = counters[counters > sub] - sub
        if counters is not None and len(counters):
            yield pd.DataFrame({"key_value": counters.index})

    candidates = keyed.mapInPandas(partial, schema="key_value string").distinct()
    n = keyed.agg(F.count("*").cast("bigint").alias("n_rows"))
    counts = (
        keyed.join(F.broadcast(candidates), "key_value", "left_semi")
        .groupBy("key_value")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # attach the scalar total without a constant-key join (which would
    # constant-fold into a nested-loop shape): union a NULL-key total
    # row, spread it with a whole-frame window — the frame is candidate-
    # sized, so the single-partition window is bounded (w02 idiom)
    from pyspark.sql import Window

    u = counts.withColumn("_nr", F.lit(None).cast("bigint")).unionByName(
        n.select(
            F.lit(None).cast("string").alias("key_value"),
            F.lit(None).cast("bigint").alias("cnt"),
            F.col("n_rows").alias("_nr"),
        )
    )
    u = u.withColumn("n_rows", F.max("_nr").over(Window.partitionBy())).drop("_nr")
    return u.filter(
        F.col("key_value").isNotNull() & (F.col("cnt") * threshold_denom > F.col("n_rows"))
    )


def kmv_set_algebra(
    df: DataFrame,
    group_col: str,
    key: Column,
    k: int = 256,
    pairs: list[tuple] | None = None,
) -> DataFrame:
    """Pairwise union/intersection distinct estimates from per-group KMV
    sketches — the mergeable-sketch algebra an exact COUNT(DISTINCT)
    cannot offer at 100 TB: once the ≤k-row per-group sketch state
    exists, EVERY pair estimate is arithmetic over groups·k rows,
    never another pass over the key space.

    For each unordered group pair (a < b):

    - the union sketch is the k smallest distinct hashes of the two
      k-min sets (KMV mergeability: topk(KA ∪ KB) = topk(A ∪ B));
    - ``est_union`` follows the kmv_sketch rule ((k-1)·2^48 DIV h_(k),
      exact when k_used < k);
    - ``shared`` counts union-sketch survivors present in BOTH input
      sketches, and ``est_inter = shared · est_union DIV k_used`` — the
      standard KMV/theta intersection estimator, here in exact integer
      arithmetic so DuckDB reproduces it bit-for-bit.

    Physical shape: the k-min sets are built with the Arrow-pruned
    `_kmin_sets` pass; the group list (group-cardinality — aggregate-
    sized) is collected driver-side to enumerate pairs (the v01/v11
    idiom), the (pair, group) membership map is the only broadcast, and
    all pair math runs on ≤ pairs·k rows.

    All-pairs is quadratic in GROUP cardinality by definition — fine for
    dashboard-grade group counts (event types, domains, cohorts), the
    wrong ask for 10^5+ groups. That regime passes an explicit ``pairs``
    list (the candidate pairs something upstream selected), which skips
    the driver-side group enumeration entirely; cost is then pairs·k.
    Explicit pairs are normalized and DEDUPLICATED; a self-pair raises
    (its answer is the group's own cardinality — ask kmv_sketch_grouped);
    a pair whose groups have no sketch rows yields NO output row.
    """
    if group_col in {"g", "h", "pid", "rk", "type_a", "type_b"}:
        raise ValueError(
            f"kmv_set_algebra: group_col {group_col!r} collides with an "
            "internal column name — rename the column first"
        )
    # NULL groups are excluded from the pair algebra (a pair with an
    # unnamed side has no meaning; the per-group estimator still reports
    # the NULL group on its own via kmv_sketch_grouped). Persisted: the
    # frame feeds both the group-enumeration collect and the pair query.
    sets = (
        _kmin_sets(df, [group_col], key, k)
        .filter(F.col(group_col).isNotNull())
        .select(group_col, "h")
        .persist()
    )
    spark = df.sparkSession
    if pairs is not None:
        if any(a == b for a, b in pairs):
            raise ValueError(
                "kmv_set_algebra: self-pair requested — a group's "
                "self-intersection is its own cardinality (kmv_sketch_grouped)"
            )
        # normalize AND dedupe: (a,b)/(b,a) duplicates would get distinct
        # pids whose final aggregate rows double-count k_used/shared
        pair_list = sorted({(a, b) if a <= b else (b, a) for a, b in pairs})
    else:
        groups = sorted(r[0] for r in sets.select(group_col).distinct().collect())
        pair_list = [(a, b) for i, a in enumerate(groups) for b in groups[i + 1:]]
    pm = spark.createDataFrame(
        [(i, g, ga, gb) for i, (ga, gb) in enumerate(pair_list) for g in (ga, gb)],
        schema=sets.select(
            F.lit(0).cast("int").alias("pid"),
            F.col(group_col).alias("g"),
            F.col(group_col).alias("type_a"),
            F.col(group_col).alias("type_b"),
        ).schema,
    )
    tagged = sets.join(F.broadcast(pm), sets[group_col] == pm["g"]).select(
        "pid", "type_a", "type_b", "g", "h"
    )
    from pyspark.sql import Window

    # per (pair, h): does the hash sit in BOTH sides' sketches?
    per_h = tagged.groupBy("pid", "type_a", "type_b", "h").agg(
        (F.count_distinct("g") == 2).alias("in_both")
    )
    uk = per_h.withColumn(
        "rk", F.row_number().over(Window.partitionBy("pid").orderBy("h"))
    ).filter(F.col("rk") <= k)
    # aggregate by pid (the pair identity): grouping by the name columns
    # would merge rows across pids if callers ever bypassed the dedup
    sk = uk.groupBy("pid", "type_a", "type_b").agg(
        F.count("*").cast("bigint").alias("k_used"),
        F.max("h").alias("kth_hash"),
        F.sum(F.when(F.col("in_both"), 1).otherwise(0)).cast("bigint").alias("shared"),
    )
    est_union = (
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(F.expr(f"CAST({k - 1} * {HASH_SPACE}L DIV kth_hash AS BIGINT)"))
        .cast("bigint")
    )
    return (
        sk.withColumn("est_union", est_union)
        .select(
            "type_a", "type_b", "k_used", "shared", "est_union",
            F.expr("CAST(shared * est_union DIV k_used AS BIGINT)").alias("est_inter"),
        )
        .orderBy("type_a", "type_b")
    )
