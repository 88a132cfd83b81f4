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


def _est_distinct(k: int) -> Column:
    """The shared KMV estimate expression over (k_used, kth_hash):
    exact when the sketch saw every distinct key (k_used < k), else
    (k-1)·2^48 DIV h_(k) — all BIGINT arithmetic, engine-identical."""
    return (
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(F.expr(f"CAST({k - 1} * {HASH_SPACE}L DIV kth_hash AS BIGINT)"))
        .cast("bigint")
    )


def _kmin_partials(
    df: DataFrame, group_cols: list[str], key: Column, k: int, with_counts: bool = False
) -> DataFrame:
    """The ONE Arrow partial behind every KMV operator: per split, the
    k smallest *distinct* hashes per group (≤ splits·k·groups rows leave
    each split — the partial accumulates ACROSS Arrow batches; a
    per-batch yield would let batches·k·groups rows through, silently
    voiding the bound at real split sizes of ~10k rows/batch).

    With ``with_counts=True`` the SAME pass also folds the exact
    per-group row count (NULL keys included) and emits it as one extra
    ``(group, h=NULL, cnt)`` row per group per split — so estimators
    needing n_rows pay ONE scan of the input, never a second
    ``groupBy().count()`` over the corpus. Output schema:
    ``(*group_cols, h[, cnt])``; sketch rows carry cnt=NULL.

    NULL keys hash to NULL and never enter the sketch (dropped inside
    the partial so pandas NaN handling and Spark's null ordering can
    never disagree); NULL *group* keys are kept as their own group
    (``dropna=False``, matching Spark groupBy / SQL GROUP BY).
    ``group_cols=[]`` is the ungrouped (1-sketch) form."""
    _check_k(k)
    bad = set(group_cols) & {"h", "rk", "cnt"}
    if bad:
        raise ValueError(
            f"group column(s) {sorted(bad)} collide with internal sketch "
            "columns — rename them first (the kmv_set_algebra guard, here "
            "for every caller)"
        )
    hashed = df.select(*group_cols, md5_hash48(key).alias("h"))
    if not with_counts:
        hashed = hashed.filter(F.col("h").isNotNull())
    out_schema = hashed.schema
    if with_counts:
        from pyspark.sql import types as T

        # fresh StructType — .add() mutates in place and would corrupt
        # the source frame's cached schema
        out_schema = T.StructType([*hashed.schema.fields, T.StructField("cnt", T.LongType())])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc, counts, n = None, None, 0
        for b in batches:
            if not len(b):
                continue
            if with_counts:
                if group_cols:
                    c = b.groupby(group_cols, sort=False, dropna=False).size().reset_index(name="cnt")
                    counts = (
                        c
                        if counts is None
                        else pd.concat([counts, c], ignore_index=True)
                        .groupby(group_cols, sort=False, dropna=False)["cnt"]
                        .sum()
                        .reset_index()
                    )
                else:
                    n += len(b)
                b = b.dropna(subset=["h"])
                if not len(b):
                    continue
            if group_cols:
                d = b[[*group_cols, "h"]]
                d = d if acc is None else pd.concat([acc, d], ignore_index=True)
                acc = (
                    d.drop_duplicates()
                    .sort_values("h", kind="mergesort")
                    .groupby(group_cols, sort=False, dropna=False)
                    .head(k)
                )
            else:
                s = b["h"].drop_duplicates()
                acc = s if acc is None else pd.concat([acc, s]).drop_duplicates()
                acc = acc.nsmallest(k)
        if acc is not None and len(acc):
            sk = acc if group_cols else pd.DataFrame({"h": acc})
            sk = sk.assign(h=sk["h"].astype("Int64"))
            yield sk.assign(cnt=pd.array([None] * len(sk), dtype="Int64")) if with_counts else sk
        if with_counts:
            if group_cols:
                if counts is not None and len(counts):
                    yield counts.assign(h=pd.array([None] * len(counts), dtype="Int64"))[
                        [*group_cols, "h", "cnt"]
                    ]
            elif n:
                yield pd.DataFrame(
                    {"h": pd.array([None], dtype="Int64"), "cnt": pd.array([n], dtype="Int64")}
                )

    return hashed.mapInPandas(partial, schema=out_schema)


def kmv_sketch(df: DataFrame, key: Column, k: int = 256) -> DataFrame:
    """One-row distinct-count estimate of `key` over `df`.

    Returns columns: ``n_rows`` (exact row count), ``k_used`` (hashes
    retained; < k means the sketch saw every distinct key and the
    estimate is exact), ``kth_hash`` (the largest retained hash),
    ``est_distinct``.

    Plan shape — ONE pass over the data, ONE linear plan, nothing
    persisted: map-only hash projection → the shared Arrow partial
    (k-min candidates + folded row count, ≤ splits·(k+1) rows survive)
    → hash-merge on h (count rows collapse into one NULL-h row) → a
    whole-frame rank (bounded input — the w02 single-partition-window
    idiom) → 1-row aggregate. No full-cardinality shuffle, no second
    scan for the count, and no cache entry left pinned (an earlier
    version persisted the partial to feed two branches and leaked the
    cache entry for the session).
    """
    pruned = _kmin_partials(df, [], key, k, with_counts=True)
    from pyspark.sql import Window

    per = pruned.groupBy("h").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    # rank the single merged NULL-h count row FIRST (nulls_first), then
    # the hashes ascending: `rk <= k+1` keeps the count row + the k
    # smallest distinct hashes, and because it is a plain row_number
    # limit Spark plans it as partial+final WindowGroupLimit — each
    # partition is pruned BEFORE the single-partition exchange
    ranked = per.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("h").asc_nulls_first()))
    ).filter(F.col("rk") <= k + 1)
    merged = ranked.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count("h").cast("bigint").alias("k_used"),
        F.max("h").alias("kth_hash"),
    )
    return merged.select("n_rows", "k_used", "kth_hash", _est_distinct(k).alias("est_distinct"))


def _kmin_sets(df: DataFrame, group_cols: list[str], key: Column, k: int) -> DataFrame:
    """Per-group k-minimum hash SETS: (*group_cols, h, rk) with rk ≤ k —
    the mergeable sketch state behind the pairwise set algebra
    (`kmv_set_algebra`). The shared Arrow partial prunes each split to
    ≤k candidates per group BEFORE the distinct+rank shuffle, so the
    exchange moves ≤ splits·k·groups rows, never the key space."""
    from pyspark.sql import Window

    pruned = _kmin_partials(df, group_cols, key, k)
    # Two exchanges here are DELIBERATE (r14 audit): collapsing the
    # (group, h) distinct and the per-group rank onto one hash(group)
    # shuffle (the e06 shared-exchange trick) would land a group's
    # ENTIRE splits·k candidate set in one task — a serial per-group
    # merge at 100 TB (~splits·k ≈ 2e8 rows/group at 800k splits).
    # The (group, h) exchange keeps the cross-split dedup parallel and
    # the partial WindowGroupLimit caps what the second, (group)-keyed
    # exchange moves to partitions·k rows per group.
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
    sees*, the per-group merge runs on pruned data, and the exact
    per-group row count rides the SAME Arrow partial (the kmv_sketch
    count fold) — ONE scan of the input, where an earlier version paid
    a second full ``df.groupBy().count()`` pass.

    Returns ``*group_cols, n_rows, k_used, kth_hash, est_distinct``
    (one row per group; ``k_used < k`` ⇒ the estimate is exact).

    Plan shape: shared Arrow partial (sketch rows + one count row per
    group per split) → hash-merge on (*group_cols, h) → per-group rank
    with the merged NULL-h count row FIRST (nulls_first: rk=1, so the
    `rk <= k+1` WindowGroupLimit keeps it plus the k smallest hashes —
    ranking it LAST would evict it from exactly the full-sketch groups)
    → per-group aggregate. All post-partial exchanges move
    ≤ splits·(k+1)·groups rows. No join, nothing persisted.

    NULL semantics are defined and engine-matched: NULL *key values*
    hash to NULL and are excluded from the sketch (still counted in
    ``n_rows``); NULL *group keys* are kept as their own group
    (``dropna=False`` in the pandas partial, matching Spark groupBy and
    SQL GROUP BY). Groups whose EVERY key is NULL have no sketch row
    and are (deliberately, documented) absent from the output.
    """
    bad = set(group_cols) & {"k_used", "kth_hash", "n_rows", "est_distinct"}
    if bad:
        raise ValueError(
            f"group column(s) {sorted(bad)} collide with the estimator's "
            "output columns — rename them first"
        )
    if not group_cols:
        raise ValueError("group_cols must be non-empty — use kmv_sketch for the 1-sketch form")
    from pyspark.sql import Window

    pruned = _kmin_partials(df, group_cols, key, k, with_counts=True)
    # Two exchanges are DELIBERATE here — see _kmin_sets: a single
    # hash(group) shuffle would serialize each group's splits·(k+1)-row
    # merge into one task at 100 TB; the (group, h) merge keeps it
    # parallel and the partial WindowGroupLimit caps the second,
    # (group)-keyed exchange at partitions·(k+1) rows per group.
    per = pruned.groupBy(*group_cols, "h").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    # per group: rank the single merged NULL-h count row FIRST
    # (nulls_first), then the hashes ascending — `rk <= k+1` keeps the
    # count row + the k smallest distinct hashes, planned as
    # partial+final WindowGroupLimit (≤ k+1 rows per group cross the
    # per-group exchange)
    ranked = per.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy(*group_cols).orderBy(F.col("h").asc_nulls_first())
        ),
    ).filter(F.col("rk") <= k + 1)
    out = (
        ranked.groupBy(*group_cols)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count("h").cast("bigint").alias("k_used"),
            F.max("h").alias("kth_hash"),
        )
        .filter(F.col("k_used") > 0)
    )
    return out.select(
        *group_cols, "n_rows", "k_used", "kth_hash", _est_distinct(k).alias("est_distinct")
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

    Plan shape — TWO scans of the input, the minimum this operator
    admits: the Arrow partial emits each split's ≤capacity candidates
    PLUS one NULL-key row carrying the split's exact row count (the
    kmv_sketch count fold — an earlier version paid a THIRD full scan
    just for ``n``); the candidate set and total are collected
    driver-side from one bounded aggregate (executes the partial ONCE);
    the second scan is the exact recount of the broadcast-pruned
    candidates, which by construction cannot ride the first pass
    (candidates aren't known until every split reports).

    SNAPSHOT SEMANTICS — this operator is EAGER at the candidate step:
    the candidate/total pass executes at CALL time (the driver collect
    above), and ``n_rows`` is baked into the returned plan as a
    literal. The returned frame's recount, however, runs at ACTION
    time — so if the input table mutates between the call and the
    action, ``cnt`` reflects the new data while candidates and
    ``n_rows`` are stale. Call it on an immutable snapshot (every
    corpus use reads fixed parquet), or re-call after mutating.

    Returns ``key_value, cnt, n_rows`` (unsorted; caller orders).
    """
    if capacity < threshold_denom:
        raise ValueError(f"capacity {capacity} must be >= threshold_denom {threshold_denom}")
    keyed = df.select(key.cast("string").alias("key_value"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters, n = None, 0
        for b in batches:
            if len(b):
                n += len(b)
                vc = b["key_value"].value_counts()
                counters = vc if counters is None else counters.add(vc, fill_value=0)
                if len(counters) > capacity:
                    # MG merge: subtract the (m+1)-th largest count, drop
                    # non-positive counters — any key with split frequency
                    # > n_split/(m+1) provably survives to the end
                    sub = counters.nlargest(capacity + 1).iloc[-1]
                    counters = counters[counters > sub] - sub
        if counters is not None and len(counters):
            yield pd.DataFrame(
                {
                    "key_value": counters.index,
                    "split_n": pd.array([None] * len(counters), dtype="Int64"),
                }
            )
        if n:
            yield pd.DataFrame(
                {
                    "key_value": pd.array([None], dtype="string"),
                    "split_n": pd.array([n], dtype="Int64"),
                }
            )

    pruned = keyed.mapInPandas(partial, schema="key_value string, split_n long")
    # ONE execution of the partial: candidates + total are collected
    # driver-side from one bounded aggregate (≤ distinct candidates + 1
    # rows — the same set the semi-join must BROADCAST anyway, so it
    # fits by construction; the v01/x05 aggregate-collect idiom). Two
    # lazy consumers of `pruned` would instead re-run the full-input
    # partial once each.
    merged = pruned.groupBy("key_value").agg(F.sum("split_n").cast("bigint").alias("_nr"))
    rows = merged.collect()
    n_total = next((int(r["_nr"]) for r in rows if r["key_value"] is None), 0)
    cand = [(r["key_value"],) for r in rows if r["key_value"] is not None]
    spark = df.sparkSession
    if not cand or n_total == 0:
        return spark.createDataFrame([], "key_value string, cnt bigint, n_rows bigint")
    candidates = spark.createDataFrame(cand, "key_value string")
    # scan 2: exact recount of candidate keys only (NULL input keys
    # never match the semi-join — the documented NULL exclusion)
    return (
        keyed.join(F.broadcast(candidates), "key_value", "left_semi")
        .groupBy("key_value")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn("n_rows", F.lit(n_total).cast("bigint"))
        .filter(F.col("cnt") * threshold_denom > F.col("n_rows"))
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
    a pair with NEITHER group in the data yields NO output row, and a
    pair with exactly ONE present group degenerates to that group's own
    sketch (est_union = its cardinality estimate, shared = est_inter =
    0 — the set-algebra answer for A ∪ ∅ / A ∩ ∅).
    """
    if group_col in {"g", "h", "pid", "rk", "type_a", "type_b"}:
        raise ValueError(
            f"kmv_set_algebra: group_col {group_col!r} collides with an "
            "internal column name — rename the column first"
        )
    # NULL groups are excluded from the pair algebra (a pair with an
    # unnamed side has no meaning; the per-group estimator still reports
    # the NULL group on its own via kmv_sketch_grouped). NOT persisted:
    # in the enumeration path the k-min pass runs twice (once for the
    # group collect, once when the result executes) — the price of not
    # pinning a cache entry for the session (an earlier version leaked
    # one per call); callers that know their pairs skip the first pass
    # entirely via the `pairs` argument.
    sets = (
        _kmin_sets(df, [group_col], key, k)
        .filter(F.col(group_col).isNotNull())
        .select(group_col, "h")
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
        # Enumerate groups WITHOUT running the k-min pass a second time:
        # a group appears in the sketch iff it has >= 1 non-NULL key (a
        # non-NULL key always hashes to a non-NULL h), so the cheap
        # distinct over the raw frame is EXACTLY the sketch's group set
        # — including on degenerate inputs (an all-NULL-key group is in
        # neither). Collecting from `sets` instead cost a whole extra
        # md5 + per-split top-k pass per call (the x05 drift the r10
        # profile found: 1.75 s isolated, half of it this collect).
        groups = sorted(
            r[0]
            for r in df.filter(F.col(group_col).isNotNull() & key.isNotNull())
            .select(group_col)
            .distinct()
            .collect()
        )
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
    # ONE exchange keyed by pid for the whole pair algebra (guide §2.4):
    # hash(pid) satisfies the (pid, …, h) merge's clustering, the
    # union-rank window's partitioning AND the final per-pair
    # aggregate — the pre-r14 shape exchanged three times over the
    # pairs·k rows (merge on (pid, type_a, type_b, h), window on pid,
    # aggregate riding the window). Rows here are ≤ pairs·2k, so the
    # lost map-side partial aggregation is noise.
    per_h = (
        tagged.repartition(F.col("pid"))
        .groupBy("pid", "type_a", "type_b", "h")
        .agg((F.count_distinct("g") == 2).alias("in_both"))
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
    return (
        sk.withColumn("est_union", _est_distinct(k))
        .select(
            "type_a", "type_b", "k_used", "shared", "est_union",
            F.expr("CAST(shared * est_union DIV k_used AS BIGINT)").alias("est_inter"),
        )
        .orderBy("type_a", "type_b")
    )
