"""Data-lake writers: Hive-partitioned Parquet append + single-file dims.

Re-expresses the reference's sink layer (SURVEY.md §2.1 S4/S5):

- ``write_partitioned`` ≙ awswrangler partitioned append
  (`pipeline/ETL/load.py:34-58`): derive year/month/day from the event
  timestamp and ``partitionBy`` so downstream date filters get partition
  pruning for free.
- ``write_dim`` ≙ single-parquet dim write
  (`pipeline/ETL/partition_transactions.py:21-31`): dims are tiny, one
  file keeps them broadcast-friendly.

At scale: partition columns are low-cardinality (date parts), never
high-cardinality keys; files-per-partition is controlled by the upstream
shuffle, with AQE coalescing small outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COLS = ("year", "month", "day")


def with_date_parts(df: DataFrame, ts_col: str) -> DataFrame:
    """Derive y/m/d partition columns from a timestamp column.

    Reference: `pipeline/ETL/load.py:45-47`.
    """
    return (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
    )


def write_partitioned(df: DataFrame, path: str, ts_col: str = "at", mode: str = "append") -> None:
    """Append a fact table to the lake, Hive-partitioned by year/month/day.

    Reference: `pipeline/ETL/load.py:34-58` (awswrangler `partition_cols`).
    """
    with_date_parts(df, ts_col).write.partitionBy(*PARTITION_COLS).mode(mode).parquet(path)


def write_dim(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a small dimension table as a single parquet file.

    Reference: `pipeline/ETL/partition_transactions.py:21-31`.
    """
    df.coalesce(1).write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) managed table — the co-located join/agg
    layout for keys too hot to re-shuffle per query.

    At 100 TB, a fact⋈fact join on a shared key shuffles both sides on
    every query; bucketing both tables by that key with the same bucket
    count pays the shuffle ONCE at write time — every later equi-join or
    groupBy on the bucket key plans with zero Exchange (asserted in
    tests/test_scale_utils.py). ``sort_cols`` additionally pre-sorts
    within buckets so sort-merge joins skip their sort step. Bucketing
    requires the catalog (`saveAsTable`) — the bucket spec lives in table
    metadata, not in the parquet files.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_csv_stage(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV stage hand-off sink (SURVEY.md §2.1 S3).

    The reference materializes CSV between E/T/P/L stages
    (`extract.py:112-115`, `transform.py:49-52`); in this engine stages
    compose lazily, so CSV exists only as an interchange format for
    external consumers.
    """
    df.write.option("header", "true").mode(mode).csv(path)


def read_csv_stage(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV stage source with a declared schema — no inference pass over
    the data (the reference re-infers dtypes on every read_csv,
    `transform.py:5-7`; a second full scan at scale)."""
    return spark.read.option("header", "true").schema(schema).csv(path)


def write_interchange(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Columnar/line interchange sink for external consumers beyond
    parquet: `orc` (Spark-native columnar, vectorized reader, predicate
    pushdown like parquet) or `json` (JSON-lines for row-oriented
    consumers — no pushdown, text-size cost; keep it at the edge, not
    between stages). The lake's canonical format stays parquet."""
    if fmt not in ("orc", "json"):
        raise ValueError(f"unsupported interchange format: {fmt!r}")
    df.write.mode(mode).format(fmt).save(path)


def read_interchange(spark: SparkSession, path: str, fmt: str, schema) -> DataFrame:
    """Interchange source with a declared schema — like read_csv_stage,
    no inference scan (JSON inference would read the whole dataset
    twice at scale; ORC carries types but the declared schema pins the
    contract and enables pruned reads)."""
    if fmt not in ("orc", "json"):
        raise ValueError(f"unsupported interchange format: {fmt!r}")
    return spark.read.format(fmt).schema(schema).load(path)


def compact_partitions(spark: SparkSession, path: str) -> int:
    """Rewrite a Hive-partitioned dataset down to ONE file per partition
    — the small-files maintenance pass.

    Incremental appends (3-hourly in the reference) leave one file per
    run per partition; at 100 TB that is millions of tiny files and the
    scan becomes metadata-bound. Hash-repartitioning on the partition
    columns routes each Hive partition's rows to exactly one task (so
    each directory gets one file) while distinct partitions still spread
    across defaultParallelism tasks. Dynamic partition overwrite
    replaces only partitions present in the rewrite (a date-filtered
    frame would compact just that range), which bounds the blast radius
    to the partitions being compacted — but plain parquet directories
    are NOT snapshot-isolated: a reader listing files mid-commit can
    see a mix of old and new files within a partition, and a mid-job
    failure can leave some partitions replaced and others not. Run
    compaction in a maintenance window, or use a transactional table
    format (Delta/Iceberg) where true reader isolation is required.
    Returns the number of rows rewritten — counted via ``observe()`` on
    the write itself, so the maintenance pass reads the dataset ONCE (an
    earlier version ran a full count() job before the rewrite, doubling
    the scan cost of the operation most likely to run lake-wide).
    """
    from pyspark.sql import Observation

    df = spark.read.parquet(path)
    obs = Observation()
    n_tasks = max(spark.sparkContext.defaultParallelism, 1)
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
            .repartition(n_tasks, *PARTITION_COLS)
            .write.partitionBy(*PARTITION_COLS)
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return int(obs.get["n_rows"])


def zorder_key(cols: list, mins: list[float], maxs: list[float], bits: int = 12):
    """Morton (Z-order) interleave of ``cols`` normalized to ``bits``
    bits each, as a pure JVM expression (shift/mask/or — codegen'd,
    no Python). ``mins``/``maxs`` are the per-column bounds used for
    linear scaling; rows outside clamp to the edge cells.
    """
    scaled = []
    top = (1 << bits) - 1
    for c, lo, hi in zip(cols, mins, maxs):
        span = (hi - lo) or 1.0
        s = F.round((c.cast("double") - F.lit(float(lo))) / F.lit(float(span)) * top).cast(
            "bigint"
        )
        # NULL values map to cell 0 explicitly — without the coalesce,
        # least/greatest SKIP nulls and a NULL would silently land in the
        # top cell, scattering null rows across the best-clustered files
        scaled.append(
            F.greatest(F.lit(0), F.least(F.lit(top), F.coalesce(s, F.lit(0).cast("bigint"))))
        )
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * len(scaled) + i)
            )
    return z


def write_zordered(
    df: DataFrame, path: str, zcols: list[str], n_files: int = 16, bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write — multi-dimensional data skipping.

    Hive partitioning (``write_partitioned``) prunes on ONE dimension;
    queries that filter on two independent columns (e.g. ``user_id`` AND
    ``value``) still scan every file under the date. Sorting files by the
    Morton interleave of both columns makes each file cover a compact
    hyper-rectangle in (col1, col2) space, so parquet row-group/file
    min-max stats prune on EITHER predicate — the Delta/Iceberg
    ``OPTIMIZE ZORDER BY`` layout, built from two primitives Spark
    already has: a codegen'd bit-interleave expression and
    ``repartitionByRange`` on the derived key.

    Cost at 100 TB: one 1-row min/max aggregate (driver sees scalars
    only) + one range shuffle — the same cost as any global sort, paid
    once at write; every later 2-D selective scan skips proportionally.
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(zcols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(zcols)],
    ).collect()[0]
    mins = [stats[f"lo_{i}"] for i in range(len(zcols))]
    maxs = [stats[f"hi_{i}"] for i in range(len(zcols))]
    if any(v is None for v in mins + maxs):
        # empty input or an all-NULL z-column: no cluster structure to
        # exploit — fall back to a plain (un-clustered) write instead of
        # crashing on float(None) inside zorder_key
        df.write.mode(mode).parquet(path)
        return
    z = zorder_key([F.col(c) for c in zcols], mins, maxs, bits=bits)
    (
        df.withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def read_lake(spark: SparkSession, path: str, merge_schema: bool = False) -> DataFrame:
    """Full lake scan; partition columns recovered automatically.

    Reference: `pipeline/dashboard.py:41-44`. Date filters applied on the
    result use automatic partition pruning — the reference's manual
    prefix-listing (`report-lambda/generate_report.py:24-67`) disappears.

    ``merge_schema=True`` reconciles files written under EVOLVED schemas
    (a column added by a later ETL release): the union schema is read,
    and rows from pre-evolution files surface the new columns as NULL.
    Off by default — schema merging footer-reads every file, a real cost
    at millions of files; flip it only on lakes that actually evolved.
    """
    return spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(path)


def write_training_shards(
    df: DataFrame, path: str, id_col: str, n_shards: int, salt: str = "shard-v1",
    mode: str = "overwrite",
) -> None:
    """Materialize the deterministic shard layout (`operators/text.py
    shard_plan`): full rows written under ``shard=<k>/`` directories,
    each file internally ordered by the within-shard position, so a
    trainer streams shard k in its reproducible pseudo-random order by
    reading the shard's files in name order.

    Cost at 100 TB: ONE hash exchange on shard — the row_number window
    already shuffles by shard, leaving every shard's rows co-located and
    sorted by (shard, sort_key, id) = (shard, pos), so the partitioned
    write reuses that layout directly (an earlier version paid a SECOND
    range exchange of the full rows on top; plan-linted away in
    tests/test_etl.py). Reruns reproduce the same (shard, pos)
    assignment and stream order for every row (both hashes derive from
    the id; no RNG state); determinism is row-level, not byte-level."""
    (
        _sharded_frame(df, id_col, n_shards, salt)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def _sharded_frame(df: DataFrame, id_col: str, n_shards: int, salt: str) -> DataFrame:
    """The frame `write_training_shards` materializes, exposed so the
    single-exchange contract can be plan-linted without a write."""
    from pyspark.sql import Window

    from serverless_etl_reporting_pipeline_spark.operators.text import shard_exprs

    shard, sort_key = shard_exprs(id_col, n_shards, salt)
    annotated = df.withColumn("shard", shard).withColumn(
        "pos",
        F.row_number()
        .over(Window.partitionBy("shard").orderBy(sort_key, F.col(id_col)))
        .cast("bigint"),
    )
    return annotated.sortWithinPartitions("shard", "pos")
