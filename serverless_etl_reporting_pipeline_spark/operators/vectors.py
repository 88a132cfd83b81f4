"""Vector similarity operators over `array<float>` embedding columns
(SURVEY.md §2.11 north-star set).

Cosine is computed JVM-side with array higher-order functions
(`zip_with` + `aggregate` left fold) in DOUBLE — no Python UDF, stays in
codegen, and the float→double promotion is exact so the DuckDB oracle
can reproduce results bit-for-bit (DuckDB's built-in
`list_cosine_similarity` accumulates in float32 — ~1e-8 off — so oracles
use the explicit double formulation instead).

Scale paths:
- brute-force top-k: one map + TakeOrderedAndProject — linear scan,
  embarrassingly parallel, the right baseline even at 100 TB when k is
  small and queries are few;
- `ann_topk_lsh`: BucketedRandomProjectionLSH bucketing for repeated /
  batched queries — prunes the scan to matching buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUANT = 1_000_000.0


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def quantized(col: Column | str) -> Column:
    """Components rounded to 1e-6 integers (carried as DOUBLE).

    With dim ≤ ~4000 and |x| ≤ ~2, every product (≤1e12-ish) and every
    partial sum of a dot product stays below 2^53, so float64 arithmetic
    on quantized components is EXACT integer arithmetic — associative,
    order-independent, and therefore bit-identical between a BLAS matmul,
    a JVM fold, and DuckDB's list_sum. This is what makes an exact
    distributed top-k-pairs oracle-checkable (see top_similar_pairs).
    """
    return F.transform(as_double(col), lambda x: F.round(x * QUANT))


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product (matches DuckDB list_sum order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def knn_bruteforce(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector.

    Plans as scan → project(cosine) → TakeOrderedAndProject: no shuffle
    of the vectors, only k rows cross the network per partition.
    """
    q = F.lit(query_vec)
    cos = cosine(as_double(vec_col), q)
    return (
        df.select(id_col, (F.round(cos * 1000000) / 1000000.0).alias("cos"), cos.alias("_raw"))
        .orderBy(F.desc("_raw"), F.asc(id_col))
        .limit(k)
        .drop("_raw")
    )


def quantize_np(a):
    """Exact numpy equivalent of `quantized` (round-half-away of x*1e6).

    For |x*1e6| < 2^51 the f64 sum `abs(v) + 0.5` is exact (0.5 is a
    multiple of ulp), so `floor(abs(v)+0.5)` is bit-identical to Spark's
    ROUND (BigDecimal HALF_UP over the exact decimal of the double) and
    DuckDB's round. Quantizing inside an Arrow kernel instead of with
    the `transform(round(...))` higher-order function matters: HOFs are
    interpreted per element (~10 µs/elem with BigDecimal churn) — the
    JVM-side quantize of a 2000×64 matrix alone cost more than the
    whole BLAS similarity kernel.
    """
    import numpy as np

    v = np.asarray(a, dtype=np.float64) * QUANT
    return np.copysign(np.floor(np.abs(v) + 0.5), v)


def _stack_quantized(pdf, col: str = "_qv"):
    """Shared Arrow-kernel preamble: pandas column of float arrays →
    exact-quantized f64 matrix. Every vector kernel funnels through this
    so quantization/batch handling has exactly one implementation."""
    import numpy as np

    return quantize_np(np.stack([np.asarray(v, dtype=np.float64) for v in pdf[col]]))


def _collect_quantized_build(df: DataFrame, id_col: str, vec_col: str):
    """Collect + quantize a broadcast build side: (ids, matrix, norms).
    Raw floats cross the wire; quantization happens driver-side in numpy
    (same `quantize_np` the kernels use)."""
    import numpy as np

    rows = df.select(
        F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_qv")
    ).collect()
    ids = np.array([r["_id"] for r in rows], dtype=np.int64)
    B = quantize_np(np.stack([np.asarray(r["_qv"], dtype=np.float64) for r in rows]))
    return ids, B, np.sqrt((B * B).sum(axis=1))


def quantized_dot(a: Column, b: Column) -> Column:
    """Left-fold dot over quantized (integer-valued double) arrays —
    exact, so identical to DuckDB's list_sum in any order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def quantized_cosine(a: Column, b: Column) -> Column:
    return quantized_dot(a, b) / (
        F.sqrt(quantized_dot(a, a)) * F.sqrt(quantized_dot(b, b))
    )


def ivf_topk(
    df: DataFrame,
    query_vec_quantized: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize by `cell_col` cell
    centroids, probe the `nprobe` cells whose centroid is most cosine-
    similar to the query, exact cosine only within probed cells.

    100 TB shape: the inverted-file scan prunes to nprobe/n_cells of the
    data (partition the table by cell for file-level pruning); the
    centroid ranking is a tiny aggregate + top-n — no driver-side k-means
    here because the fixtures carry a cell id, but any coarse quantizer
    slots in. Exact integer (quantized) arithmetic end-to-end keeps the
    result oracle-checkable — rare for an ANN operator.

    `query_vec_quantized` must already be 1e-6-quantized (quantize with
    `quantized()`/`quantize_np` so the rounding mode matches HALF_UP —
    Python's round() is half-to-even and would drift at .5 boundaries).

    Physical shape (fully LAZY — building the plan runs no jobs):
    (1) centroids via posexplode + per-scalar `round(x*1e6)` (a plain
    codegen expression, not an interpreted array HOF) and a two-level
    hash aggregate — exact integer sums, any combine order agrees with
    the oracle; (2) probe choice as a tiny top-nprobe over n_cells rows;
    (3) a broadcast left-semi join prunes to the probed cells
    (partition-prunable when the table is laid out by cell) and one
    Arrow cosine kernel ranks the candidates.
    """
    import numpy as np

    qq_list = [float(x) for x in query_vec_quantized]
    qq = np.asarray(qq_list, dtype=np.float64)
    qn = float(np.sqrt(qq @ qq))

    ex = df.select(cell_col, F.posexplode(as_double(vec_col)).alias("dim", "x")).select(
        cell_col, "dim", F.round(F.col("x") * QUANT).alias("q")
    )
    centroids = (
        ex.groupBy(cell_col, "dim")
        .agg(F.round(F.avg("q")).alias("c"))
        .groupBy(cell_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
    )
    # n_cells rows: the interpreted HOF cosine is fine at this cardinality
    probed = (
        centroids.select(cell_col, quantized_cosine(F.col("cv"), F.lit(qq_list)).alias("ccos"))
        .orderBy(F.desc("ccos"), cell_col)
        .limit(nprobe)
        .select(cell_col)
    )

    def cos_kernel(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            A = _stack_quantized(pdf)
            cos = (A @ qq) / (_np.sqrt((A * A).sum(axis=1)) * qn)
            yield _pd.DataFrame({id_col: pdf["_id"].to_numpy(dtype=_np.int64), "_raw": cos})

    out = (
        df.join(F.broadcast(probed), cell_col, "left_semi")
        .select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_qv"))
        .mapInPandas(
            cos_kernel,
            schema=T.StructType(
                [T.StructField(id_col, T.LongType()), T.StructField("_raw", T.DoubleType())]
            ),
        )
    )
    return (
        out.orderBy(F.desc("_raw"), F.asc(id_col))
        .limit(k)
        .select(id_col, (F.round(F.col("_raw") * QUANT) / QUANT).alias("cos"))
    )


_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("raw_cos", T.DoubleType()),
    ]
)


def top_similar_pairs(
    df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact global top-k most-similar pairs by quantized-integer cosine.

    Physical strategy: broadcast the (quantized) full matrix as the
    build side — the same role as a broadcast-hash-join build — and
    stream the probe side through an Arrow-batched numpy kernel: each
    block computes block @ Bᵀ (float64 BLAS over exact integers ⇒ exact,
    see `quantized`), masks id_a < id_b, and emits only its local top-k
    under the exact final comparator (-cos, id_a, id_b); the driver-side
    plan takes the global top-k of ≤ k·numPartitions rows. An earlier
    all-pairs join with per-pair array folds ran ~25× slower at sf0.1
    (interpreted higher-order functions, 3× redundant norm work).

    Scale limit: the build side is n·d·8 bytes of executor memory (like
    any broadcast build). Beyond that, grid-block both sides into an
    m×m block join, or switch to the LSH candidate path (ann_topk_lsh) —
    exact all-pairs top-k at 100 TB is O(n²) work no matter the engine.
    """
    spark = df.sparkSession
    q = df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_qv"))
    # build side only — the probe side never collects
    bc = spark.sparkContext.broadcast(_collect_quantized_build(df, id_col, vec_col))
    kk = int(k)

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        ids_b, Bm, bn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = _stack_quantized(pdf)
            aid = pdf["_id"].to_numpy(dtype=_np.int64)
            an = _np.sqrt((A * A).sum(axis=1))
            S = (A @ Bm.T) / (an[:, None] * bn[None, :])
            ai, bi = _np.nonzero(aid[:, None] < ids_b[None, :])
            cos = S[ai, bi]
            order = _np.lexsort((ids_b[bi], aid[ai], -cos))[:kk]
            yield _pd.DataFrame(
                {"id_a": aid[ai][order], "id_b": ids_b[bi][order], "raw_cos": cos[order]}
            )

    top = q.mapInPandas(kernel, schema=_PAIRS_SCHEMA)
    return top.orderBy(F.desc("raw_cos"), "id_a", "id_b").limit(k)


def neardup_map(
    df: DataFrame,
    threshold: float = 0.44,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup: (dup_id, kept_id, cos) survivor map.

    Rule (single-pass, deterministic, SQL-expressible): a row is a
    duplicate iff ANY smaller-id row has cosine >= threshold; its
    survivor is the SMALLEST such id. This is the one-sweep variant of
    near-dup dedup — the transitive (connected-components) variant lives
    in operators/minhash.py; both keep min-id representatives.

    Physical strategy mirrors `top_similar_pairs`: broadcast the
    quantized matrix, stream probe blocks through a BLAS kernel, but
    emit only pairs above threshold — output is |near-dup pairs|, not
    O(n²). The per-row min reduction is a map-side-combinable groupBy.
    At 100 TB, swap the broadcast build for RP-bucket blocking
    (`random_hyperplanes` codes as join key) — same kernel per bucket.
    """
    spark = df.sparkSession
    q = df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_qv"))
    bc = spark.sparkContext.broadcast(_collect_quantized_build(df, id_col, vec_col))
    tau = float(threshold)

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        ids_b, Bm, bn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = _stack_quantized(pdf)
            aid = pdf["_id"].to_numpy(dtype=_np.int64)
            an = _np.sqrt((A * A).sum(axis=1))
            S = (A @ Bm.T) / (an[:, None] * bn[None, :])
            ai, bi = _np.nonzero((aid[:, None] < ids_b[None, :]) & (S >= tau))
            yield _pd.DataFrame(
                {"id_a": aid[ai], "id_b": ids_b[bi], "raw_cos": S[ai, bi]}
            )

    pairs = q.mapInPandas(kernel, schema=_PAIRS_SCHEMA)
    kept = pairs.groupBy("id_b").agg(F.min(F.struct("id_a", "raw_cos")).alias("m"))
    return kept.select(
        F.col("id_b").alias("dup_id"),
        F.col("m.id_a").alias("kept_id"),
        (F.round(F.col("m.raw_cos") * QUANT) / QUANT).alias("cos"),
    ).orderBy("dup_id")


def random_hyperplanes(n_bits: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Seeded quantized random hyperplanes (integer-valued doubles).

    Generated once at plan-build time and inlined as literals into both
    the Spark plan and the oracle SQL, so sign-bit computation is exact
    integer arithmetic in both engines — which is what lets a
    random-projection LSH be oracle-checked at all.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_bits, dim))
    return [[float(int(v)) for v in np.rint(row * QUANT)] for row in h]


def ann_topk_rp(
    df: DataFrame,
    query_vec_quantized: list[float],
    k: int = 10,
    n_bits: int = 8,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via sign-random-projection buckets + multiprobe.

    Index shape at 100 TB: each vector carries an `n_bits` bucket code
    (map-only to compute, storable as a partition/cluster key); a query
    scans only buckets within `probe_hamming` of its own code —
    (Σ_{i≤r} C(n_bits,i)) / 2^n_bits of the data (~14% for 8 bits, r=2)
    — then ranks candidates by exact quantized cosine. Deterministic:
    seeded hyperplanes, exact integer dots (BLAS f64 over integers, see
    `quantized`), no pyspark.ml RNG. Codes + cosine run in one Arrow
    kernel (map-only, no shuffle); only the ≤k survivors per partition
    feed TakeOrderedAndProject.
    """
    import numpy as np

    spark = df.sparkSession
    P = np.array(random_hyperplanes(n_bits, len(query_vec_quantized), seed), dtype=np.float64)
    qq = np.asarray(query_vec_quantized, dtype=np.float64)
    q_bits = (P @ qq) >= 0  # exact: integer products < 2^53
    qn = float(np.sqrt(qq @ qq))
    bc = spark.sparkContext.broadcast((P, qq, q_bits, qn, int(probe_hamming)))

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        Pm, q, qb, qnorm, r = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = _stack_quantized(pdf)
            codes = (A @ Pm.T) >= 0
            mask = (codes != qb[None, :]).sum(axis=1) <= r
            if not mask.any():
                continue
            Am = A[mask]
            cos = (Am @ q) / (_np.sqrt((Am * Am).sum(axis=1)) * qnorm)
            yield _pd.DataFrame(
                {id_col: pdf["_id"].to_numpy(dtype=_np.int64)[mask], "_raw": cos}
            )

    out = df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_qv")).mapInPandas(
        kernel,
        schema=T.StructType(
            [T.StructField(id_col, T.LongType()), T.StructField("_raw", T.DoubleType())]
        ),
    )
    return (
        out.orderBy(F.desc("_raw"), F.asc(id_col))
        .limit(k)
        .select(id_col, (F.round(F.col("_raw") * QUANT) / QUANT).alias("cos"))
    )


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate top-k via random-projection LSH buckets.

    At 100 TB the model's hash tables prune the candidate set to the
    query's buckets; deterministic with the fixed seed. Distance is
    euclidean (the LSH family's metric); for cosine semantics normalize
    vectors upstream.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feats = df.select(id_col, array_to_vector(as_double(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feats)
    return model.approxNearestNeighbors(feats, Vectors.dense(query_vec), k, distCol="dist").select(
        id_col, "dist"
    )
