"""Similarity search over the embeddings table (array<float> column).

Two paths:

- ``cosine_topk`` — brute-force exact cosine top-k (the baseline; one
  broadcast of the query vector, a map-side score, a global top-k).
- ``lsh_ann_topk`` — random-hyperplane LSH bucketing (the scale path:
  the scan is pruned to one bucket before any scoring; at 100 TB the
  bucket id is a partition column so Spark prunes at the source).

Determinism contract: embeddings are quantized to integers
(``floor(v * 1000)``) before any arithmetic, so dot products and norms
are exact integer math and the DuckDB oracles reproduce them bit-for-bit
(float summation order never matters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 8
QUANT = 1000


def quantized(col: Column) -> Column:
    """array<float> → array<bigint> via floor(v*1000) (exact in any
    engine; avoids cross-engine float-sum nondeterminism)."""
    return F.transform(
        col, lambda v: F.floor(v.cast("double") * QUANT).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors, rounded to 6 decimals."""
    dot = int_dot(a, b).cast("double")
    na = F.sqrt(int_dot(a, a).cast("double"))
    nb = F.sqrt(int_dot(b, b).cast("double"))
    return F.round(dot / (na * nb), 6)


def cosine_topk(
    emb: DataFrame, query_id: int = 0, k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine similarity to the ``query_id`` vector.

    The single-row query side is broadcast (no shuffle of the big side);
    scoring is map-side; only the global top-k ordering shuffles k rows
    per partition (Spark's TakeOrderedAndProject).
    """
    q = emb.where(F.col("vec_id") == query_id).select(
        quantized(F.col(vec_col)).alias("qvec")
    )
    scored = (
        emb.where(F.col("vec_id") != query_id)
        .join(F.broadcast(q))
        .select(
            F.col("vec_id"),
            cosine_sim(quantized(F.col(vec_col)), F.col("qvec")).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def plane_weight(i: Column, j: int) -> Column:
    """Deterministic pseudo-random hyperplane weights in [-3, 3]:
    w(i, j) = ((i*31 + j*17) % 7) - 3 (shared with SQL oracles)."""
    return F.pmod(i * 31 + F.lit(j * 17), F.lit(7)) - 3


def lsh_bucket(col: Column) -> Column:
    """Sign-of-projection LSH bucket id over N_PLANES hyperplanes,
    computed on the quantized vector (exact integer dot)."""
    qv = quantized(col)
    idx = F.sequence(F.lit(0), F.size(qv) - 1)
    bucket = F.lit(0)
    for j in range(N_PLANES):
        plane = F.transform(idx, lambda i: plane_weight(i, j))
        proj = int_dot(qv, plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked.

    Vectors are bucketed by random-hyperplane LSH first so the pairwise
    cosine runs only within buckets (near-identical vectors land in the
    same bucket with high probability); pairs with cosine ≥ threshold
    survive.  The bucket join shuffles each vector once — never the
    full cross product.
    """
    with_bucket = emb.select(
        F.col("vec_id"),
        quantized(F.col(vec_col)).alias("qv"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    a = with_bucket.alias("a")
    b = with_bucket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine_sim(F.col("a.qv"), F.col("b.qv")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


N_CENTROIDS = 8


def ivf_ann_topk(
    emb: DataFrame, query_id: int = 0, k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid
    (deterministic "codebook": the first N_CENTROIDS vectors), then
    search only the query's cell with exact cosine.

    Relational argmin (cross join the tiny broadcast codebook → squared
    integer L2 → row_number) keeps everything exact and oracle-able; at
    scale the cell id is a partition column, so probing = partition
    pruning.  A trained codebook (k-means) drops in without changing the
    dataflow.
    """
    from pyspark.sql.window import Window

    cents = emb.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), quantized(F.col(vec_col)).alias("cvec")
    )
    qe = emb.select(F.col("vec_id"), quantized(F.col(vec_col)).alias("qv"))
    sqdist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    assigned = (
        qe.join(F.broadcast(cents))
        .select("vec_id", "qv", "cid", sqdist.alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.asc("d2"), F.asc("cid")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("vec_id", "qv", F.col("cid").alias("cell"))
    )
    q = assigned.where(F.col("vec_id") == query_id).select(
        F.col("qv").alias("qvec"), F.col("cell").alias("qcell")
    )
    scored = (
        assigned.join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .where(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            F.col("cell"),
            cosine_sim(F.col("qv"), F.col("qvec")).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def lsh_ann_topk(
    emb: DataFrame, query_id: int = 0, k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """ANN top-k: restrict to the query's LSH bucket, then exact cosine.

    At scale the bucket id is precomputed as a partition column so this
    becomes a partition-pruned scan + small top-k; here it's computed
    inline from the same deterministic planes."""
    with_bucket = emb.select(
        F.col("vec_id"),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    q = with_bucket.where(F.col("vec_id") == query_id).select(
        quantized(F.col(vec_col)).alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        with_bucket.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != query_id)
        .select(
            F.col("vec_id"),
            F.col("bucket"),
            cosine_sim(quantized(F.col(vec_col)), F.col("qvec")).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
