"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH-bucketed variant
(random-hyperplane signs) as the scale path. The dot products run as
JVM-side higher-order functions (zip_with + aggregate) — no Python
boundary.

Cross-engine determinism: float x float products are exact in double;
accumulation goes through DECIMAL(38,18) so the fold order can't change
the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Quantization factor for cross-engine-exact accumulation: FLOOR(x * S)
# is bit-identical on identical doubles and the long sums are exact in
# any order (64-dim * |x|<1e3 stays far below 2^63).
SCALE = 1e12


def _dot_scaled(a: Column, b: Column) -> Column:
    """Order-independent dot product of two float arrays -> double,
    quantized at 1/SCALE."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(SCALE)).cast("long"),
    )
    return (
        F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v).cast("double")
        / F.lit(SCALE)
    )


def _norm(a: Column) -> Column:
    sq = F.transform(
        a, lambda x: F.floor(x.cast("double") * x.cast("double") * F.lit(SCALE)).cast("long")
    )
    return F.sqrt(
        F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v).cast("double")
        / F.lit(SCALE)
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    At 100 TB the corpus side stays partitioned and only queries
    broadcast — one pass, no shuffle of the corpus. Returns
    (query_id, neighbor_id, rank, cosine).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot_scaled(F.col("_qvec"), F.col("_cvec"))
            / (_norm(F.col("_qvec")) * _norm(F.col("_cvec"))),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    hyperplanes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection LSH bucket key per vector. `hyperplanes` must be
    fixed/deterministic (pass seeds-expanded planes from the caller).
    Bucketed ANN = equi-join on bucket + exact re-rank within bucket."""
    bits = []
    for plane in hyperplanes:
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(_dot_scaled(F.col(vec_col), p) >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    return embeddings.select(
        F.col(id_col), F.concat(*bits).alias("bucket")
    )
