"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k baseline + LSH-bucketed scale path.

Brute force is the correctness baseline (oracle-checkable); the
random-hyperplane LSH variant is the 100 TB path: candidates come from
an equi-join on bucket signatures instead of a full cross join."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.  The (small) query side is
    broadcast: the corpus is scanned once, no shuffle until the per-query
    top-k aggregation."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            cosine(
                F.col("q_vec").cast("array<double>"),
                F.col("n_vec").cast("array<double>"),
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("sim", 4).alias("sim"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one bit per plane (sign of dot)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(x) for x in p]))
        sig = sig.bitwiseOR(
            F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 16,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any of
    ``n_tables`` hyperplane tables (equi-join on (table, bucket)), then
    exact cosine re-rank.  At corpus scale this replaces the cross join
    with a bucket-partitioned shuffle join."""
    tables = [
        _hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)
    ]

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        vec = F.col(vec_col).cast("array<double>")
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.posexplode(
                F.array(*[lsh_bucket(vec, planes) for planes in tables])
            ).alias("table", "bucket"),
        )

    # candidate ids first, vectors re-attached after the dedup: cosine
    # runs once per unique (q, n) pair instead of per shared table
    pairs = (
        bucketed(embeddings, "n")
        .join(F.broadcast(bucketed(queries, "q")), ["table", "bucket"])
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id")
        .distinct()
    )
    vec = F.col(vec_col).cast("array<double>")
    cand = pairs.join(
        F.broadcast(
            queries.select(F.col(id_col).alias("q_id"), vec.alias("q_vec"))
        ),
        "q_id",
    ).join(
        embeddings.select(F.col(id_col).alias("n_id"), vec.alias("n_vec")),
        "n_id",
    )
    scored = cand.select(
        "q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("sim", 4).alias("sim"), "rank")
    )
