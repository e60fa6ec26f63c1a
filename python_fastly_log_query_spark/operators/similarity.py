"""Similarity search over an embedding column (array<float>).

Two paths (driver brief):
- brute-force cosine top-k — the exactness baseline; one pass over the
  table, a broadcast single-row query side, TakeOrderedAndProject top-k
  (no full sort, no shuffle of the fact side);
- random-hyperplane LSH buckets — the scale path: bucket key is computed
  per row (projection only), search touches one bucket.  Hyperplanes are
  deterministic ±1 vectors derived from md5 so the DuckDB oracle can
  recompute identical buckets (no RNG state anywhere).

Embedding-cosine near-dup pairs reuse the LSH buckets to avoid the full
cross product (quadratic brute force exists as the small-scale oracle).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k vs one stored vector (broadcast query side)."""
    q = emb.filter(F.col(id_col) == query_vec_id).select(F.col("embedding").alias("qe"))
    c = cosine(F.col("embedding"), F.col("qe"))
    return (
        emb.crossJoin(F.broadcast(q))
        .select(id_col, c.alias("c"))
        .orderBy(F.desc("c"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("c", 4).alias("cosine"))
    )


# ---------------------------------------------------------------- LSH


def hyperplane(k: int, dim: int) -> list[int]:
    """Deterministic pseudo-random ±1 hyperplane: component i is +1 iff the
    first hex digit of md5('<k>:<i>') is >= 8."""
    return [
        1 if int(hashlib.md5(f"{k}:{i}".encode()).hexdigest()[0], 16) >= 8 else -1
        for i in range(dim)
    ]


def lsh_bucket(embedding: F.Column, planes: list[list[int]]) -> F.Column:
    """Bucket id: bit k = (embedding · plane_k >= 0), packed little-endian."""
    acc = None
    for k, plane in enumerate(planes):
        proj = dot(embedding, F.array(*[F.lit(float(w)) for w in plane]))
        bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = bit * F.lit(1 << k).cast("long")
        acc = term if acc is None else acc + term
    return acc


def lsh_buckets(emb: DataFrame, n_planes: int = 8, dim: int = 64) -> DataFrame:
    planes = [hyperplane(k, dim) for k in range(n_planes)]
    return emb.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))


def lsh_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: exact cosine ranking *within the query's LSH bucket*.

    At 10^12 scale the bucket column is a partition/cluster key; the scan
    prunes to one bucket (1/2^n_planes of the data) before ranking.
    """
    b = lsh_buckets(emb, n_planes, dim)
    q = b.filter(F.col(id_col) == query_vec_id).select(
        F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket")
    )
    c = cosine(F.col("embedding"), F.col("qe"))
    return (
        b.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(id_col, c.alias("c"))
        .orderBy(F.desc("c"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("c", 4).alias("cosine"))
    )


def neardup_pairs(
    emb: DataFrame, threshold: float = 0.9, n_planes: int = 4, dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup pairs above ``threshold``.

    Blocked on LSH buckets (few planes -> high recall) so the self-join
    shuffles once on the bucket key instead of crossing the full table.
    """
    b = lsh_buckets(emb, n_planes, dim).select(id_col, "embedding", "bucket")
    a2, b2 = b.alias("a"), b.alias("b")
    c = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a2.join(
            b2,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(c, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
