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


def with_norm(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Materialize ||e|| once per ROW.  Pair-join cosines must divide by
    precomputed norms — computing sqrt(dot(a,a)) inside the pair projection
    re-evaluates an interpreted 64-element aggregate PER PAIR (3x the
    per-pair work; measured 96s -> 4.9s on the banded near-dup bench at
    sf0.1 together with spread())."""
    from ..plans.partitioning import spread

    return spread(emb).withColumn("_norm", F.sqrt(dot(F.col(col), F.col(col))))


def brute_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k vs one stored vector (broadcast query side)."""
    base = with_norm(emb)
    q = base.filter(F.col(id_col) == query_vec_id).select(
        F.col("embedding").alias("qe"), F.col("_norm").alias("_qn")
    )
    c = dot(F.col("embedding"), F.col("qe")) / (F.col("_norm") * F.col("_qn"))
    return (
        base.crossJoin(F.broadcast(q))
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
    b = lsh_buckets(with_norm(emb), n_planes, dim)
    q = b.filter(F.col(id_col) == query_vec_id).select(
        F.col("embedding").alias("qe"),
        F.col("_norm").alias("_qn"),
        F.col("bucket").alias("qbucket"),
    )
    c = dot(F.col("embedding"), F.col("qe")) / (F.col("_norm") * F.col("_qn"))
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
    """Embedding-cosine near-dup pairs above ``threshold`` — the
    SMALL-SCALE oracle twin: with only ``n_planes`` planes the bucket
    count is fixed at 2^n_planes, so the within-bucket self-join is
    still ~N^2/2^n_planes pairs.  Fine at oracle scale; at 10^12 rows
    use :func:`banded_neardup_pairs`, whose bucket count grows with the
    band width instead of staying constant.
    """
    from .dedup import selfjoin_ready

    b = selfjoin_ready(
        lsh_buckets(with_norm(emb), n_planes, dim).select(
            id_col, "embedding", "_norm", "bucket"
        )
    )
    a2, b2 = b.alias("a"), b.alias("b")
    c = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a._norm") * F.col("b._norm")
    )
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


def banded_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.8,
    planes_per_band: int = 6,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """Banded random-hyperplane LSH near-dup pairs — the 10^12-scale path.

    Band b uses planes [b*r, (b+1)*r); a pair is a candidate iff ALL r
    plane signs agree in at least one band (the MinHash-banding shape,
    dedup.py lsh_candidate_pairs).  Each row explodes to one
    ``(band, key)`` row per band, the self-join is a pure equi-join on
    both columns (hash join — never a nested loop), and exact cosine is
    computed on candidates only.

    Recall/occupancy math: a plane agrees with prob p = 1 - theta/pi;
    per-band match p^r, overall 1 - (1-p^r)^b — raise ``bands`` for
    recall, ``planes_per_band`` for precision.  Buckets per band = 2^r,
    chosen by r ~ log2(N / target_bucket_size), so candidate volume per
    band stays ~N * bucket_size rather than N^2 / 2^n_planes as in the
    fixed-bucket :func:`neardup_pairs`.
    """
    planes = [hyperplane(k, dim) for k in range(planes_per_band * bands)]
    band_keys = F.array(
        *[
            lsh_bucket(
                F.col("embedding"),
                planes[b * planes_per_band : (b + 1) * planes_per_band],
            )
            for b in range(bands)
        ]
    )
    from .dedup import selfjoin_ready

    keyed = selfjoin_ready(
        with_norm(emb).select(
            F.col(id_col),
            F.col("embedding"),
            F.col("_norm"),
            F.posexplode(band_keys).alias("band", "key"),
        )
    )
    a, b2 = keyed.alias("a"), keyed.alias("b")
    c = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a._norm") * F.col("b._norm")
    )
    # dedup via groupBy (not filter->distinct): the aggregate is a
    # predicate-pushdown BARRIER, so the cosine evaluates exactly once per
    # candidate — a filter above the pair projection gets pushed into the
    # join condition and re-evaluates the interpreted 64-element dot per
    # row (measured 11.7s vs 2.5s on 2M candidates at sf0.1)
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(c, 4).alias("cosine"),
        )
        .groupBy("vec_a", "vec_b")
        .agg(F.first("cosine").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------- IVF


def ivf_assign(
    emb: DataFrame, n_cells: int = 8, id_col: str = "vec_id"
) -> DataFrame:
    """IVF coarse quantizer with a deterministic codebook: cell j's
    centroid is the stored embedding of ``vec_id j`` (no k-means
    iterations, no RNG — the DuckDB oracle recomputes assignments
    exactly; swap in trained centroids at deploy time).

    Assignment = argmax-cosine centroid, computed as a broadcast
    cross-join against the ``n_cells``-row codebook + a per-vector
    ranking window.  Returns ``(id, embedding, _norm, cell)``.  At 10^12
    rows ``cell`` is the table's partition/cluster key.
    """
    from pyspark.sql.window import Window

    base = with_norm(emb)
    cents = base.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"),
        F.col("embedding").alias("_ce"),
        F.col("_norm").alias("_cn"),
    )
    cs = dot(F.col("embedding"), F.col("_ce")) / (F.col("_norm") * F.col("_cn"))
    scored = base.join(F.broadcast(cents)).select(
        id_col, "embedding", "_norm", "cell", cs.alias("_cs")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cs"), F.asc("cell"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_cs")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN top-k: rank exact cosine within the query's ``nprobe``
    closest cells only.  With ``nprobe == n_cells`` this degrades to the
    exact brute-force ranking (tested), so recall is tunable at query
    time; the scan prunes to nprobe/n_cells of the table when ``cell``
    partitions the storage.
    """
    assign = ivf_assign(emb, n_cells, id_col)
    q = assign.filter(F.col(id_col) == query_vec_id).select(
        F.col("embedding").alias("qe"), F.col("_norm").alias("_qn")
    )
    cents = assign.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"),
        F.col("embedding").alias("_ce"),
        F.col("_norm").alias("_cn"),
    )
    qcs = dot(F.col("qe"), F.col("_ce")) / (F.col("_qn") * F.col("_cn"))
    probe_cells = (
        cents.join(F.broadcast(q))
        .select("cell", qcs.alias("_qcs"))
        .orderBy(F.desc("_qcs"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    c = dot(F.col("embedding"), F.col("qe")) / (F.col("_norm") * F.col("_qn"))
    return (
        assign.join(F.broadcast(probe_cells), "cell")
        .join(F.broadcast(q))
        .select(id_col, c.alias("c"))
        .orderBy(F.desc("c"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("c", 4).alias("cosine"))
    )
