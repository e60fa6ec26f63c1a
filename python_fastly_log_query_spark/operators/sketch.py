"""Count-min sketch: mergeable heavy-hitter counting in one shuffle.

The 10^12-row problem: ``groupBy(key).count()`` over a high-cardinality
key shuffles one row per distinct key.  When only the heavy keys matter,
a count-min sketch (Cormode & Muthukrishnan 2005) bounds the shuffle at
``depth x width`` rows PER MAP TASK regardless of input size: each task's
map-side partial aggregation IS its local sketch, and the reduce-side
merge (element-wise sum) is exactly the CMS merge operator.  Estimates
never undercount; they overcount by at most ``e/width * N`` with
probability ``1 - e^-depth`` per key.

Spark-first shape (no UDFs anywhere):

- ``cms_buckets`` derives the per-depth bucket index from
  ``md5(depth || ':' || key)`` — deterministic, identically replayable in
  DuckDB SQL (``CAST('0x' || substr(md5(..),1,15) AS BIGINT) % width``),
  so sketch contents and estimates carry FULL value oracles.
- ``cms_sketch`` is ``posexplode(buckets) -> groupBy(depth, bucket)``:
  one shuffle of at most depth*width rows per partition after partial
  aggregation (HashAggregate partial_count in the plan).
- ``cms_estimate`` joins candidate keys to the sketch with
  ``broadcast()`` — the sketch is at most depth*width rows by
  construction, the canonical small side — and takes ``min`` over depths.

Reference parity anchor: the reference's top-N rankings
(`/root/reference/src/analyze/analytics.py` Counter.most_common sites)
are exact; this is the sub-linear-state alternative for keys too numerous
to hold exactly, complementing the HLL path
(``approx_distinct_ips_per_path``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key: F.Column, depth: int, width: int) -> F.Column:
    """Row ``depth``'s bucket for ``key``: 60 md5 bits mod width.

    Matches DuckDB ``CAST('0x' || substr(md5(d || ':' || key), 1, 15)
    AS BIGINT) % width`` bit-for-bit (15 hex digits = 60 bits, positive,
    so both engines' ``%`` agree).
    """
    h = F.md5(F.concat(F.lit(f"{depth}:"), key))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % width).cast(
        "long"
    )


def cms_buckets(key: F.Column, depth: int, width: int) -> F.Column:
    """Array of per-depth bucket indices for ``key`` (length ``depth``)."""
    return F.array(*[_bucket(key, d, width) for d in range(depth)])


def cms_sketch(
    df: DataFrame, key: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the ``(depth, bucket, cnt)`` sketch table in ONE shuffle.

    Null keys are excluded (they have no bucket).  Partial aggregation
    caps each map task's shuffle write at ``depth * width`` rows, so the
    reduce side sees O(tasks * depth * width) rows — independent of N.
    """
    ex = df.filter(F.col(key).isNotNull()).select(
        F.posexplode(cms_buckets(F.col(key), depth, width)).alias(
            "depth", "bucket"
        )
    )
    return ex.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query ``keys[key]`` against ``sketch``: min count over depths.

    The sketch side is broadcast — it is at most ``depth * width`` rows by
    construction, so the estimate join never shuffles the key table.
    Returns the input ``keys`` columns plus ``cms_est``; the CMS guarantee
    is ``cms_est >= true count`` always (deterministically — every
    occurrence of the key landed in each probed cell).
    """
    kb = keys.select(
        "*",
        F.posexplode(cms_buckets(F.col(key), depth, width)).alias(
            "depth", "bucket"
        ),
    )
    joined = kb.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    others = [c for c in keys.columns]
    return joined.groupBy(*others).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )
