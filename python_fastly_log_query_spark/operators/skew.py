"""Skew-defusing salted aggregation (SURVEY.md §4; north star: "explicit
repartitioning on a salted host-hash key to defuse hot-domain skew").

A Zipf-hot key (one host with 30% of 10^12 rows) turns a plain
``groupBy(host).agg`` into one straggler reducer.  The fix is two-phase:

  phase 1: group by (key, salt) — the hot key fans out over
           ``salt_buckets`` reducers; partial aggregates are tiny;
  phase 2: group by key — combines ``salt_buckets`` partials per key.

Catalyst already does map-side partial aggregation, which absorbs *row*
volume — but when a single key's partials still overwhelm one reducer
(huge distinct-value states, memory-bound aggs), the explicit salt is the
lever.  AQE's ``skewJoin`` handles the join case; this handles the agg
case.  The result is bit-identical to the unsalted aggregate (that
equality is the registered oracle check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salt_col(buckets: int) -> Column:
    """Stable per-row salt in [0, buckets): hash of the row's whole
    partition-id+offset via ``monotonically_increasing_id`` — no state, no
    RNG, uniform enough to split a hot key across reducers."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets)).cast("int")


def salted_counts(df: DataFrame, key: str | Column, buckets: int = 16,
                  out: str = "requests") -> DataFrame:
    """Two-phase salted count: identical result to
    ``df.groupBy(key).count()`` with the hot key spread over ``buckets``
    reducers in phase 1."""
    k = F.col(key) if isinstance(key, str) else key
    partial = (
        df.select(k.alias("_k"), salt_col(buckets).alias("_salt"))
        .groupBy("_k", "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        partial.groupBy("_k")
        .agg(F.sum("_c").alias(out))
        .withColumnRenamed("_k", key if isinstance(key, str) else "key")
    )


def salted_sum(df: DataFrame, key: str, value: str, buckets: int = 16,
               out: str = "total") -> DataFrame:
    """Two-phase salted sum — same shape as salted_counts for a measure."""
    partial = (
        df.select(F.col(key).alias("_k"), F.col(value).alias("_v"),
                  salt_col(buckets).alias("_salt"))
        .groupBy("_k", "_salt")
        .agg(F.sum("_v").alias("_s"))
    )
    return (
        partial.groupBy("_k")
        .agg(F.sum("_s").alias(out))
        .withColumnRenamed("_k", key)
    )
