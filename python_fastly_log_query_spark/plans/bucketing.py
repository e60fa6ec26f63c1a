"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §4;
driver brief "repartition() / bucketing for co-located joins").

A fact-to-fact join too big to broadcast normally shuffles BOTH sides on
the key every time it runs.  Writing both tables bucketed (and sorted) by
the join key moves that shuffle to WRITE time, once: every later join on
the key plans as a SortMergeJoin with no Exchange on either side — at
100 TB that's the difference between re-shuffling the table per query and
a pure co-located merge.

Spark specifics encoded here:
- ``bucketBy`` requires ``saveAsTable`` (bucket metadata lives in the
  session catalog, not in parquet footers);
- both sides must use the SAME bucket count, and
  ``spark.sql.sources.bucketing.enabled`` must be on (default);
- ``sortBy`` at write time also removes the join's per-partition Sort.

The shuffle-free plan is asserted in tests/test_physical_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """One-time bucketed (+sorted) write of ``df`` as catalog table
    ``table``, hash-partitioned on ``key`` into ``buckets`` files per
    write task."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key —
    plans with zero Exchange operators (verify with .explain)."""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
