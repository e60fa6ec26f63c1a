"""Date partitioning + partition-pruned date-range reads (SURVEY.md §2.1
S4; reference analog: day/hour prefix listing, src/sync/s3_sync.py:113-123,
src/utils/date_utils.py:49-96).

The reference iterates S3 prefixes day by day; the Spark-native shape is
a table partitioned by ``ds = to_date(warc_ts)`` (Iceberg: a
``days(warc_ts)`` partition transform) so a date-range predicate prunes
the scan to the requested days — the `--last-hours` filter
(plans/lasthours.py) rides the same pruning.
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "warc_ts", mode: str = "overwrite"
) -> None:
    """Write partitioned by day-of-timestamp (parquet analog of Iceberg's
    ``days(ts)`` transform)."""
    (
        df.withColumn("ds", F.to_date(ts_col))
        .write.mode(mode)
        .partitionBy("ds")
        .parquet(path)
    )


def read_date_range(
    spark: SparkSession,
    path: str,
    start: str | date | datetime | None = None,
    end: str | date | datetime | None = None,
) -> DataFrame:
    """Read with a partition-pruning ``ds`` range predicate (inclusive,
    UTC, like the reference's date_utils ranges).  ``None`` bounds are
    open."""
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(F.col("ds") >= F.lit(str(start)[:10]))
    if end is not None:
        df = df.filter(F.col("ds") <= F.lit(str(end)[:10]))
    return df


def spread(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Ensure a compute-heavy operator sees enough input partitions to use
    the cluster.

    Small-file inputs (one parquet file = one split) otherwise serialize an
    expensive projection onto a single task — measured 264s -> 2.4s for
    MinHash signatures over a 5000-row single-file table at local[32]
    (together with the hash-once materialization in dedup.py).  At
    production scale the scan already has >= defaultParallelism partitions
    and this is a no-op (plan inspection only, no shuffle).
    """
    if df.isStreaming:
        # no static partition count to inspect; micro-batch splits come
        # from maxFilesPerTrigger / source partitioning instead
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
