"""SparkSession builder with the configs this engine depends on.

Semantics-critical configs:
- session time zone UTC: the reference treats all timestamps as naive UTC
  (reference src/utils/date_utils.py:69-79, README.md:82).
- ``spark.sql.mapKeyDedupPolicy=LAST_WIN``: query-param maps keep the last
  duplicate key, matching the reference's dict overwrite semantics
  (reference src/parse/log_parser.py:96-102).
- Arrow on: the grok parse stage is a pandas UDF; Arrow batching is the
  vectorized transfer path.
- AQE on (+ skew join): runtime shuffle re-planning for the 100 TB target.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def builder_conf(
    builder: SparkSession.Builder,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
) -> SparkSession.Builder:
    """Apply this engine's required configs to any SparkSession builder."""
    return (
        builder.config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )


def get_spark(
    app_name: str = "python-fastly-log-query-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; on a real cluster pass None and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    b = SparkSession.builder.appName(app_name).master(master)
    return builder_conf(b, shuffle_partitions).getOrCreate()
