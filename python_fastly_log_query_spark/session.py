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
import tempfile

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
        .config("spark.driver.memory", _driver_mem())
        # JVM sizing (see BENCH/BASELINE.md for the measurements):
        # - G1HeapRegionSize=32m: Arrow batches of wide string/binary rows
        #   are multi-MB allocations; with default G1 region sizing those go
        #   down the humongous-object path, whose allocation lock serializes
        #   executor threads (measured: 26s -> 2s for an identity
        #   mapInPandas over 4M wide rows at local[32]).
        # - -Xms == -Xmx: pre-size the heap so early jobs don't pay
        #   repeated grow-the-heap GC cycles (a 2-3x slow first minute).
        # - MetaspaceSize: codegen classloading otherwise trips repeated
        #   "Metadata GC Threshold" concurrent cycles.
        # - SPARK_GRAFT_JAVA_OPTS: extra per-process flags, e.g.
        #   -XX:ActiveProcessorCount=N for CPU-pinned executor JVMs (a JVM
        #   pinned to 8 cores otherwise sizes GC/JIT/netty pools for the
        #   whole machine and thrashes its allotment).
        .config("spark.driver.extraJavaOptions", _java_opts())
        .config("spark.executor.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
        # bucketed tables (plans/bucketing.py) register in the session
        # catalog; keep their data out of the repo cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE")
            or os.path.join(
                os.environ.get("SPARK_GRAFT_WORK_DIR")
                or os.path.join(tempfile.gettempdir(), "pflq_spark_work"),
                "spark-warehouse",
            ),
        )
        .config("spark.ui.enabled", "false")
    )


def _driver_mem() -> str:
    return os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")


def _java_opts() -> str:
    base = (
        f"-XX:G1HeapRegionSize=32m -Xms{_driver_mem()} "
        "-XX:MetaspaceSize=1g -XX:InitiatingHeapOccupancyPercent=70"
    )
    extra = os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
    return f"{base} {extra}".strip()


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
