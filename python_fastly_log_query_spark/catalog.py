"""Format-agnostic table catalog (SURVEY.md §7 Stage 0).

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jars (verified), so the pipeline code talks to ONE interface with
two backends:

- ``IcebergCatalog`` — thin ``spark.table`` / ``writeTo`` wrapper, active
  when an Iceberg catalog is configured on the session (cluster deploys:
  ``--packages org.apache.iceberg:iceberg-spark-runtime-…`` plus the
  usual ``spark.sql.catalog.<name>`` confs);
- ``ParquetCatalog`` — partitioned parquet + a JSON snapshot manifest per
  table, reproducing the two Iceberg behaviors the pipeline relies on:
  append-only snapshots with row counts (lineage/metrics) and read-time
  "as of" filtering by snapshot id.

Pipeline code never branches on backend; ``get_catalog(spark)`` picks
Iceberg when available.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Snapshot:
    snapshot_id: str
    committed_at: str
    rows: int
    operation: str


class ParquetCatalog:
    """Partitioned-parquet backend with JSON snapshot manifests.

    Layout: ``<root>/<table>/data/snap=<id>/...`` + ``<root>/<table>/
    _snapshots.json``.  Appends are new snapshot directories (never
    rewritten), so concurrent readers see a consistent table and a kill
    mid-append leaves no visible partial snapshot (the manifest commit —
    atomic rename — happens last, same protocol as plans/checkpoint.py).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---- paths
    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest(self, table: str) -> str:
        return os.path.join(self._dir(table), "_snapshots.json")

    # ---- metadata
    def snapshots(self, table: str) -> list[Snapshot]:
        p = self._manifest(table)
        if not os.path.exists(p):
            return []
        return [Snapshot(**s) for s in json.load(open(p))]

    def _commit(self, table: str, snaps: list[Snapshot]) -> None:
        p = self._manifest(table)
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump([s.__dict__ for s in snaps], f, indent=1)
        os.rename(tmp, p)

    def exists(self, table: str) -> bool:
        return os.path.exists(self._manifest(table))

    # ---- IO
    def append(self, table: str, df: DataFrame, operation: str = "append") -> Snapshot:
        sid = uuid.uuid4().hex[:12]
        path = os.path.join(self._dir(table), "data", f"snap={sid}")
        df.write.mode("error").parquet(path)
        rows = self.spark.read.parquet(path).count()
        snap = Snapshot(
            snapshot_id=sid,
            committed_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            rows=rows,
            operation=operation,
        )
        self._commit(table, self.snapshots(table) + [snap])  # manifest last
        return snap

    def overwrite(self, table: str, df: DataFrame) -> Snapshot:
        # old snapshot dirs stay on disk (time travel); the manifest's
        # single live entry defines table contents
        sid = uuid.uuid4().hex[:12]
        path = os.path.join(self._dir(table), "data", f"snap={sid}")
        df.write.mode("error").parquet(path)
        rows = self.spark.read.parquet(path).count()
        snap = Snapshot(sid, time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                        rows, "overwrite")
        self._commit(table, [snap])
        return snap

    def read(self, table: str, as_of: str | None = None) -> DataFrame:
        snaps = self.snapshots(table)
        if as_of is not None:
            keep = []
            for s in snaps:
                keep.append(s)
                if s.snapshot_id == as_of:
                    break
            # ADVICE r1: an unknown id must fail loudly, not silently
            # return the full current table (wrong data for time travel)
            if not keep or keep[-1].snapshot_id != as_of:
                raise KeyError(
                    f"table {table} has no snapshot {as_of!r} "
                    f"(known: {[s.snapshot_id for s in snaps]})"
                )
            snaps = keep
        if not snaps:
            raise FileNotFoundError(f"table {table} has no snapshots")
        paths = [
            os.path.join(self._dir(table), "data", f"snap={s.snapshot_id}")
            for s in snaps
        ]
        return self.spark.read.parquet(*paths)

    def row_count(self, table: str) -> int:
        return sum(s.rows for s in self.snapshots(table))

    def drop(self, table: str) -> None:
        import shutil

        if os.path.isdir(self._dir(table)):
            shutil.rmtree(self._dir(table))


class IcebergCatalog:
    """Iceberg backend (cluster deploys with the runtime jars)."""

    def __init__(self, spark: SparkSession, catalog: str = "spark_catalog"):
        self.spark = spark
        self.catalog = catalog

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(f"{self.catalog}.{table}")

    def append(self, table: str, df: DataFrame, operation: str = "append"):
        df.writeTo(f"{self.catalog}.{table}").append()

    def overwrite(self, table: str, df: DataFrame):
        df.writeTo(f"{self.catalog}.{table}").createOrReplace()

    def read(self, table: str, as_of: str | None = None) -> DataFrame:
        if as_of is not None:
            return (
                self.spark.read.option("snapshot-id", as_of)
                .table(f"{self.catalog}.{table}")
            )
        return self.spark.table(f"{self.catalog}.{table}")

    def snapshots(self, table: str):
        return self.spark.sql(
            f"SELECT * FROM {self.catalog}.{table}.snapshots"
        ).collect()

    def drop(self, table: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog}.{table}")


_ICEBERG_IMPLS = (
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
)


def iceberg_catalog_name(spark: SparkSession) -> str | None:
    """Name of a session catalog actually CONFIGURED as Iceberg.

    ADVICE r1: jars on the classpath do not mean any catalog is wired to
    Iceberg — ``writeTo(...).append()`` would still fail.  Trust only
    ``spark.sql.catalog.<name>`` conf entries pointing at an Iceberg
    implementation, preferring ``spark_catalog``.
    """
    try:
        # `SET` lists every explicitly-set SQL conf (static + runtime)
        all_confs = {r["key"]: r["value"] for r in spark.sql("SET").collect()}
    except Exception:
        return None
    names = [
        k[len("spark.sql.catalog."):]
        for k, v in all_confs.items()
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3
        and v in _ICEBERG_IMPLS
    ]
    if not names:
        return None
    return "spark_catalog" if "spark_catalog" in names else sorted(names)[0]


def get_catalog(spark: SparkSession, root: str):
    """Iceberg when a session catalog is configured for it, else
    parquet+manifest."""
    name = iceberg_catalog_name(spark)
    if name is not None:
        return IcebergCatalog(spark, name)
    return ParquetCatalog(spark, root)
