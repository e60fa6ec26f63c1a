"""Iceberg-backend tests (VERDICT r4 item 4): executable the day the
runtime jars exist, skipped-with-reason in this sandbox.

The sandbox has no Iceberg runtime (verified: the class is not loadable
in the session JVM), so `IcebergCatalog` was the one backend branch with
no executable test.  This module is the deploy-path shell: it covers
create/append/snapshots/as-of/drop through the SAME `IcebergCatalog`
wrapper the pipeline uses, against a local hadoop-type warehouse, and
skips with the exact --packages coordinate when the jars are absent.

Pinned runtime (update the patch version at deploy, keep the Spark/Scala
suffix matched to the cluster):

    --packages org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:1.10.0

The backend-SELECTION logic (catalog.iceberg_catalog_name /
get_catalog) needs no jars — it only inspects session confs — so those
tests run everywhere, including here.
"""

import pytest

from pyspark.sql import functions as F

from python_fastly_log_query_spark.catalog import (
    IcebergCatalog,
    ParquetCatalog,
    get_catalog,
    iceberg_catalog_name,
)

ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:1.10.0"


def _iceberg_loadable(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


# ------------------------------------------------- selection (runs everywhere)


def test_selection_prefers_configured_iceberg_catalog(spark, tmp_path):
    """iceberg_catalog_name trusts spark.sql.catalog.<name> conf entries,
    not classpath contents — so the selection contract is testable with
    no jars installed."""
    assert iceberg_catalog_name(spark) is None
    assert isinstance(get_catalog(spark, str(tmp_path)), ParquetCatalog)
    spark.conf.set(
        "spark.sql.catalog.ice_t", "org.apache.iceberg.spark.SparkCatalog"
    )
    try:
        assert iceberg_catalog_name(spark) == "ice_t"
        cat = get_catalog(spark, str(tmp_path))
        assert isinstance(cat, IcebergCatalog) and cat.catalog == "ice_t"
    finally:
        spark.conf.unset("spark.sql.catalog.ice_t")
    assert iceberg_catalog_name(spark) is None


def test_selection_ignores_non_iceberg_catalog_confs(spark, tmp_path):
    spark.conf.set("spark.sql.catalog.other", "com.example.SomeOtherCatalog")
    try:
        assert iceberg_catalog_name(spark) is None
        assert isinstance(get_catalog(spark, str(tmp_path)), ParquetCatalog)
    finally:
        spark.conf.unset("spark.sql.catalog.other")


# ------------------------------------------------- backend (needs the jars)


@pytest.fixture(scope="module")
def ice(spark, tmp_path_factory):
    if not _iceberg_loadable(spark):
        pytest.skip(
            "iceberg-spark-runtime jars not on the classpath (sandbox has no "
            f"Iceberg runtime); deploy with --packages {ICEBERG_PACKAGE}"
        )
    wh = str(tmp_path_factory.mktemp("ice_wh"))
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", wh)
    try:
        yield IcebergCatalog(spark, "ice")
    finally:
        for k in (
            "spark.sql.catalog.ice",
            "spark.sql.catalog.ice.type",
            "spark.sql.catalog.ice.warehouse",
        ):
            spark.conf.unset(k)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"), (F.col("id") % 3).alias("route")
    )


def test_iceberg_create_append_and_counts(spark, ice):
    t = "db.logs_ca"
    ice.drop(t)
    assert not ice.exists(t)
    ice.overwrite(t, _rows(spark, 0, 100))  # createOrReplace = create
    assert ice.exists(t)
    ice.append(t, _rows(spark, 100, 150))
    assert ice.read(t).count() == 150
    snaps = ice.snapshots(t)
    assert len(snaps) == 2  # create + append
    ice.drop(t)


def test_iceberg_as_of_reads_historic_snapshot(spark, ice):
    t = "db.logs_asof"
    ice.drop(t)
    ice.overwrite(t, _rows(spark, 0, 40))
    first = sorted(ice.snapshots(t), key=lambda r: r["committed_at"])[0][
        "snapshot_id"
    ]
    ice.append(t, _rows(spark, 40, 70))
    assert ice.read(t).count() == 70
    assert ice.read(t, as_of=str(first)).count() == 40  # time travel
    ice.drop(t)


def test_iceberg_overwrite_replaces_contents(spark, ice):
    t = "db.logs_ow"
    ice.drop(t)
    ice.overwrite(t, _rows(spark, 0, 30))
    ice.overwrite(t, _rows(spark, 0, 10))
    assert ice.read(t).count() == 10
    ice.drop(t)
