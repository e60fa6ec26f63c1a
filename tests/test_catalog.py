"""Catalog shim: append-only snapshots, as-of reads, atomic manifest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from python_fastly_log_query_spark.catalog import ParquetCatalog, get_catalog


def test_get_catalog_falls_back_to_parquet(spark, tmp_path):
    cat = get_catalog(spark, str(tmp_path))
    assert isinstance(cat, ParquetCatalog)  # no Iceberg jars in sandbox


def test_append_snapshots_and_as_of(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    s1 = cat.append("t", spark.range(0, 10).withColumn("v", F.lit("a")))
    s2 = cat.append("t", spark.range(10, 15).withColumn("v", F.lit("b")))
    assert [s.rows for s in cat.snapshots("t")] == [10, 5]
    assert cat.read("t").count() == 15
    assert cat.row_count("t") == 15
    # time travel: as of the first snapshot
    assert cat.read("t", as_of=s1.snapshot_id).count() == 10
    # overwrite collapses to one live snapshot
    cat.overwrite("t", spark.range(0, 3))
    assert cat.read("t").count() == 3
    assert len(cat.snapshots("t")) == 1
    cat.drop("t")
    assert not cat.exists("t")


def test_uncommitted_snapshot_is_invisible(spark, tmp_path):
    """Kill between data write and manifest commit must leave the table
    unchanged — simulate by writing a snapshot dir with no manifest entry."""
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.append("t", spark.range(0, 10))
    spark.range(99).write.parquet(os.path.join(str(tmp_path), "t", "data", "snap=dead"))
    assert cat.read("t").count() == 10  # orphan dir not visible
    assert cat.row_count("t") == 10


def test_as_of_unknown_snapshot_raises(spark, tmp_path):
    """ADVICE r1: a typo'd/overwritten-away snapshot id must fail loudly,
    never silently return the full current table."""
    import pytest

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.append("t", spark.range(5))
    with pytest.raises(KeyError, match="no snapshot"):
        cat.read("t", as_of="deadbeef0000")


def test_get_catalog_requires_configured_iceberg_catalog(spark, tmp_path):
    """ADVICE r1: Iceberg selection keys off spark.sql.catalog.<name> conf,
    not Class.forName — jars on a classpath don't configure a catalog."""
    from python_fastly_log_query_spark.catalog import (
        IcebergCatalog, iceberg_catalog_name,
    )

    # this sandbox has no iceberg conf -> parquet backend
    assert iceberg_catalog_name(spark) is None
    assert isinstance(get_catalog(spark, str(tmp_path)), ParquetCatalog)

    # a configured catalog name is detected and preferred
    spark.conf.set(
        "spark.sql.catalog.lakehouse", "org.apache.iceberg.spark.SparkCatalog"
    )
    try:
        assert iceberg_catalog_name(spark) == "lakehouse"
        cat = get_catalog(spark, str(tmp_path))
        assert isinstance(cat, IcebergCatalog) and cat.catalog == "lakehouse"
    finally:
        spark.conf.unset("spark.sql.catalog.lakehouse")
    assert iceberg_catalog_name(spark) is None
