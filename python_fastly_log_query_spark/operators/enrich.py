"""Broadcast lookup enrichment (SURVEY.md §2.5).

The reference has no relational joins; the graft's north star adds
enrichment against small GeoIP / service-ID dimensions.  All dims are
broadcast-sized by construction, so every join here is a broadcast join —
zero shuffle of the fact side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import ip_to_long


def enrich_geoip(df: DataFrame, geoip: DataFrame, ip_col: str = "ip_address") -> DataFrame:
    """Left range-join ``ip_to_long(ip) BETWEEN ip_lo AND ip_hi`` against a
    broadcast GeoIP dim → adds ``country``/``asn``.

    Plans as BroadcastNestedLoopJoin: each executor scans the (tiny)
    broadcast ranges per row — O(|dim|) per row worst case, fine for a
    256-16k block dim.  For the million-block MaxMind case, precompute a
    fixed-width prefix key on both sides and equi-join instead (prefix →
    candidate blocks), which this function falls back to automatically when
    ``geoip`` carries a ``prefix`` column.
    """
    ipl = ip_to_long(F.col(ip_col))
    if "prefix" in geoip.columns:
        # equi-join fast path: prefix = high-order 8 bits; dim rows are
        # replicated per prefix they overlap by the dim builder.
        withp = df.withColumn("_ipl", ipl).withColumn(
            "_prefix", (F.col("_ipl") / F.lit(1 << 24)).cast("int")
        )
        joined = withp.join(
            F.broadcast(geoip),
            (withp["_prefix"] == geoip["prefix"])
            & (withp["_ipl"] >= geoip["ip_lo"])
            & (withp["_ipl"] <= geoip["ip_hi"]),
            "left",
        )
        return joined.drop("_ipl", "_prefix", "prefix", "ip_lo", "ip_hi")
    joined = df.withColumn("_ipl", ipl).join(
        F.broadcast(geoip),
        (F.col("_ipl") >= geoip["ip_lo"]) & (F.col("_ipl") <= geoip["ip_hi"]),
        "left",
    )
    return joined.drop("_ipl", "ip_lo", "ip_hi")


def default_service_dim(spark) -> DataFrame:
    """Built-in service-routing dim over the reference's ``/api/<type>``
    path space — nested prefixes exercise longest-prefix resolution."""
    return spark.createDataFrame(
        [
            ("/api/p", "payments", "backend"),
            ("/api/s", "auth", "backend"),
            ("/api", "api", "backend"),
            ("/", "web", "frontend"),
        ],
        "path_prefix string, service string, tier string",
    )


def enrich_service(
    df: DataFrame,
    services: DataFrame,
    path_col: str = "path",
    key_col: str = "url",
) -> DataFrame:
    """Longest-prefix-match of ``path`` against a broadcast service dim →
    adds ``service``/``tier``.

    Broadcast theta-join on ``startswith`` then keep the longest matching
    prefix per row via a max_by aggregation on a unique row key — no
    window shuffle (the groupBy keys are the fact rows themselves, and AQE
    coalesces).  ``key_col`` must uniquely identify rows (url for the docs
    table, event_id for the oracle corpus); rows with no match keep null
    service.
    """
    cand = df.select(key_col, F.col(path_col).alias("_p")).join(
        F.broadcast(services), F.col("_p").startswith(F.col("path_prefix")), "inner"
    )
    best = cand.groupBy(key_col).agg(
        F.expr("max_by(service, length(path_prefix))").alias("service"),
        F.expr("max_by(tier, length(path_prefix))").alias("tier"),
    )
    return df.join(best, key_col, "left")
