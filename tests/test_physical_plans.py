"""Physical-plan audits: the optimizations we claim must actually appear
in the plan (`.explain` evidence, SURVEY.md §4 / driver brief "explain the
plan and iterate until it's the plan you'd want").
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_ORACLE, SF_SMALL

from python_fastly_log_query_spark.datagen import geoip_dim
from python_fastly_log_query_spark.operators import aggregates as A
from python_fastly_log_query_spark.operators.enrich import enrich_geoip
from python_fastly_log_query_spark.operators.skew import salted_counts


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_geoip_enrich_is_broadcast_hash_join(spark):
    parsed = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        F.concat_ws(".", (F.col("user_id") % 200 + 1).cast("string"),
                    F.lit("0"), F.lit("0"), F.lit("1")).alias("ip_address")
    )
    plan = _plan(enrich_geoip(parsed, geoip_dim(spark, 256)))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topn_plans_take_ordered(spark):
    df = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        F.col("event_type").alias("path")
    )
    plan = _plan(A.popular_endpoints(df))
    # true top-k: no global sort of the aggregate output
    assert "TakeOrderedAndProject" in plan


def test_filter_pushdown_and_column_pruning(spark):
    df = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    q = df.filter(F.col("o_custkey") == 42).select("o_orderkey")
    plan = _plan(q)
    assert "PushedFilters" in plan and "o_custkey" in plan.split("PushedFilters")[1][:200]
    # scan reads only the two needed columns
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "o_orderkey" in read_schema and "o_totalprice" not in read_schema


def test_broadcast_join_for_small_dim(spark):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    j = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_agg_has_map_side_partial(spark):
    """Rollups must shuffle only map-side-combined partials (SURVEY.md §4):
    the plan needs a partial_count HashAggregate before the Exchange."""
    df = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    q = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(q)
    assert "partial_count" in plan and "Exchange" in plan


def test_salted_counts_equal_plain_counts(spark):
    df = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    plain = {r["event_type"]: r["n"] for r in
             df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["event_type"]: r["requests"] for r in
              salted_counts(df, "event_type", buckets=8).collect()}
    assert salted == plain
    # and the salted plan has the two-phase shape: two exchanges
    plan = _plan(salted_counts(df, "event_type", buckets=8))
    assert plan.count("Exchange") >= 2
