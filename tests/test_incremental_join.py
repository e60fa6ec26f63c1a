"""Join-view maintenance identity (plans/incremental.py): appending the
algebraic delta to the stored view must be ROW-equal (multiset) to the
full recompute, for every old/batch split — and the delta terms must
broadcast the batch sides.  The registered query's cross-engine oracle
runs in test_oracle_parity."""

from pyspark.sql import functions as F

from python_fastly_log_query_spark.plans.incremental import (
    join_view_delta,
    maintained_join_view,
)


def _frames(spark):
    a = spark.createDataFrame(
        [(i, f"t{i % 5}", float(i)) for i in range(40)],
        "event_id long, event_type string, value double",
    )
    b = spark.createDataFrame(
        [(f"t{i}", f"g{i % 2}") for i in range(5)],
        "event_type string, grp string",
    )
    return a, b


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_maintained_view_equals_full_recompute(spark):
    a, b = _frames(spark)
    for a_pred, b_pred in [
        (F.col("event_id") % 4 != 0, F.col("event_type") != "t0"),
        (F.lit(True), F.col("event_type") > "zzz"),  # empty dB
        (F.col("event_id") < 0, F.lit(True)),  # empty A_old
    ]:
        a_old, a_delta = a.filter(a_pred), a.filter(~a_pred)
        b_old, b_delta = b.filter(b_pred), b.filter(~b_pred)
        got = maintained_join_view(
            a_old, a_delta, b_old, b_delta, on=["event_type"]
        )
        want = a.join(b, "event_type")
        assert _multiset(got) == _multiset(want)


def test_delta_terms_broadcast_the_batch_sides(spark):
    a, b = _frames(spark)
    a_old, a_delta = a.filter("event_id % 4 != 0"), a.filter("event_id % 4 = 0")
    b_old, b_delta = b.filter("event_type != 't0'"), b.filter("event_type = 't0'")
    plan = (
        join_view_delta(a_old, a_delta, b_old, b_delta, ["event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all three terms hash-join with a broadcast side; the base tables
    # never move through a shuffle exchange
    assert plan.count("BroadcastHashJoin") == 3
    assert "ShuffleExchange" not in plan and "SortMergeJoin" not in plan
