"""Funnel + retention analytics (operators/aggregates.py) — planted
sequences pin the ORDER semantics the degenerate registry data can't."""

from __future__ import annotations

import datetime as dt

from python_fastly_log_query_spark.operators.aggregates import (
    funnel_counts,
    hourly_retention,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, 0.0, "")
            for i, (u, m, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_time_order(spark):
    rows = [
        # u1: full funnel in order (with interleaved noise)
        (1, 0, "view"), (1, 1, "error"), (1, 2, "click"), (1, 3, "purchase"),
        # u2: purchase BEFORE click -> depth 2 only
        (2, 0, "view"), (2, 1, "purchase"), (2, 2, "click"),
        # u3: view only
        (3, 0, "view"),
        # u4: never views
        (4, 0, "click"), (4, 1, "purchase"),
    ]
    out = {r.depth: r.users for r in
           funnel_counts(_ev(spark, rows)).collect()}
    assert out == {1: 3, 2: 2, 3: 1}


def test_funnel_word_boundaries(spark):
    # 'preview' must not satisfy the 'view' stage
    rows = [(1, 0, "preview"), (1, 1, "click"), (2, 0, "view")]
    out = {r.depth: r.users for r in
           funnel_counts(_ev(spark, rows), ("view",)).collect()}
    assert out == {1: 1}


def test_hourly_retention_counts(spark):
    rows = [
        (1, 0, "view"),            # u1 active hour 0
        (1, 61, "view"),           # ... and hour 1 -> retained at hour 0
        (2, 5, "view"),            # u2 active hour 0 only
        (3, 62, "view"),           # u3 active hour 1 only
    ]
    out = {r.hour.hour: r for r in hourly_retention(_ev(spark, rows)).collect()}
    assert out[0].active_users == 2 and out[0].retained_users == 1
    assert out[0].retained_ppm == 500000
    assert out[1].active_users == 2 and out[1].retained_users == 0


def test_hopping_window_double_counts_each_event_once_per_window(spark):
    """Hopping 2h/1h: every event lies in EXACTLY two windows, so total
    window-row mass is 2x the event count; each window spans its events'
    hour and the previous one."""
    from conftest import SF_SMALL

    import __spark_entry__ as entrymod

    out = entrymod.queries()["hopping_window_rollup"](spark, SF_SMALL)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    from pyspark.sql import functions as F

    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == 2 * ev.count()


def test_session_path_transitions_orders_by_time_then_event_id(spark):
    """Transitions must follow the per-IP timeline with the event_id
    tiebreak — an equal-timestamp pair still yields a deterministic
    edge direction."""
    from conftest import SF_SMALL

    import __spark_entry__ as entrymod

    out = entrymod.queries()["session_path_transitions"](spark, SF_SMALL)
    rows = out.collect()
    total = sum(r["n"] for r in rows)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    from pyspark.sql import functions as F

    n_ips = 15 if "0.001" in SF_SMALL else 150
    # every request except each IP's first produces exactly one edge
    parsed_n = ev.count()
    assert total == parsed_n - n_ips


def test_user_cohort_retention_triangle_invariants(spark):
    """Cohort matrix invariants: age 0 exists for every cohort (the
    first-seen day itself), ages are non-negative, and each cohort's
    age-0 count is its maximum (retention never exceeds cohort size)."""
    from conftest import SF_SMALL

    import __spark_entry__ as entrymod

    rows = entrymod.queries()["user_cohort_retention"](spark, SF_SMALL).collect()
    by_cohort = {}
    for r in rows:
        assert r["age_days"] >= 0
        by_cohort.setdefault(r["cohort_day"], {})[r["age_days"]] = r["n_users"]
    for cohort, ages in by_cohort.items():
        assert 0 in ages, f"cohort {cohort} missing its own first day"
        assert ages[0] == max(ages.values())
