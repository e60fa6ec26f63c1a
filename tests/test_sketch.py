"""Count-min sketch contracts (operators/sketch.py): the never-undercount
guarantee, the bounded sketch size that makes the shuffle O(depth*width)
per task, and the plan shapes the docstrings claim (map-side partial
aggregation = the per-partition sketch; broadcast estimate join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL

from python_fastly_log_query_spark.operators.sketch import (
    cms_estimate,
    cms_sketch,
)


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cms_never_undercounts_and_conserves_mass(spark):
    # deliberately narrow sketch (width 32 << 38 distinct keys) so
    # collisions are guaranteed — the guarantee must hold anyway
    data = [(f"k{i % 37}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(data, ["k"])
    depth, width = 4, 32
    sk = cms_sketch(df, "k", depth, width).cache()
    try:
        assert sk.count() <= depth * width
        # every row landed in exactly one bucket per depth
        per_depth = sk.groupBy("depth").agg(F.sum("cnt").alias("s")).collect()
        assert len(per_depth) == depth
        assert all(r["s"] == len(data) for r in per_depth)

        exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
        rows = cms_estimate(sk, exact, "k", depth, width).collect()
        assert len(rows) == 38
        assert all(r["cms_est"] >= r["exact"] for r in rows)
        # the hot key dominates its cells, so its estimate is tight
        hot = next(r for r in rows if r["k"] == "hot")
        assert hot["exact"] == 500
    finally:
        sk.unpersist()


def test_approx_quantiles_contract_plan_and_result(spark):
    """The GK contract query must hold its claimed plan shape: the
    sketch frame joins back over events as a BroadcastHashJoin (it is
    group-count-sized), and the verdict is true on real data."""
    from python_fastly_log_query_spark.queries import (
        q_approx_quantiles_contract,
    )

    df = q_approx_quantiles_contract(spark, SF_SMALL)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["all_within_bounds"] is True
    assert rows[0]["groups"] > 0


def test_cms_plans_partial_agg_and_broadcast_join(spark):
    df = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        F.col("event_type").alias("k")
    )
    sk = cms_sketch(df, "k", 4, 64)
    # map-side combine: each task pre-merges into its local sketch, so
    # the shuffle carries <= depth*width rows per task
    assert "partial_count" in _plan(sk)

    est = cms_estimate(sk, df.distinct(), "k", 4, 64)
    plan = _plan(est)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
