"""Plan-regression gate (VERDICT r4 item 5): diff the live physical-plan
fingerprints of the headline queries against the committed expectation.

Wall time on this host swings 20-50% between launches, so a plan
regression — a new shuffle, a lost broadcast, a join degenerating to a
nested loop, a top-k paying a global sort — can hide inside timing
noise for rounds.  The fingerprint (structural operator counts of the
UN-EXECUTED plan) is load-independent: same code + same planning-time
input statistics => same counts, every run.  A legitimate plan change
must update BENCH/plan_fingerprints.json in the same commit, making it
a REVIEWED event instead of silent drift.
"""

import json
import os

import pytest

from conftest import SF_SMALL

from python_fastly_log_query_spark import queries as Q
from python_fastly_log_query_spark.plans.fingerprint import (
    FINGERPRINT_QUERIES,
    fingerprint_queries,
    plan_fingerprint,
)

_EXPECT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH",
    "plan_fingerprints.json",
)


@pytest.fixture(scope="module")
def live(spark):
    return fingerprint_queries(spark, SF_SMALL, Q.queries())


def _expected() -> dict:
    with open(_EXPECT_PATH) as f:
        return json.load(f)


def test_fingerprints_match_committed_expectation(live):
    label = os.path.basename(SF_SMALL)
    expect = _expected().get(label)
    assert expect is not None, f"no committed fingerprints for {label}"
    diffs = {}
    for name in FINGERPRINT_QUERIES:
        if live[name] != expect.get(name):
            diffs[name] = {"expected": expect.get(name), "got": live[name]}
    assert not diffs, (
        "physical plan changed for: "
        + json.dumps(diffs, indent=1)
        + "\nIf intentional, regenerate BENCH/plan_fingerprints.json "
        "(fingerprint_queries at sf0.001, sf0.01 and sf0.1) in the same commit."
    )


def test_no_quadratic_join_shapes_outside_declared(live):
    """Nested-loop/cartesian joins are only legitimate as broadcast
    cross-scores against dimension-sized frames (ANN codebooks, BM25's
    1-row stats frame, SemDeDup's centroid frame).  Every fingerprinted
    query either has ZERO of them or is on this explicit allowlist with
    the declared count — a new nested loop anywhere else fails here
    even if wall time looks fine."""
    declared_bnlj = {
        # (opt r6: semdedup_scaled left this list — ivf_assign's
        # cross-join + window argmax became a map-only numpy stage, so
        # its six printed BNLJ subtrees are gone)
        # BM25: one broadcast 1-row corpus-stats frame joined cross
        "bm25_search_topk": 1,
        # RRF fusion: two BM25 sources (1-row stats frame each) + the
        # cosine source's broadcast 1-row query-vector cross join
        "hybrid_rrf_topk": 3,
        # ANALYZE pass (opt r6): each per-column NDV is its own
        # column-pruned distinct aggregate, attached to the base-stats
        # row via a broadcast 1-ROW cross join — five columns profiled
        "table_stats_report": 5,
    }
    for name, fp in live.items():
        assert fp["cartesian"] == 0, (name, fp)
        assert fp["nested_loop_joins"] == declared_bnlj.get(name, 0), (name, fp)


def test_fingerprint_detects_a_lost_broadcast(spark):
    """Sanity check on the instrument itself: the same join with the
    broadcast hint stripped and the auto-broadcast threshold disabled
    must fingerprint differently (BHJ -> SMJ + more exchanges)."""
    from pyspark.sql import functions as F

    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    fact = spark.range(10_000).select((F.col("id") % 100).alias("k"))
    with_bc = fact.join(F.broadcast(dim), "k").groupBy("grp").count()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        without = fact.join(dim, "k").groupBy("grp").count()
        fp_no = plan_fingerprint(without)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    fp_bc = plan_fingerprint(with_bc)
    assert fp_bc["broadcast_joins"] == 1 and fp_bc["sort_merge_joins"] == 0
    assert fp_no["broadcast_joins"] == 0
    assert fp_no["sort_merge_joins"] + fp_no["shuffled_hash_joins"] == 1
    assert fp_no["shuffle_exchanges"] > fp_bc["shuffle_exchanges"]
