"""Unit contracts for the large-star/small-star connected-components
operator (operators/dedup.py:connected_components) — the cluster-collapse
stage of the dedup pipeline.  Ground truth: a plain Python union-find."""

import random

import pytest
from pyspark.sql import functions as F

from python_fastly_log_query_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges, driver_max_edges=1_000_000):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_max_edges=driver_max_edges).collect()
    }
    return got


@pytest.mark.parametrize("dme", [0, 1_000_000])
def test_chain(spark, dme):
    # a 9-node chain needs 8 label-propagation rounds but only ~log2 here
    edges = [(i, i + 1) for i in range(8)]
    got = _run(spark, edges, driver_max_edges=dme)
    assert got == {i: 0 for i in range(9)}


@pytest.mark.parametrize("dme", [0, 1_000_000])
def test_two_components_and_cycle(spark, dme):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11)]
    got = _run(spark, edges, driver_max_edges=dme)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1}  # the pure self-loop node is dropped


def test_empty(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0
    assert connected_components(df).columns == ["node", "component"]


@pytest.mark.parametrize("dme", [0, 1_000_000])  # distributed AND driver path
@pytest.mark.parametrize("seed,n,m", [(1, 60, 40), (2, 200, 150), (3, 80, 200)])
def test_random_graph_matches_union_find(spark, seed, n, m, dme):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    want = _uf_components([e for e in edges if e[0] != e[1]])
    got = _run(spark, edges, driver_max_edges=dme)
    assert got == want


def test_star_converges_fast(spark):
    # a pre-converged star must fingerprint-stabilize immediately
    edges = [(0, i) for i in range(1, 30)]
    got = _run(spark, edges, driver_max_edges=0)  # exercise the iteration
    assert set(got.values()) == {0} and len(got) == 30


def test_dedup_clusters_transitivity(spark):
    # A~B and B~C near-dups but A!~C directly: clusters must still merge
    # all three via transitivity, plus exact copies map through their rep.
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    mid = base.replace("quick", "rapid")          # ~ base, ~ far
    far = mid.replace("lazy", "sleepy")           # ~ mid only
    rows = [
        (0, base),
        (1, mid),
        (2, far),
        (3, base),  # exact copy of 0
        (4, "completely unrelated text about spark shuffles and parquet io"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["keeper"] for r in dedup_clusters(docs, 0.5).collect()}
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[4] == 4


def test_dedup_keep_best_prefers_quality_over_min_id(spark):
    from python_fastly_log_query_spark.operators.dedup import dedup_keep_best

    # docs 0/1/2 are one near-dup cluster; doc 2 (highest id) has the
    # richest text and must win; docs 10/11 tie on quality -> min id.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, base + " one", "en", "s", 1),
        (1, base + " one extra", "en", "s", 1),
        (2, base + " one extra rich unique vocabulary", "en", "s", 1),
        (10, "tie tokens here now", "en", "s", 1),
        (11, "tie tokens here now", "en", "s", 1),
        (20, "completely different standalone document text", "en", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r for r in dedup_keep_best(docs, 0.5, 16, 4).collect()}
    cluster_of_0 = out[0].cluster
    assert out[1].cluster == cluster_of_0 and out[2].cluster == cluster_of_0
    assert out[0].best_doc == 2 and out[2].keep == 1 and out[0].keep == 0
    # exact-dup tie: min id wins
    assert out[10].best_doc == 10 and out[11].keep == 0
    # singleton keeps itself
    assert out[20].best_doc == 20 and out[20].keep == 1
