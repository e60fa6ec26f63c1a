"""Web-graph operators (operators/webgraph.py): outlink extraction and
integer-exact PageRank, pinned against a plain-Python replica."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from python_fastly_log_query_spark.operators.webgraph import (
    SCALE,
    extract_outlinks,
    pagerank,
)


def test_extract_outlinks_counts_anchors(spark):
    html = (
        '<html><a href="https://a.com/x">1</a>'
        '<a href="https://b.com/">2</a>'
        '<a href="https://a.com/y">3</a>'
        "<a href='https://nomatch.com/'>single-quoted: skipped</a></html>"
    )
    df = spark.createDataFrame([("h.com", html.encode())], "src_host string, html binary")
    got = {
        (r.src, r.dst): r.w for r in extract_outlinks(df).collect()
    }
    assert got == {("h.com", "a.com"): 2, ("h.com", "b.com"): 1}


def _py_pagerank(edges, iterations=5):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = defaultdict(int)
    for s, _, w in edges:
        outw[s] += w
    pr = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        inc = defaultdict(int)
        for s, d, w in edges:
            inc[d] += pr[s] * w // outw[s]
        pr = {
            v: (15 * SCALE) // (100 * n) + 85 * inc.get(v, 0) // 100
            for v in nodes
        }
    return pr


def test_pagerank_matches_python_replica(spark):
    import random

    rng = random.Random(11)
    hosts = [f"h{i}" for i in range(20)]
    edges = []
    for s in hosts:
        for d in rng.sample(hosts, 3):
            edges.append((s, d, rng.randint(1, 9)))
    # duplicate edge keys collapse via max-w (keep the frame unique-keyed)
    uniq = {}
    for s, d, w in edges:
        uniq[(s, d)] = w
    edges = [(s, d, w) for (s, d), w in uniq.items()]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.host: r.pr for r in pagerank(df, iterations=5).collect()}
    assert got == _py_pagerank(edges, 5)


def test_pagerank_partitioning_invariant(spark):
    edges = [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("a", "c", 1)]
    df1 = spark.createDataFrame(edges, "src string, dst string, w long")
    df8 = df1.repartition(8)
    r1 = {r.host: r.pr for r in pagerank(df1, 4).collect()}
    r8 = {r.host: r.pr for r in pagerank(df8, 4).collect()}
    assert r1 == r8  # associative integer sums: bit-identical anywhere


# ------------------------------------------------------------ anchor text


def test_anchor_text_topk_ranks_and_tiebreaks(spark):
    from python_fastly_log_query_spark.operators.webgraph import anchor_text_topk

    pages = spark.createDataFrame(
        [
            ("a.com", '<a href="https://t.com/x">great site</a>'
                      '<a href="https://t.com/y">great deals</a>'),
            ("b.com", '<a href="https://t.com/z">great stuff</a>'
                      '<a href="https://u.com/">only link</a>'),
        ],
        "src_host string, html string",
    )
    out = anchor_text_topk(pages, top_k=2, binary=False).collect()
    t = {r["term"]: r for r in out if r["dst"] == "t.com"}
    # 'great' x3 ranks first; tie between 'deals'/'site'/'stuff' (1 each)
    # breaks alphabetically -> 'deals' takes rank 2, others cut at k=2
    assert t["great"]["n"] == 3 and t["great"]["rnk"] == 1
    assert set(t) == {"great", "deals"} and t["deals"]["rnk"] == 2
    u = [r for r in out if r["dst"] == "u.com"]
    assert {r["term"] for r in u} == {"link", "only"}


def test_anchor_text_topk_self_description_not_used(spark):
    from python_fastly_log_query_spark.operators.webgraph import anchor_text_topk

    # body text outside anchors never reaches the signal
    pages = spark.createDataFrame(
        [("a.com", 'spammy self praise <a href="https://t.com/">neutral</a>')],
        "src_host string, html string",
    )
    out = anchor_text_topk(pages, binary=False).collect()
    assert [(r["dst"], r["term"]) for r in out] == [("t.com", "neutral")]


def _py_lpa(edges, iterations=4):
    und = defaultdict(int)
    for s, d, w in edges:
        if s != d:
            und[(s, d)] += w
            und[(d, s)] += w
    nbrs = defaultdict(list)
    for (v, u), w in und.items():
        nbrs[v].append((u, w))
    lab = {v: v for v in nbrs}
    for _ in range(iterations):
        new = {}
        for v in lab:
            votes = defaultdict(int)
            for u, w in nbrs[v]:
                votes[lab[u]] += w
            if votes:
                new[v] = min(votes, key=lambda l: (-votes[l], l))
            else:
                new[v] = lab[v]
        lab = new
    return lab


def test_label_propagation_matches_python_replica(spark):
    import random

    from python_fastly_log_query_spark.operators.webgraph import (
        label_propagation,
    )

    rng = random.Random(23)
    hosts = [f"h{i:02d}" for i in range(24)]
    uniq = {}
    # three planted dense communities plus sparse cross links
    for c in range(3):
        block = hosts[c * 8:(c + 1) * 8]
        for s in block:
            for d in rng.sample(block, 4):
                uniq[(s, d)] = rng.randint(3, 9)
    for _ in range(6):
        uniq[(rng.choice(hosts), rng.choice(hosts))] = 1
    edges = [(s, d, w) for (s, d), w in uniq.items()]
    got = {
        r.host: r.label
        for r in label_propagation(
            spark.createDataFrame(edges, "src string, dst string, w long")
        ).collect()
    }
    assert got == _py_lpa(edges)
    # planted communities actually collapse: far fewer labels than hosts
    assert len(set(got.values())) < len(got) // 2


def test_label_propagation_isolated_pair_keeps_min_label(spark):
    from python_fastly_log_query_spark.operators.webgraph import (
        label_propagation,
    )

    df = spark.createDataFrame(
        [("b.com", "a.com", 1)], "src string, dst string, w long"
    )
    # synchronous 2-cycle: each round the pair swap labels, so an odd
    # round count leaves each node holding the OTHER node's name and an
    # even count restores the identity — deterministic either way
    got1 = {r.host: r.label for r in label_propagation(df, iterations=1).collect()}
    assert got1 == {"a.com": "b.com", "b.com": "a.com"}
    got2 = {r.host: r.label for r in label_propagation(df, iterations=2).collect()}
    assert got2 == {"a.com": "a.com", "b.com": "b.com"}


# ------------------------------------------------------------------ HITS


def _py_hits(edges, iterations):
    from python_fastly_log_query_spark.operators.webgraph import HITS_SCALE

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    h = {v: HITS_SCALE for v in nodes}
    a = {}
    for _ in range(iterations):
        ar = {v: 0 for v in nodes}
        for s, d, w in edges:
            ar[d] += h[s] * w
        sa = max(1, max(ar.values(), default=0) // HITS_SCALE)
        a = {v: ar[v] // sa for v in nodes}
        hr = {v: 0 for v in nodes}
        for s, d, w in edges:
            hr[s] += a[d] * w
        sh = max(1, max(hr.values(), default=0) // HITS_SCALE)
        h = {v: hr[v] // sh for v in nodes}
    return h, a


def test_hits_matches_python_replica(spark):
    import random

    from python_fastly_log_query_spark.operators.webgraph import hits

    rng = random.Random(7)
    hosts = [f"h{i}" for i in range(18)]
    uniq = {}
    for s in hosts:
        for d in rng.sample(hosts, 4):
            uniq[(s, d)] = rng.randint(1, 9)
    edges = [(s, d, w) for (s, d), w in uniq.items()]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.host: (r.hub_score, r.auth_score) for r in hits(df, 3).collect()}
    ph, pa = _py_hits(edges, 3)
    assert got == {v: (ph[v], pa[v]) for v in ph}


def test_hits_partitioning_invariant_and_hub_shape(spark):
    from python_fastly_log_query_spark.operators.webgraph import hits

    # star: 'hub' points at everything, nothing points back
    edges = [("hub", f"t{i}", 1) for i in range(6)] + [("t0", "t1", 1)]
    df1 = spark.createDataFrame(edges, "src string, dst string, w long")
    r1 = {r.host: (r.hub_score, r.auth_score) for r in hits(df1, 3).collect()}
    r8 = {
        r.host: (r.hub_score, r.auth_score)
        for r in hits(df1.repartition(8), 3).collect()
    }
    assert r1 == r8  # associative integer ops: bit-identical anywhere
    # the pure hub has the top hub score and zero authority
    assert r1["hub"][0] == max(v[0] for v in r1.values())
    assert r1["hub"][1] == 0


# ------------------------------------------------------------------- BFS


def test_bfs_depths_matches_python_replica(spark):
    import random

    from python_fastly_log_query_spark.operators.webgraph import (
        BFS_INF,
        bfs_depths,
    )

    rng = random.Random(3)
    hosts = [f"h{i}" for i in range(16)]
    uniq = {}
    for s in hosts[:12]:  # leave some hosts link-target-only / isolated
        for d in rng.sample(hosts, 3):
            uniq[(s, d)] = 1
    edges = [(s, d, w) for (s, d), w in uniq.items()]
    seeds, depth = ["h0", "h5"], 3
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.host: r.depth for r in bfs_depths(df, seeds, depth).collect()}

    # plain-Python BFS capped at `depth`
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    want = {v: (0 if v in seeds else BFS_INF) for v in nodes}
    for _ in range(depth):
        nxt = dict(want)
        for s, d, _ in edges:
            nxt[d] = min(nxt[d], want[s] + 1)
        want = nxt
    assert got == want
    assert got["h0"] == 0 and got["h5"] == 0


def test_bfs_partitioning_invariant(spark):
    from python_fastly_log_query_spark.operators.webgraph import bfs_depths

    edges = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("x", "a", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    r1 = {r.host: r.depth for r in bfs_depths(df, ["a"], 4).collect()}
    r8 = {r.host: r.depth for r in bfs_depths(df.repartition(8), ["a"], 4).collect()}
    assert r1 == r8
    assert (r1["a"], r1["b"], r1["c"], r1["d"]) == (0, 1, 2, 3)


# -------------------------------------------------------------- TrustRank


def test_personalized_pagerank_matches_python_replica(spark):
    import random

    from python_fastly_log_query_spark.operators.webgraph import SCALE, pagerank

    rng = random.Random(19)
    hosts = [f"h{i}" for i in range(15)]
    uniq = {}
    for s in hosts:
        for d in rng.sample(hosts, 3):
            uniq[(s, d)] = rng.randint(1, 5)
    edges = [(s, d, w) for (s, d), w in uniq.items()]
    seeds = ["h0", "h3"]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.host: r.pr for r in pagerank(df, 4, personalize=seeds).collect()}

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    ns = len(seeds)
    pr = {v: (SCALE // ns if v in seeds else 0) for v in nodes}
    for _ in range(4):
        inc = {v: 0 for v in nodes}
        for s, d, w in edges:
            inc[d] += pr[s] * w // outw[s]
        pr = {
            v: ((15 * SCALE) // (100 * ns) if v in seeds else 0)
            + 85 * inc[v] // 100
            for v in nodes
        }
    assert got == pr
    # teleport only reaches seeds: a host with no in-links and no seed
    # status scores exactly 0
    no_in = set(nodes) - {d for _, d, _ in edges} - set(seeds)
    for v in no_in:
        assert got[v] == 0


# ----------------------------------------------------------------- k-core


def _peel_coreness(edges: list[tuple[str, str]]) -> dict[str, int]:
    """Textbook sequential peeling (Batagelj-Zaversnik): repeatedly
    delete a minimum-degree vertex; its coreness is the running max of
    the degrees seen at deletion time.  Ground truth for the h-index
    fixpoint."""
    nbrs: dict[str, set[str]] = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    deg = {v: len(n) for v, n in nbrs.items()}
    core: dict[str, int] = {}
    k = 0
    while deg:
        v = min(deg, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        for u in nbrs[v]:
            if u in deg and u != v:
                deg[u] -= 1
        del deg[v]
    return core


def test_coreness_matches_peeling_ground_truth(spark):
    """4-clique + bridge + triangle + leaf: coreness 3 on the clique, 2
    on the bridge/triangle (the bridge vertex keeps degree 2, so the
    whole cycle-free middle still sits in the 2-core), 1 on the leaf —
    exactly what sequential peeling says; the parallel h-index fixpoint
    must agree vertex-for-vertex."""
    from python_fastly_log_query_spark.operators.webgraph import coreness

    edges = (
        [(a, b) for i, a in enumerate("ABCD") for b in "ABCD"[i + 1:]]  # K4
        + [("D", "E"), ("E", "F")]                                      # bridge
        + [("F", "G"), ("G", "H"), ("H", "F")]                          # C3
        + [("A", "X")]                                                  # leaf
    )
    df = spark.createDataFrame(
        [(s, d, 1) for s, d in edges], "src string, dst string, w long"
    )
    got = {r.host: r.coreness for r in coreness(df, rounds=8).collect()}
    assert got == _peel_coreness(edges)
    assert got["A"] == 3 and got["E"] == 2 and got["G"] == 2
    assert got["X"] == 1


def test_coreness_matches_peeling_on_pseudorandom_graph(spark):
    """Deterministic pseudorandom multigraph (direction + dup edges +
    self loops in the input): fixpoint equals peeling on the
    simple-graph reduction."""
    from python_fastly_log_query_spark.operators.webgraph import coreness

    raw = [
        (f"h{(7 * i) % 23}", f"h{(11 * i + 3) % 23}") for i in range(80)
    ] + [("h1", "h1"), ("h2", "h3"), ("h3", "h2")]
    simple = sorted({tuple(sorted(e)) for e in raw if e[0] != e[1]})
    df = spark.createDataFrame(
        [(s, d, 1) for s, d in raw], "src string, dst string, w long"
    )
    got = {r.host: r.coreness for r in coreness(df, rounds=8).collect()}
    assert got == _peel_coreness(simple)


def test_coreness_converged_at_registered_rounds(spark):
    """The registered config runs 8 rounds on the 37-host graph; the
    estimate is a fixpoint there (round 8 == round 9), which is what
    licenses calling the column 'coreness' rather than 'bound'."""
    from python_fastly_log_query_spark.operators.webgraph import (
        coreness, extract_outlinks)
    from python_fastly_log_query_spark.queries import _wg_pages_spark

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edges = extract_outlinks(_wg_pages_spark(docs))
    r8 = {r.host: r.coreness for r in coreness(edges, rounds=8).collect()}
    r9 = {r.host: r.coreness for r in coreness(edges, rounds=9).collect()}
    assert r8 == r9
    assert max(r8.values()) >= 2  # the ring structure holds a real core
