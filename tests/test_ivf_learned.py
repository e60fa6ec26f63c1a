"""IVF ANN over the TRAINED coarse quantizer
(operators/similarity.py:ivf_learned_topk): kmeans_fit centroids replace
ivf_assign's deterministic codebook — the exact "swap in trained
centroids at deploy time" composition ivf_assign's docstring defers to.
The registered query `embedding_ivf_learned_topk` carries the unrolled
kmeans-fixpoint + probe + rank DuckDB oracle; these pin probe selection
and the recall contract the oracle alone doesn't state."""

import math

from python_fastly_log_query_spark.operators.similarity import (
    KMEANS_SCALE,
    brute_topk,
    ivf_learned_topk,
    kmeans_fit,
)
from tests.test_kmeans import VECS, _emb, _kmeans_py


def _probe_py(vecs, cents, qid, nprobe, scale=KMEANS_SCALE):
    """Reference probe selection: integer L2 from the query's quantized
    vector to every trained centroid, ties to the lowest cell."""
    qv = [math.floor(x * scale + 0.5) for x in vecs[qid]]
    d = sorted(
        (sum((a - b) ** 2 for a, b in zip(qv, c)), j)
        for j, c in enumerate(cents)
    )
    return [j for _, j in d[:nprobe]]


def test_full_probe_equals_brute_force(spark):
    """nprobe == n_cells degrades to exact brute-force ranking — the
    trained quantizer only prunes, never re-ranks."""
    emb = _emb(spark, VECS)
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_learned_topk(
            emb, 0, 5, n_cells=2, iters=2, nprobe=2
        ).collect()
    ]
    brute = [(r["vec_id"], r["cosine"]) for r in brute_topk(emb, 0, 5).collect()]
    assert got == brute


def test_probe_pruning_matches_python_replica(spark):
    """nprobe=1 scans exactly the query's own trained cell: results are
    the within-cell cosine ranking of the Python replica's members."""
    emb = _emb(spark, VECS)
    cents = kmeans_fit(emb, k=2, iters=3)
    exp_cents, exp_assign = _kmeans_py(VECS, k=2, iters=3)
    assert cents == exp_cents
    probe = _probe_py(VECS, cents, qid=0, nprobe=1)
    members = [
        j for j, (_, c) in enumerate(exp_assign) if c in probe
    ]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    order = sorted(members, key=lambda j: (-cos(VECS[j], VECS[0]), j))
    got = [
        r["vec_id"]
        for r in ivf_learned_topk(
            emb, 0, 10, n_cells=2, iters=3, nprobe=1
        ).collect()
    ]
    assert got == order
    # pruning is real: the other cell's members never appear
    assert not set(got) & {
        j for j, (_, c) in enumerate(exp_assign) if c not in probe
    }


def test_graph_expand_recall_at_least_ivf(spark):
    from conftest import SF_SMALL

    from python_fastly_log_query_spark.operators.similarity import (
        graph_expand_topk,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    truth = {r.vec_id for r in brute_topk(emb, 0, 10).collect()}
    ivf = {r.vec_id for r in ivf_learned_topk(emb, 0, 10, n_cells=8, iters=3, nprobe=2).collect()}
    gx = {
        r.vec_id
        for r in graph_expand_topk(
            emb, 0, k=10, n_seeds=5, n_cells=8, iters=3, nprobe=2, graph_k=3
        ).collect()
    }
    r_ivf = len(ivf & truth) / 10
    r_gx = len(gx & truth) / 10
    # expansion can only add candidates the seed rank then re-cuts; demand
    # a floor and no catastrophic loss vs plain IVF
    assert r_gx >= 0.5
    assert r_gx >= r_ivf - 0.2
