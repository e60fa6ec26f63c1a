"""k-NN graph over the trained quantizer
(operators/similarity.py:knn_graph_learned): the registered query
`embedding_knn_graph` carries the unrolled kmeans + multi-probe + rank
DuckDB oracle; these pin the graph semantics against a plain-Python
replica and the full-probe == brute-force degradation."""

import math

from python_fastly_log_query_spark.operators.similarity import (
    knn_graph_learned,
)
from tests.test_ivf_learned import _probe_py
from tests.test_kmeans import VECS, _emb, _kmeans_py


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


def _graph_py(vecs, k, n_cells, iters, nprobe):
    cents, assign = _kmeans_py(vecs, k=n_cells, iters=iters)
    home = {i: c for i, (_, c) in enumerate(assign)}
    out = {}
    for i in range(len(vecs)):
        probe = set(_probe_py(vecs, cents, i, nprobe))
        cand = [j for j in range(len(vecs)) if j != i and home[j] in probe]
        order = sorted(cand, key=lambda j: (-_cos(vecs[i], vecs[j]), j))[:k]
        out[i] = [
            (r + 1, j, math.floor(_cos(vecs[i], vecs[j]) * 10**4 + 0.5) / 10**4)
            for r, j in enumerate(order)
        ]
    return out


def test_full_probe_equals_brute_force_graph(spark):
    exp = _graph_py(VECS, k=3, n_cells=2, iters=2, nprobe=2)
    got = {}
    rows = knn_graph_learned(emb=_emb(spark, VECS), k=3, n_cells=2, iters=2, nprobe=2).collect()
    for r in rows:
        got.setdefault(r["vec_id"], []).append((r["rank"], r["nbr_id"], r["cosine"]))
    got = {i: sorted(v) for i, v in got.items()}
    assert got == exp
    # with full probe every vector has min(k, n-1) = 3 neighbors
    assert all(len(v) == 3 for v in got.values())


def test_pruned_probe_matches_python_replica(spark):
    exp = _graph_py(VECS, k=3, n_cells=2, iters=3, nprobe=1)
    rows = knn_graph_learned(
        emb=_emb(spark, VECS), k=3, n_cells=2, iters=3, nprobe=1
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["vec_id"], []).append((r["rank"], r["nbr_id"], r["cosine"]))
    got = {i: sorted(v) for i, v in got.items()}
    assert got == exp
    # pruning is real: some vector sees fewer candidates than the corpus
    assert any(len(v) < 3 for v in got.values()) or any(
        len(set(j for _, j, _ in v)) < len(VECS) - 1 for v in got.values()
    )


def test_random_projection_matches_python_replica(spark):
    import hashlib
    import math

    from python_fastly_log_query_spark.operators.similarity import (
        KMEANS_SCALE,
        random_projection,
    )

    vecs = {0: [0.5, -1.25, 2.0, 0.125], 1: [1.0, 1.0, -1.0, 0.0]}
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: [r.p00, r.p01, r.p02] for r in
           random_projection(emb, out_dim=3, dim=4).collect()}

    def plane(k, d):
        return [1 if int(hashlib.md5(f"{k}:{i}".encode()).hexdigest()[0], 16) >= 8
                else -1 for i in range(d)]

    for vid, v in vecs.items():
        q = [math.floor(x * KMEANS_SCALE + 0.5) for x in v]
        want = [sum(a * s for a, s in zip(q, plane(1000 + j, 4)))
                for j in range(3)]
        assert got[vid] == want, (vid, got[vid], want)
