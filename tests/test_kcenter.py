"""Greedy k-center contracts (operators/similarity.py:kcenter_select):
the traversal must equal a plain-Python farthest-point reference on the
real fixture (same seed, argmax, and tie rules), radii must decrease
monotonically, and the assignment must cover every vector.  The
cross-engine value oracle for kcenter_diverse_sample runs in
test_oracle_parity."""

import numpy as np

from conftest import SF_SMALL

from python_fastly_log_query_spark.operators.similarity import (
    KMEANS_SCALE,
    kcenter_select,
    kcenter_table,
)


def _quantized_fixture(spark):
    rows = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    Q = np.array(
        [
            [int(np.floor(float(x) * KMEANS_SCALE + 0.5)) for x in r["embedding"]]
            for r in rows
        ],
        dtype=np.int64,
    )
    return ids, Q


def _reference_kcenter(ids, Q, k):
    """Plain-Python farthest-point traversal: seed = lowest id, argmax of
    min-distance with ties to the HIGHEST id."""
    order = np.argsort(ids)
    ids, Q = ids[order], Q[order]
    chosen = [0]  # lowest id
    radii = [0]
    d = ((Q - Q[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        best = max(range(len(ids)), key=lambda i: (d[i], ids[i]))
        chosen.append(best)
        radii.append(int(d[best]))
        d = np.minimum(d, ((Q - Q[best]) ** 2).sum(axis=1))
    return [int(ids[i]) for i in chosen], radii


def test_kcenter_matches_reference_traversal(spark):
    ids, Q = _quantized_fixture(spark)
    want_ids, want_radii = _reference_kcenter(ids, Q, 8)
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    centers, _ = kcenter_select(emb, k=8)
    assert [c["id"] for c in centers] == want_ids
    assert [c["radius_q"] for c in centers] == want_radii
    # coverage radius shrinks (weakly) every round after the seed
    got = [c["radius_q"] for c in centers][1:]
    assert all(a >= b for a, b in zip(got, got[1:]))


def test_kcenter_table_counts_cover_all_vectors(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    out = kcenter_table(spark, emb, k=8).collect()
    assert len(out) == 8
    assert sum(r["n_assigned"] for r in out) == emb.count()
    # every selected center is assigned (at least to itself)
    assert all(r["n_assigned"] >= 1 for r in out)
