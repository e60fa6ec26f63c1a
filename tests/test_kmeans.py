"""Integer-exact Lloyd's k-means (operators/similarity.py:kmeans_fit /
kmeans_assign): the registered query `embedding_kmeans` carries the
unrolled-fixpoint DuckDB oracle; these pin the training semantics
against a plain-Python replica and the partitioning-invariance /
empty-cell rules the oracle alone doesn't state."""

from pyspark.sql import functions as F  # noqa: F401

from python_fastly_log_query_spark.operators.similarity import (
    KMEANS_SCALE,
    kmeans_assign,
    kmeans_fit,
)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _kmeans_py(vecs, k, iters, scale=KMEANS_SCALE):
    """Reference Lloyd's in plain Python ints: quantize round-half-up,
    init = k lowest ids, argmin squared-L2 with ties to the lowest
    cell, floor-division mean update, empty cells keep their centroid."""
    import math

    q = [[math.floor(x * scale + 0.5) for x in v] for v in vecs]
    cents = [list(q[i]) for i in range(k)]

    def assign():
        out = []
        for v in q:
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)), j)
                for j, c in enumerate(cents)
            )
            out.append(best)
        return out

    for _ in range(iters):
        cells = [c for _, c in assign()]
        for j in range(k):
            members = [q[i] for i, c in enumerate(cells) if c == j]
            if members:
                cents[j] = [
                    sum(col) // len(members) for col in zip(*members)
                ]
    return cents, assign()


# two tight planted clusters + one straggler, in 4-d
VECS = [
    [0.9, 0.1, 0.0, 0.0],
    [-0.1, 0.8, 0.1, 0.0],
    [0.88, 0.12, 0.01, 0.0],
    [0.91, 0.09, -0.02, 0.0],
    [-0.12, 0.82, 0.09, 0.01],
    [-0.09, 0.79, 0.11, -0.01],
    [0.1, 0.1, 0.9, 0.4],
]


def test_kmeans_matches_python_reference(spark):
    emb = _emb(spark, VECS)
    exp_cents, exp_assign = _kmeans_py(VECS, k=2, iters=3)
    cents = kmeans_fit(emb, k=2, iters=3)
    assert cents == exp_cents
    got = {
        r["vec_id"]: (r["cell"], r["dist_sq"])
        for r in kmeans_assign(emb, cents).collect()
    }
    assert got == {i: (c, d) for i, (d, c) in enumerate(exp_assign)}
    # the planted geometry actually separates: ids 0,2,3 together,
    # 1,4,5 together, and the straggler lands with one of them
    assert got[0][0] == got[2][0] == got[3][0]
    assert got[1][0] == got[4][0] == got[5][0]
    assert got[0][0] != got[1][0]


def test_kmeans_partitioning_invariant(spark):
    emb = _emb(spark, VECS)
    plain = kmeans_fit(emb, k=2, iters=2)
    parts = kmeans_fit(emb.repartition(5), k=2, iters=2)
    # associative integer arithmetic end to end: the FIT (not just the
    # assignment) is bit-identical under any partitioning
    assert plain == parts


def test_semdedup_learned_matches_python_scan(spark):
    from python_fastly_log_query_spark.operators.similarity import (
        semdedup_learned,
    )

    emb = _emb(spark, VECS)
    _, assign = _kmeans_py(VECS, k=2, iters=3)

    def cos(a, b):
        import math

        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    tau = 0.9
    expect = {}
    for i, (_, c) in enumerate(assign):
        members = [
            (d, j) for j, (d, cj) in enumerate(assign) if cj == c
        ]
        # scan order: farthest-from-centroid first, ties to lowest id
        order = sorted(members, key=lambda t: (-t[0], t[1]))
        pos = {j: p for p, (_, j) in enumerate(order)}
        expect[i] = (
            c,
            int(
                any(
                    cos(VECS[j], VECS[i]) > tau
                    for _, j in order
                    if pos[j] < pos[i]
                )
            ),
        )
    got = {
        r["vec_id"]: (r["cell"], r["is_dup"])
        for r in semdedup_learned(emb, threshold=tau, k=2, iters=3).collect()
    }
    assert got == expect
    # the planted geometry has real dups: at least one vector dropped
    # and the outlier-most member of every cell always survives
    assert any(v[1] == 1 for v in got.values())
    for c in {v[0] for v in got.values()}:
        outlier = max(
            (d, j) for j, (d, cj) in enumerate(assign) if cj == c
        )[1]
        assert got[outlier][1] == 0


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    # k=3 over two tight planted clusters: init takes ids 0,1,2 but ids
    # 0 and 2 are the same cluster, so one cell starves after the first
    # update and must keep its previous centroid (not NaN/zero)
    vecs = VECS[:6]
    emb = _emb(spark, vecs)
    exp_cents, exp_assign = _kmeans_py(vecs, k=3, iters=3)
    cents = kmeans_fit(emb, k=3, iters=3)
    assert cents == exp_cents
    got = {r["vec_id"]: r["cell"] for r in kmeans_assign(emb, cents).collect()}
    assert got == {i: c for i, (_, c) in enumerate(exp_assign)}
