"""BM25 ranked retrieval (operators/corpus.py:bm25_topk): the registered
query `bm25_search_topk` carries the full-corpus DuckDB oracle; these pin
the scoring arithmetic against a plain-Python replica and the
candidate-set / determinism rules the oracle alone doesn't state."""

import math

from python_fastly_log_query_spark.operators.corpus import (
    BM25_B,
    BM25_K1,
    bm25_topk,
)

DOCS = [
    (0, "vector hash stream vector vector"),
    (1, "hash join sort merge hash"),
    (2, "stream stream stream stream"),
    (3, "table scan filter group"),
    (4, "vector"),
    (5, "hash vector stream hash vector table scan join"),
]
TERMS = ["vector", "hash", "stream"]


def _bm25_py(docs, terms, k1=BM25_K1, b=BM25_B):
    toks = {i: t.split(" ") for i, t in docs}
    n = len(toks)
    totlen = sum(len(t) for t in toks.values())
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    out = {}
    for i, w in toks.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            s = s + idf * (tf * (k1 + 1)) / (
                tf + k1 * ((1 - b) + b * (len(w) * n / totlen))
            )
        if any(t in w for t in terms):
            out[i] = s
    return out


def _emb(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_python_replica(spark):
    exp = _bm25_py(DOCS, TERMS)
    order = sorted(exp, key=lambda i: (-exp[i], i))
    rows = bm25_topk(_emb(spark), TERMS, k=10).collect()
    assert [r["doc_id"] for r in rows] == order
    for r in rows:
        want = math.floor(abs(exp[r["doc_id"]]) * 10**4 + 0.5) / 10**4
        assert r["bm25"] == want, (r["doc_id"], r["bm25"], exp[r["doc_id"]])


def test_bm25_candidate_set_excludes_nonmatching_docs(spark):
    rows = bm25_topk(_emb(spark), TERMS, k=10).collect()
    ids = {r["doc_id"] for r in rows}
    # doc 3 contains none of the query terms: never a candidate
    assert 3 not in ids
    assert ids == {0, 1, 2, 4, 5}


def test_bm25_rare_term_outranks_common_at_equal_tf(spark):
    # one doc holds the corpus's only 'vector'; the rest share 'hash' —
    # rarer term => higher idf => higher score at identical tf and dl
    docs = [(0, "vector pad pad"), (1, "hash pad pad")] + [
        (i, "hash pad pad") for i in range(2, 8)
    ]
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(frame, ["vector", "hash"], k=10).collect()
    }
    assert got[0] > got[1]
