"""In-engine BPE training (operators/bpe.py) vs a plain-Python
canonical reference — pins the double-space replace trick to real
leftmost non-overlapping BPE semantics, including same-symbol runs."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from python_fastly_log_query_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
    merge_repr,
    to_repr,
)


def _ref_merge(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, k):
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    words = {tuple(list(w) + ["</w>"]): f for w, f in wf.items()}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (l, r), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, l + r, cnt))
        new = {}
        for syms, f in words.items():
            t = tuple(_ref_merge(list(syms), l, r))
            new[t] = new.get(t, 0) + f
        words = new
    return merges


# runs of identical chars, back-to-back pairs, and shared prefixes —
# the cases where a naive single-space replace diverges from BPE
TRICKY = [
    "aaaa aaa aa abab ab",
    "banana bandana ananas",
    "low lower lowest newest newer",
    "aaaa abab banana low",
]


def test_bpe_train_matches_canonical(spark):
    docs = spark.createDataFrame([(t,) for t in TRICKY], "text string")
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.cnt)
        for r in bpe_train(spark, docs, num_merges=8).orderBy("rank").collect()
    ]
    assert got == _ref_train(TRICKY, 8)


def test_merge_repr_run_semantics(spark):
    # ' a  a  a ' merges leftmost-first: (aa)(a), then 4 a's -> (aa)(aa)
    df = spark.createDataFrame([("aaa",), ("aaaa",), ("aaaaa",)], "w string")
    out = df.select(
        F.split(
            F.trim(merge_repr(to_repr("w"), "a", "a")), "  "
        ).alias("syms")
    ).collect()
    assert [r.syms for r in out] == [
        ["aa", "a", "</w>"],
        ["aa", "aa", "</w>"],
        ["aa", "aa", "a", "</w>"],
    ]


def test_bpe_apply_matches_reference_tokenization(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY)], "doc_id long, text string"
    )
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_train(spark, docs, num_merges=8).orderBy("rank").collect()
    ]
    got = {
        r.doc_id: r.tokens
        for r in bpe_apply(docs, merges).select("doc_id", "tokens").collect()
    }

    def ref_tok(w):
        syms = list(w) + ["</w>"]
        for l, r in merges:
            syms = _ref_merge(syms, l, r)
        return syms

    for i, t in enumerate(TRICKY):
        want = [s for w in t.split(" ") if w for s in ref_tok(w)]
        assert got[i] == want, (i, got[i], want)
