"""Containment near-dup family (operators/corpus.py:containment_pairs):
directionality, exact-1000 planted excerpts, and the Jaccard-blindness
case the family exists for.
"""

from __future__ import annotations

from python_fastly_log_query_spark.operators.corpus import containment_pairs

WORDS = [f"w{i}" for i in range(40)]
LONG = " ".join(WORDS)  # doc 1: 40 distinct words -> 37 4-grams
EXCERPT = " ".join(WORDS[10:18])  # doc 2: words 11..18 of doc 1 -> 5 4-grams
OTHER = " ".join(f"z{i}" for i in range(40))  # doc 3: disjoint


def _docs(spark):
    return spark.createDataFrame(
        [(1, LONG), (2, EXCERPT), (3, OTHER)], "doc_id long, text string"
    )


def test_excerpt_scores_exactly_1000_and_is_directional(spark):
    rows = {
        (r.doc_a, r.doc_b): r
        for r in containment_pairs(
            _docs(spark), ngram=4, df_cap=50,
            min_containment_k=0, min_evidence=1,
        ).collect()
    }
    # excerpt-in-long: every one of the 5 excerpt shingles is a
    # contiguous shingle of the long doc -> containment exactly 1000
    fwd = rows[(2, 1)]
    assert (fwd.shared_shingles, fwd.evidence_size, fwd.containment_k) == (
        5, 5, 1000,
    )
    # reverse direction: same 5 shared shingles over the long doc's 37
    # -> 135 per mille.  Directionality is the family's point: the
    # symmetric Jaccard of this pair is 5/37 ~ 0.135 — invisible to
    # every MinHash/SimHash threshold that means "near-duplicate".
    rev = rows[(1, 2)]
    assert (rev.shared_shingles, rev.evidence_size) == (5, 37)
    assert rev.containment_k == 5 * 1000 // 37
    # disjoint doc pairs with nothing shared never appear
    assert (3, 1) not in rows and (1, 3) not in rows


def test_thresholds_gate_both_branches(spark):
    out = containment_pairs(
        _docs(spark), ngram=4, df_cap=50,
        min_containment_k=800, min_evidence=3,
    ).collect()
    assert [(r.doc_a, r.doc_b, r.containment_k) for r in out] == [(2, 1, 1000)]


def test_df_cap_drops_common_shingles_from_evidence(spark):
    """A shingle present in > df_cap docs leaves the index entirely:
    numerator AND denominator shrink together, so a planted excerpt
    keeps containment 1000 even when some of its shingles are common."""
    boiler = " ".join(WORDS[10:14])  # one 4-gram, made common below
    docs = spark.createDataFrame(
        [(1, LONG), (2, EXCERPT)] + [(100 + i, boiler) for i in range(5)],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_a, r.doc_b): r
        for r in containment_pairs(
            docs, ngram=4, df_cap=3, min_containment_k=0, min_evidence=1
        ).collect()
    }
    fwd = rows[(2, 1)]
    # the boiler shingle (df=7 > 3) fell out of the indexed universe:
    # 4 rare shingles shared of 4 indexed -> still exactly 1000
    assert (fwd.shared_shingles, fwd.evidence_size, fwd.containment_k) == (
        4, 4, 1000,
    )
