"""Invariants for deterministic sampling/splitting
(operators/sampling.py): per-row membership is a pure function of the
salted id hash — stable across runs and under corpus growth."""

from pyspark.sql import functions as F

from python_fastly_log_query_spark.operators.sampling import (
    capped_per_group,
    hash_sample,
    split_assign,
)


def _docs(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias("source"),
    )


def test_split_is_stable_under_corpus_growth(spark):
    small = {r["doc_id"]: r["split"] for r in split_assign(_docs(spark, 200)).collect()}
    big = {r["doc_id"]: r["split"] for r in split_assign(_docs(spark, 400)).collect()}
    assert all(big[d] == s for d, s in small.items())
    # all three splits populated at plausible mass
    from collections import Counter

    c = Counter(big.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_hash_sample_membership_is_per_row(spark):
    # a doc's membership never depends on what else is in the corpus
    small = {r["doc_id"] for r in hash_sample(_docs(spark, 200), 30).collect()}
    big = {r["doc_id"] for r in hash_sample(_docs(spark, 400), 30).collect()}
    assert {d for d in big if d < 200} == small
    assert 0 < len(small) < 200


def test_capped_per_group_bounds_and_stability(spark):
    kept = capped_per_group(_docs(spark, 500), "source", 10)
    per = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v <= 10 for v in per.values()) and len(per) == 5
    # deterministic: same set on a second evaluation
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in capped_per_group(_docs(spark, 500), "source", 10).collect()}
    assert a == b
    # growth may displace but never reorder survivors: the kept set of
    # the superset, restricted to old ids, is a subset of the old kept set
    grown = {r["doc_id"] for r in capped_per_group(_docs(spark, 800), "source", 10).collect()}
    assert {d for d in grown if d < 500} <= a


def test_capped_group_smaller_than_k_keeps_all(spark):
    docs = _docs(spark, 20)  # 4 docs per group, k=10
    assert capped_per_group(docs, "source", 10).count() == 20
