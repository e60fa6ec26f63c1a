"""Invariants for deterministic sampling/splitting
(operators/sampling.py): per-row membership is a pure function of the
salted id hash — stable across runs and under corpus growth."""

from pyspark.sql import functions as F

from conftest import SF_SMALL

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


def _lang_docs(spark, n):
    langs = ["en", "en", "en", "zh", "xx"]  # en-heavy + one unplanned lang
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("w1 w2 w3 w4").alias("text"),  # 4 tokens each
        F.element_at(
            F.array(*[F.lit(l) for l in langs]), (F.col("id") % 5 + 1).cast("int")
        ).alias("lang"),
    )


def test_mixture_rates_integer_plan(spark):
    from python_fastly_log_query_spark.operators.sampling import mixture_rates

    docs = _lang_docs(spark, 100)  # en: 60 docs * 4 tok, zh: 20 * 4, xx: 20 * 4
    rates = {
        r["lang"]: r
        for r in mixture_rates(docs, 100, {"en": 500000, "zh": 500000}).collect()
    }
    # xx is not in the plan -> no row
    assert set(rates) == {"en", "zh"}
    assert rates["en"]["actual_tokens"] == 240 and rates["zh"]["actual_tokens"] == 80
    # target 50 tokens each: en downsamples (50/240), zh too (50/80)
    assert rates["en"]["target_tokens"] == 50 and rates["zh"]["target_tokens"] == 50
    assert rates["en"]["rate_ppm"] == 50 * 1_000_000 // 240
    assert rates["zh"]["rate_ppm"] == 50 * 1_000_000 // 80
    # under-target language caps at keep-everything
    cap = {
        r["lang"]: r["rate_ppm"]
        for r in mixture_rates(docs, 10_000, {"en": 500000}).collect()
    }
    assert cap["en"] == 1_000_000


def test_mixture_resample_deterministic_and_near_target(spark):
    from python_fastly_log_query_spark.operators.sampling import (
        mixture_resample_report,
    )

    docs = _lang_docs(spark, 2000)
    shares = {"en": 600000, "zh": 400000}
    a = {
        r["lang"]: tuple(r)
        for r in mixture_resample_report(docs, 1000, shares).collect()
    }
    b = {
        r["lang"]: tuple(r)
        for r in mixture_resample_report(
            docs.repartition(7), 1000, shares
        ).collect()
    }
    assert a == b  # partitioning-invariant
    for lang, share in (("en", 600), ("zh", 400)):
        row = dict(
            zip(
                ["lang", "actual_tokens", "target_tokens", "rate_ppm",
                 "sampled_docs", "sampled_tokens"],
                a[lang],
            )
        )
        assert row["target_tokens"] == share
        # hash sampling concentrates near the target (4-token docs,
        # ~150-250 kept rows: allow generous binomial slack)
        assert 0.5 * share <= row["sampled_tokens"] <= 1.5 * share


# ------------------------------------------------- PPS systematic sample


def test_pps_sample_size_and_multiplicity(spark):
    from python_fastly_log_query_spark.operators.corpus import (
        pps_systematic_sample,
    )

    # 1000 docs, weight 10 each + one whale of weight 5000:
    # total = 15000, n = 30 -> step = 500; the whale covers 10 grid pts
    rows = [(i, 10) for i in range(1000)] + [(5000, 5000)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = pps_systematic_sample(docs, n=30).collect()
    hits = {r["doc_id"]: r["n_hits"] for r in out}
    total_hits = sum(hits.values())
    assert total_hits in (30, 31)  # fixed size by construction
    assert hits[5000] == 10  # multiplicity = weight div step exactly
    # every other sampled doc hit once (w=10 << step=500)
    assert all(v == 1 for k, v in hits.items() if k != 5000)


def test_pps_heavy_doc_always_included_and_zero_excluded(spark):
    from python_fastly_log_query_spark.operators.corpus import (
        pps_systematic_sample,
    )

    rows = [(i, 5) for i in range(200)] + [(900, 600), (901, 0)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {r["doc_id"]: r["n_hits"] for r in
           pps_systematic_sample(docs, n=4).collect()}
    # total=1600, step=400: doc 900 (w=600 >= step) MUST be sampled
    assert out.get(900, 0) >= 1
    assert 901 not in out  # zero weight -> zero inclusion probability


def test_pps_partitioning_invariant(spark):
    from python_fastly_log_query_spark.operators.corpus import (
        pps_systematic_sample,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = {
        (r["doc_id"], r["n_hits"])
        for r in pps_systematic_sample(docs, n=50).collect()
    }
    b = {
        (r["doc_id"], r["n_hits"])
        for r in pps_systematic_sample(docs.repartition(16), n=50).collect()
    }
    assert a == b and len(a) >= 50
