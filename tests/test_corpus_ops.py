"""Invariants for the corpus-cleaning operators (operators/corpus.py):
duplicate-n-gram stats, decontamination overlap, sequence packing, and
bloom-prefiltered incremental dedup.  The registered queries carry full
DuckDB value oracles (tests/test_oracle_parity.py); these tests pin the
semantic properties the oracles alone don't state."""

import pytest
from pyspark.sql import functions as F

from python_fastly_log_query_spark.operators.corpus import (
    bloom_bitset,
    bloom_params,
    contamination_stats,
    dup_ngram_stats,
    incremental_dedup_bloom,
    pack_sequences,
    packed_seq_stats,
    span_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


# ------------------------------------------------------- dup_ngram_stats


def test_dup_ngram_counts_known_corpus(spark):
    # docs 0 and 1 share their whole text; doc 2 shares nothing
    rows = [
        "a b c d e f",          # 5-grams: "a b c d e", "b c d e f"
        "a b c d e f",
        "p q r s t u",
    ]
    out = {r["doc_id"]: r for r in dup_ngram_stats(_docs(spark, rows), n=5).collect()}
    assert out[0]["n_ngrams"] == 2 and out[0]["dup_ngrams"] == 2
    assert out[0]["dup_frac"] == 1.0
    assert out[2]["dup_ngrams"] == 0 and out[2]["dup_frac"] == 0.0


def test_dup_ngram_short_doc_is_whole_text_gram(spark):
    # under n words the whole text is the single "gram"
    rows = ["tiny doc", "tiny doc", "other one"]
    out = {r["doc_id"]: r for r in dup_ngram_stats(_docs(spark, rows), n=5).collect()}
    assert out[0]["n_ngrams"] == 1 and out[0]["dup_ngrams"] == 1
    assert out[2]["dup_ngrams"] == 0


# --------------------------------------------------- contamination_stats


def test_contamination_counts_shared_grams(spark):
    train = _docs(spark, ["a b c d", "x y z w"])
    ev = spark.createDataFrame([(100, "a b c q")], "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in contamination_stats(train, ev, n=3).collect()
    }
    # train doc 0 grams: "a b c", "b c d" — only the first is in eval
    assert out[0]["n_ngrams"] == 2 and out[0]["contaminated"] == 1
    assert out[0]["contamination_frac"] == 0.5
    assert out[1]["contaminated"] == 0


# -------------------------------------------------------- pack_sequences


def _pack_df(spark, n=60, ctx=16, buckets=4):
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # 1..9 words, deterministic
        F.concat_ws(
            " ", F.array_repeat(F.lit("w"), (F.col("id") % 9 + 1).cast("int"))
        ).alias("text"),
    )
    return pack_sequences(docs, ctx_tokens=ctx, buckets=buckets)


def test_packing_is_contiguous_within_bucket(spark):
    ctx = 16
    rows = _pack_df(spark, ctx=ctx).orderBy("bucket", "doc_id").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert len(by_bucket) > 1
    for bucket, rs in by_bucket.items():
        cum = 0
        for r in rs:
            # doc occupies tokens [cum, cum + n_tokens) of the bucket stream
            assert r["start_seq"] == cum // ctx
            assert r["tok_offset"] == cum % ctx
            cum += r["n_tokens"]
            assert r["end_seq"] == (cum - 1) // ctx


def test_packing_invariant_under_input_partitioning(spark):
    a = {r["doc_id"]: tuple(r) for r in _pack_df(spark).collect()}
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("w"), (F.col("id") % 9 + 1).cast("int"))
        ).alias("text"),
    ).repartition(7)
    b = {
        r["doc_id"]: tuple(r)
        for r in pack_sequences(docs, ctx_tokens=16, buckets=4).collect()
    }
    assert a == b


def test_packed_seq_stats_conserves_tokens(spark):
    packed = _pack_df(spark, ctx=16)
    stats = packed_seq_stats(packed, ctx_tokens=16).collect()
    total = sum(r["total_tokens"] for r in stats)
    direct = _pack_df(spark, ctx=16).agg(F.sum("n_tokens")).collect()[0][0]
    assert total == direct
    for r in stats:
        assert 0 < r["fill_ratio"] <= 1.0
        # tokens fit the allocated windows, and the allocation is tight:
        # dropping the last (ragged) window would not fit
        assert r["total_tokens"] <= r["n_seqs"] * 16
        assert r["total_tokens"] > (r["n_seqs"] - 1) * 16


# ----------------------------------------------------------- bloom dedup


def test_bloom_params_power_of_two_and_monotone(spark):
    m1, k = bloom_params(100)
    m2, _ = bloom_params(10_000)
    assert m1 & (m1 - 1) == 0 and m2 & (m2 - 1) == 0
    assert m2 > m1 >= 100 * 10 // 2 and k == 5


def test_bloom_bitset_oversize_raises(spark):
    fps = spark.createDataFrame([("x",)], "fp string")
    with pytest.raises(ValueError, match="max_bits"):
        bloom_bitset(fps, 1 << 31, 5, max_bits=1 << 30)


def test_incremental_bloom_no_false_negatives_and_exact_verify(spark):
    # corpus: 200 docs; batch: 100 re-crawled dups + 100 genuinely new
    corpus = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    batch = spark.range(100).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.concat(F.lit("doc "), (F.col("id") * 2).cast("string")).alias("text"),
    ).union(
        spark.range(100).select(
            (F.col("id") + 2000).alias("doc_id"),
            F.concat(F.lit("new "), F.col("id").cast("string")).alias("text"),
        )
    )
    out = {r["doc_id"]: r for r in incremental_dedup_bloom(corpus, batch).collect()}
    assert len(out) == 200
    for i in range(100):
        dup = out[1000 + i]
        assert dup["is_dup"] == 1 and dup["bloom_maybe"] == 1  # no false negatives
    for i in range(100):
        assert out[2000 + i]["is_dup"] == 0  # verify kills false positives
    # the prefilter actually prunes: most new docs never reach the verify
    maybes = sum(r["bloom_maybe"] for r in out.values())
    assert maybes < 200


# ------------------------------------------------------------ span dedup


def _span_dedup_py(rows, k):
    """Reference keep-first span dedup in plain Python."""
    seen = set()
    out = {}
    for doc_id, text in enumerate(rows):
        ws = text.split()
        spans = [" ".join(ws[i : i + k]) for i in range(0, len(ws), k)]
        kept = []
        for s in spans:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        out[doc_id] = (len(spans), len(kept), " ".join(kept) if kept else None)
    return out


def test_span_dedup_matches_python_reference(spark):
    import hashlib

    rows = [
        "a b c d e f g h",            # spans (k=4): "a b c d", "e f g h"
        "a b c d x y z w",            # first span repeated -> dropped
        "a b c d e f g h",            # fully duplicated -> doc dropped
        "m n",                        # ragged single span
    ]
    expect = _span_dedup_py(rows, 4)
    got = {
        r["doc_id"]: r for r in span_dedup(_docs(spark, rows), span_tokens=4).collect()
    }
    assert set(got) == set(expect)
    for d, (n, kept, clean) in expect.items():
        assert got[d]["n_spans"] == n
        assert got[d]["kept_spans"] == kept
        want_md5 = hashlib.md5(clean.encode()).hexdigest() if clean else None
        assert got[d]["clean_md5"] == want_md5


def test_span_dedup_keep_first_is_global_doc_order(spark):
    # the keeper is the lowest (doc_id, pos) — doc 0 keeps, doc 1 drops,
    # regardless of input partitioning
    rows = ["s1 s2 s3 s4", "s1 s2 s3 s4"]
    base = _docs(spark, rows)
    for df in (base, base.repartition(5)):
        got = {r["doc_id"]: r for r in span_dedup(df, span_tokens=4).collect()}
        assert got[0]["kept_spans"] == 1 and got[1]["kept_spans"] == 0
        assert got[1]["clean_md5"] is None


def test_span_dedup_ragged_tail_distinct_from_prefix(spark):
    # "a b" as a ragged tail span is NOT the same span as "a b c d"
    rows = ["a b c d", "a b"]
    got = {r["doc_id"]: r for r in span_dedup(_docs(spark, rows), span_tokens=4).collect()}
    assert got[0]["kept_spans"] == 1 and got[1]["kept_spans"] == 1


# ------------------------------------------- exact duplicated substrings


def _dup_spans_py(rows, L, min_count=2):
    """Reference ExactSubstr detection in plain Python: stride-1 L-word
    windows, corpus-wide counts, per-doc maximal runs of duplicated
    positions."""
    from collections import Counter

    wins = []
    for doc_id, text in enumerate(rows):
        ws = text.split(" ")
        for i in range(len(ws) - L + 1):
            wins.append((doc_id, i, " ".join(ws[i : i + L])))
    counts = Counter(g for _, _, g in wins)
    spans = set()
    for doc_id, _ in enumerate(rows):
        dup = sorted(p for d, p, g in wins if d == doc_id and counts[g] >= min_count)
        run = []
        for p in dup + [None]:
            if run and (p is None or p != run[-1] + 1):
                spans.add((doc_id, run[0], run[-1] + L - 1, run[-1] - run[0] + L))
                run = []
            if p is not None:
                run.append(p)
    return spans


def test_duplicated_spans_matches_python_reference(spark):
    from python_fastly_log_query_spark.operators.corpus import duplicated_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 words
    rows = [
        "intro words here " + shared + " unique tail zero",
        shared + " completely different ending for doc one",
        # internal repetition: the same 8-word run twice inside ONE doc
        "x1 x2 x3 x4 x5 x6 x7 x8 filler x1 x2 x3 x4 x5 x6 x7 x8",
        "entirely unrelated clean document with no duplicated runs at all",
        "short doc",  # under 8 words -> no windows, no rows
    ]
    expect = _dup_spans_py(rows, L=8)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_words"])
        for r in duplicated_spans(_docs(spark, rows), min_words=8).collect()
    }
    assert got == expect
    # the Lee et al. guarantee on this corpus: the shared 10-word run is
    # reported as ONE maximal span per occurrence, at its exact offsets
    assert (0, 3, 12, 10) in got and (1, 0, 9, 10) in got
    assert not any(d == 3 or d == 4 for d, *_ in got)


def test_duplicated_spans_partitioning_invariant_and_equi_join(spark):
    from python_fastly_log_query_spark.operators.corpus import duplicated_spans

    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    rows = [shared + " a", "b " + shared, "clean c d e f g h i j k"]
    base = _docs(spark, rows)
    plain = duplicated_spans(base, min_words=8).collect()
    parts = duplicated_spans(base.repartition(7), min_words=8).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, parts))
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        duplicated_spans(base, min_words=8).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicated_token_stats_interval_union(spark):
    from python_fastly_log_query_spark.operators.corpus import (
        duplicated_token_stats,
    )

    # doc 0's duplicated windows sit at positions 0 and 3 (via docs 1/2);
    # positions 1-2 are unique, so the two maximal spans [0,7] and [3,10]
    # OVERLAP in word coverage — dup_tokens must be the 11-word union,
    # not the 16-word sum
    rows = [
        "a1 a2 a3 a4 a5 a6 a7 a8 b1 b2 b3 t1 t2 t3",
        "a1 a2 a3 a4 a5 a6 a7 a8",
        "a4 a5 a6 a7 a8 b1 b2 b3",
        "clean doc under the window width",
    ]
    got = {
        r["doc_id"]: r
        for r in duplicated_token_stats(_docs(spark, rows), min_words=8).collect()
    }
    assert set(got) == {0, 1, 2, 3}  # one row per corpus doc
    assert got[0]["n_tokens"] == 14 and got[0]["dup_spans"] == 2
    assert got[0]["dup_tokens"] == 11 and got[0]["dup_frac"] == 0.7857
    assert got[1]["dup_tokens"] == 8 and got[1]["dup_frac"] == 1.0
    assert got[3]["dup_spans"] == 0 and got[3]["dup_tokens"] == 0
    assert got[3]["dup_frac"] == 0.0


def _substr_dedup_py(rows, L, keep="first", min_count=2):
    """Reference ExactSubstr removal in plain Python: keeper = first
    (doc_id, pos) occurrence of each duplicated window key; a token
    survives if any covering window is clean or a keeper occurrence."""
    from collections import Counter, defaultdict

    wins = []
    for doc_id, text in enumerate(rows):
        ws = text.split(" ")
        for i in range(len(ws) - L + 1):
            wins.append((doc_id, i, " ".join(ws[i : i + L])))
    counts = Counter(g for _, _, g in wins)
    keeper = {}
    for doc_id, pos, g in sorted(wins):
        if counts[g] >= min_count and g not in keeper:
            keeper[g] = (doc_id, pos)
    out = {}
    for doc_id, text in enumerate(rows):
        ws = text.split(" ")
        verdict = defaultdict(lambda: None)  # None=clean, False=cut, True=keep
        for d, pos, g in wins:
            if d != doc_id or counts[g] < min_count:
                continue
            is_k = keep == "first" and keeper[g] == (d, pos)
            for t in range(pos, pos + L):
                verdict[t] = bool(verdict[t]) or is_k
        kept = [w for t, w in enumerate(ws) if verdict[t] in (None, True)]
        out[doc_id] = (len(ws), len(kept), len(ws) - len(kept), " ".join(kept))
    return out


def test_exact_substr_dedup_matches_python_reference(spark):
    from python_fastly_log_query_spark.operators.corpus import exact_substr_dedup

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 words
    rows = [
        "intro words here " + shared + " unique tail zero",
        shared + " completely different ending for doc one",
        "x1 x2 x3 x4 x5 x6 x7 x8 filler x1 x2 x3 x4 x5 x6 x7 x8",
        "entirely unrelated clean document with no duplicated runs at all",
        "short doc",
    ]
    for keep in ("first", "none"):
        expect = _substr_dedup_py(rows, L=8, keep=keep)
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["kept_tokens"],
                r["removed_tokens"],
                r["clean_text"],
            )
            for r in exact_substr_dedup(
                _docs(spark, rows), min_words=8, keep=keep
            ).collect()
        }
        assert got == expect, keep
    # keep='first' pins the paper semantics on this corpus: doc 0 owns
    # the keeper occurrence of every shared window, so it keeps ALL its
    # text; doc 1 loses exactly the 10 shared words; the within-doc
    # repeat keeps its first copy and cuts the second
    first = {
        r["doc_id"]: r
        for r in exact_substr_dedup(_docs(spark, rows), min_words=8).collect()
    }
    assert first[0]["removed_tokens"] == 0
    assert first[1]["removed_tokens"] == 10
    assert first[1]["clean_text"] == "completely different ending for doc one"
    assert first[2]["kept_tokens"] == 9  # first x1..x8 run + 'filler'
    assert first[3]["removed_tokens"] == 0 and first[4]["removed_tokens"] == 0


def test_exact_substr_dedup_full_removal_and_invariance(spark):
    from python_fastly_log_query_spark.operators.corpus import exact_substr_dedup

    dup = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [dup, dup, "clean c1 c2 c3 c4 c5 c6 c7 c8 c9"]
    base = _docs(spark, rows)
    none = {r["doc_id"]: r for r in exact_substr_dedup(base, keep="none").collect()}
    # keep='none' cuts BOTH copies; the doc row survives with empty text
    assert none[0]["kept_tokens"] == 0 and none[0]["clean_text"] == ""
    assert none[1]["kept_tokens"] == 0
    assert none[2]["removed_tokens"] == 0
    first = {r["doc_id"]: r for r in exact_substr_dedup(base).collect()}
    assert first[0]["removed_tokens"] == 0 and first[1]["kept_tokens"] == 0
    plain = exact_substr_dedup(base).collect()
    parts = exact_substr_dedup(base.repartition(7)).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, parts))
    with pytest.raises(ValueError, match="keep"):
        exact_substr_dedup(base, keep="last")


# ------------------------------------------------------ distinctive terms


def test_top_terms_ranks_specific_over_common(spark):
    from python_fastly_log_query_spark.operators.corpus import top_terms_per_doc

    rows = ["x x x common", "y y common common", "common z"]
    out = top_terms_per_doc(_docs(spark, rows), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # df: x=1, y=1, z=1, common=3 — the doc-specific term always outranks
    # the corpus-wide one
    assert [r["term"] for r in sorted(by_doc[0], key=lambda r: r["rank"])] == ["x", "common"]
    assert [r["term"] for r in sorted(by_doc[1], key=lambda r: r["rank"])] == ["y", "common"]
    assert [r["term"] for r in sorted(by_doc[2], key=lambda r: r["rank"])] == ["z", "common"]
    assert all(r["df"] == (3 if r["term"] == "common" else 1) for r in out)


# ----------------------------------------------------------- yield funnel


def test_corpus_yield_each_stage_drops_the_right_doc(spark):
    from python_fastly_log_query_spark.operators.corpus import corpus_yield

    long_en = " ".join(f"u{i}" for i in range(24))       # survives everything
    rows = [
        (0, long_en, "en"),
        (1, long_en, "en"),                               # exact dup -> dropped at s1
        (2, " ".join(f"u{i}" for i in range(4, 8)), "en"),  # spans already seen -> s2
        (3, "v1 v2 v3 v4", "en"),                         # unique but < 20 tokens -> s3
        (4, " ".join(f"w{i}" for i in range(24)), "xx"),  # good text, wrong lang -> s4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["stage"]: r for r in corpus_yield(docs, span_tokens=4).collect()}
    assert out["00_raw"]["n_docs"] == 5
    assert out["01_exact_dedup"]["n_docs"] == 4
    assert out["02_span_dedup"]["n_docs"] == 3
    assert out["03_quality"]["n_docs"] == 2
    assert out["04_lang"]["n_docs"] == 1
    # doc 0 survives to the end with all 24 tokens
    assert out["04_lang"]["n_tokens"] == 24
    # monotone: every stage keeps <= the previous stage
    seq = [out[s] for s in sorted(out)]
    for a, b in zip(seq, seq[1:]):
        assert b["n_docs"] <= a["n_docs"] and b["n_tokens"] <= a["n_tokens"]


# ----------------------------------------------------- plan shape (scale)


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_decontamination_never_shuffles_the_corpus(spark):
    # the eval gram set is broadcast; the training side must be map-only
    # up to the final per-doc aggregate (one shuffle on doc_id, none on
    # the gram key)
    train = _docs(spark, [f"w{i} w{i+1} w{i+2} w{i+3}" for i in range(50)])
    ev = _docs(spark, ["w1 w2 w3"])
    plan = _plan(contamination_stats(train, ev, n=3))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only gram-keyed exchange is the EVAL side's distinct (dimension
    # sized); the train side shuffles once, on doc_id, for the re-aggregate
    assert plan.count("hashpartitioning(gram") == 1
    assert plan.count("hashpartitioning(doc_id") == 1
    assert plan.count("hashpartitioning(") == 2


def test_span_dedup_plan_no_window_and_partial_min(spark):
    # keeper selection must be a partial-aggregated groupBy + join, not a
    # window over the span key (a hot boilerplate span would serialize a
    # window partition; AQE can split a skewed join, not a window)
    plan = _plan(span_dedup(_docs(spark, ["a b c d e f g h"] * 20), span_tokens=4))
    assert "Window" not in plan
    assert "partial_min(struct(doc_id" in plan


def test_incremental_bloom_no_corpus_shuffle(spark):
    # the corpus and batch are never hash-shuffled at full size: the bloom
    # bitset is an aggregate-to-driver broadcast, verify is a broadcast
    # semi-join, dup flags come back as a broadcast left join.  The only
    # permitted exchanges are the CANDIDATE-fp distincts (bloom-positive
    # rows — prefilter-sized, not corpus-sized)
    corpus = _docs(spark, [f"c {i}" for i in range(100)])
    batch = spark.createDataFrame(
        [(1000 + i, f"c {i * 2}") for i in range(50)], "doc_id long, text string"
    )
    plan = _plan(incremental_dedup_bloom(corpus, batch))
    assert "SortMergeJoin" not in plan
    assert plan.count("hashpartitioning(") == plan.count("hashpartitioning(fp")


# ---------------------------------------------------------- PII redaction


def test_pii_redact_counts_order_and_clean_text(spark):
    from python_fastly_log_query_spark.operators.corpus import pii_redact

    rows = [
        "mail a.b@c.org and 10.1.2.3 then +44-123-4567 done",
        "no pii here at all",
        "two mails x@y.io z@w.net and 1.2.3.4 5.6.7.8",
    ]
    out = {r["doc_id"]: r for r in pii_redact(_docs(spark, rows)).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 1, 1)
    assert out[0]["clean_text"] == "mail <EMAIL> and <IP> then <PHONE> done"
    # a clean doc passes through byte-identical with zero counts
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (0, 0, 0)
    assert out[1]["clean_text"] == rows[1]
    assert (out[2]["n_email"], out[2]["n_ipv4"]) == (2, 2)
    assert out[2]["clean_text"] == "two mails <EMAIL> <EMAIL> and <IP> <IP>"


def test_pii_redact_email_before_ip_ordering(spark):
    from python_fastly_log_query_spark.operators.corpus import pii_redact

    # the numeric-domain mail fails the alpha-TLD email pattern, so the
    # ipv4 pass (which runs AFTER email) must still see and redact it
    out = pii_redact(_docs(spark, ["ping u@ex.org at 10.0.0.1"])).collect()[0]
    assert (out["n_email"], out["n_ipv4"]) == (1, 1)
    assert out["clean_text"] == "ping <EMAIL> at <IP>"


# ------------------------------------------------------- vocab coverage


def test_vocab_coverage_cut_and_ppm(spark):
    from python_fastly_log_query_spark.operators.corpus import vocab_coverage

    docs = _docs(spark, ["a a a b", "b c"])
    out = {r["doc_id"]: r for r in vocab_coverage(docs, vocab_size=2).collect()}
    # vocab = {a(3), b(2)}; c is OOV
    assert (out[0]["n_tokens"], out[0]["n_oov"], out[0]["oov_ppm"]) == (4, 0, 0)
    assert (out[1]["n_tokens"], out[1]["n_oov"], out[1]["oov_ppm"]) == (2, 1, 500000)


def test_vocab_coverage_tie_break_deterministic(spark):
    from python_fastly_log_query_spark.operators.corpus import vocab_coverage

    # x and y tie at 2 occurrences; vocab_size=2 keeps {x, y}? No —
    # count desc, term asc: z(3) first, then the x/y tie breaks to x
    docs = _docs(spark, ["z z z x x y y"])
    out = vocab_coverage(docs, vocab_size=2).collect()[0]
    assert out["n_tokens"] == 7 and out["n_oov"] == 2  # both y's are out


def test_pii_redact_plan_is_map_only(spark):
    from python_fastly_log_query_spark.operators.corpus import pii_redact

    plan = _plan(pii_redact(_docs(spark, ["a@b.io x"] * 10)))
    # one scan, zero shuffles — the whole pass is a single codegen'd
    # projection chain
    assert "Exchange" not in plan
    assert "codegen id" in plan


def test_vocab_coverage_plan_topk_heap_and_broadcast(spark):
    from python_fastly_log_query_spark.operators.corpus import vocab_coverage

    plan = _plan(vocab_coverage(_docs(spark, ["a b c"] * 10), vocab_size=2))
    # the vocab cut must be per-partition heaps + driver merge, never a
    # single-partition global sort window
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    # coverage side: vocab dim broadcasts onto the exploded words
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_linear_quality_semantics_and_plan(spark):
    from python_fastly_log_query_spark.operators.corpus import (
        linear_quality_scores,
    )

    docs = _docs(spark, ["good good", "bad", "good bad"])
    from python_fastly_log_query_spark.operators.sampling import _hash_bucket
    import pyspark.sql.functions as SF

    # pin weights per TERM bucket: good=+3, bad=-5 (whatever buckets they
    # hash to under the qw salt)
    gb, bb = (
        spark.range(1)
        .select(
            _hash_bucket(SF.lit("good"), "qw", 64).alias("g"),
            _hash_bucket(SF.lit("bad"), "qw", 64).alias("b"),
        )
        .collect()[0]
    )
    assert gb != bb  # fixture assumption: no hash collision at 64 buckets
    w = spark.createDataFrame(
        [(b, 3 if b == gb else (-5 if b == bb else 0)) for b in range(64)],
        "bucket int, weight long",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["keep"])
        for r in linear_quality_scores(docs, w, n_buckets=64).collect()
    }
    assert out[0] == (2, 6, 1)
    assert out[1] == (1, -5, 0)
    assert out[2] == (2, -2, 0)
    plan = _plan(linear_quality_scores(docs, w, n_buckets=64))
    # model dim broadcasts; the corpus shuffles exactly once (doc_id)
    assert "BroadcastHashJoin" in plan
    assert plan.count("hashpartitioning(doc_id") == 1


# ---------------------------------------------------- split-leakage audit


def test_cross_split_contamination_matches_python_reference(spark):
    import hashlib

    from python_fastly_log_query_spark.operators.corpus import (
        cross_split_contamination,
    )

    def py_split(i):
        b = int(hashlib.md5(f"split-{i}".encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    # docs 0..11 share one 5-gram; the rest are unique 5-token texts
    rows = ["common gram shared across splits"] * 12 + [
        f"unique u{i} v{i} w{i} x{i}" for i in range(12, 30)
    ]
    docs = _docs(spark, rows)
    # python reference over the same gram + split definitions
    gs = set()
    for i, t in enumerate(rows):
        toks = t.split(" ")
        grams = {
            " ".join(toks[j : j + 5]) for j in range(len(toks) - 4)
        } or {t}
        for g in grams:
            gs.add((g, py_split(i)))
    expect = {}
    by_gram = {}
    for g, s in gs:
        by_gram.setdefault(g, set()).add(s)
    for g, splits in by_gram.items():
        for a in splits:
            for b in splits:
                if a < b:
                    expect[(a, b)] = expect.get((a, b), 0) + 1
    got = {
        (r["split_a"], r["split_b"]): r["shared_grams"]
        for r in cross_split_contamination(docs, n=5).collect()
    }
    assert got == expect
    assert expect, "fixture must actually leak (non-vacuous)"


# ------------------------------------------------------------- winnowing


def _winnow_py(rows, k, w):
    import hashlib

    out = set()
    for doc_id, text in enumerate(rows):
        toks = text.split(" ")
        grams = (
            [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            if len(toks) >= k
            else [text]
        )
        fps = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
        n = len(fps)
        starts = range(0, n - w + 1) if n >= w else [0]
        for s in starts:
            end = min(s + w, n)
            best = min(range(s, end), key=lambda i: (fps[i], -i))
            out.add((doc_id, best, fps[best]))
    return out


def test_winnow_matches_python_reference(spark):
    from python_fastly_log_query_spark.operators.corpus import winnow_fingerprints

    rows = [
        "a b c d e f g h i j",         # 7 grams, 4 windows
        "z y x w v u t s",             # 5 grams, 2 windows
        "dup dup dup dup dup dup",     # identical grams -> rightmost ties
        "tiny doc",                    # under k tokens -> whole-text gram
        "a b c d e",                   # 2 grams < w -> clipped window
    ]
    expect = _winnow_py(rows, 4, 4)
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(_docs(spark, rows), k=4, w=4).collect()
    }
    assert got == expect


def test_winnow_guarantee_shared_run_shares_a_fingerprint(spark):
    from python_fastly_log_query_spark.operators.corpus import winnow_fingerprints

    # both docs contain the same w+k-1 = 7-word run inside different noise
    shared = "s1 s2 s3 s4 s5 s6 s7"
    rows = [f"n1 n2 n3 {shared} n4 n5", f"m1 {shared} m2 m3 m4 m5 m6"]
    out = winnow_fingerprints(_docs(spark, rows), k=4, w=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1], "winnowing guarantee violated"


# ------------------------------------------------- importance weighting


def test_dsir_weights_rank_target_tokens_above_offtarget(spark):
    from python_fastly_log_query_spark.operators.corpus import (
        dsir_bucket_weights,
        dsir_importance,
    )

    src = _docs(
        spark,
        ["t1 t2 t3 t4"] * 5 + ["o1 o2 o3 o4"] * 5,
    )
    target = _docs(spark, ["t1 t2 t3 t4"] * 5)
    w = dsir_bucket_weights(src, target, n_buckets=256)
    assert w.count() == 256  # spine covers every bucket
    out = {
        r["doc_id"]: r["mean_w_ppm"]
        for r in dsir_importance(src, w, n_buckets=256).collect()
    }
    on = [out[i] for i in range(5)]
    off = [out[i] for i in range(5, 10)]
    # target-like docs score ~2e6 (their tokens are 2x denser in target
    # than source); off-target docs near the smoothing floor
    assert min(on) > 1_000_000 > max(off)
    assert all(a == on[0] for a in on) and all(b == off[0] for b in off)


# ------------------------------------------------------- bigram LM


def test_bigram_lm_in_domain_docs_score_lower_surprise(spark):
    from python_fastly_log_query_spark.operators.corpus import (
        bigram_lm_model,
        bigram_lm_surprise,
    )

    # in-domain docs repeat the same bigrams the target corpus is made of;
    # out-of-domain docs are all unseen pairs -> smoothing-floor probability
    target = _docs(spark, ["t1 t2 t3 t4 t1 t2"] * 4)
    docs = _docs(spark, ["t1 t2 t3 t4"] * 3 + ["z1 z2 z3 z4"] * 3)
    cnt2, cnt1 = bigram_lm_model(target, n_buckets=64, salt="blmtest")
    out = {
        r["doc_id"]: r
        for r in bigram_lm_surprise(docs, cnt2, cnt1, n_buckets=64,
                                    salt="blmtest").collect()
    }
    assert all(out[i]["n_bigrams"] == 3 for i in range(6))
    on = [out[i]["mean_surprise"] for i in range(3)]
    off = [out[i]["mean_surprise"] for i in range(3, 6)]
    assert max(on) < min(off), (on, off)
    # identical docs must score identically (determinism)
    assert len(set(on)) == 1 and len(set(off)) == 1


def test_bigram_lm_model_is_dimension_sized(spark):
    from python_fastly_log_query_spark.operators.corpus import bigram_lm_model

    target = _docs(spark, ["w%d x%d y%d" % (i, i, i) for i in range(20)])
    cnt2, cnt1 = bigram_lm_model(target, n_buckets=16, salt="blmdim")
    # hashed-bucket model is bounded by n_buckets regardless of vocab size
    assert cnt2.count() <= 16 * 16
    assert cnt1.count() <= 16
    # associativity contract: context counts equal summed pair counts
    tot_pairs = cnt2.agg(F.sum("cnt2")).collect()[0][0]
    tot_ctx = cnt1.agg(F.sum("cnt1")).collect()[0][0]
    assert tot_pairs == tot_ctx


# ------------------------------------------------------------ shard_plan


def test_shard_plan_invariants(spark):
    """Every byte lands in exactly one shard; shard ids are the floor of
    the doc's global start offset over target; shards deviate from the
    target by at most one document."""
    from python_fastly_log_query_spark.operators.corpus import shard_plan

    rows = [f"doc {i} " + "x" * (17 * (i % 13)) for i in range(120)]
    target = 256
    planned = shard_plan(
        _docs(spark, rows), target_bytes=target, n_ranges=16
    ).collect()
    assert len(planned) == 120
    # replay the global order in python
    ordered = sorted(planned, key=lambda r: (r["key"], r["doc_id"]))
    cum = 0
    max_doc = max(r["bytes"] for r in ordered)
    for r in ordered:
        assert r["shard"] == cum // target
        cum += r["bytes"]
    by_shard = {}
    for r in ordered:
        by_shard[r["shard"]] = by_shard.get(r["shard"], 0) + r["bytes"]
    assert sum(by_shard.values()) == cum
    shards = sorted(by_shard)
    assert shards == list(range(len(shards)))  # contiguous from 0
    for s in shards[:-1]:
        assert abs(by_shard[s] - target) < max_doc


def test_shard_plan_deterministic_and_range_count_free(spark):
    """The assignment is a pure function of (corpus, salt): re-running,
    and changing n_ranges (the PLAN knob), reproduce identical shards."""
    from python_fastly_log_query_spark.operators.corpus import shard_plan

    rows = [f"payload {i} " + "y" * (i % 29) for i in range(80)]
    a = {
        r["doc_id"]: r["shard"]
        for r in shard_plan(_docs(spark, rows), 128, n_ranges=4).collect()
    }
    b = {
        r["doc_id"]: r["shard"]
        for r in shard_plan(_docs(spark, rows), 128, n_ranges=64).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        shard_plan(_docs(spark, rows), 128, n_ranges=48)


def test_shard_plan_window_is_range_partitioned(spark):
    """The corpus-sized window cumsum must partition by rid — a global
    unpartitioned window over the input would serialize the corpus into
    one task.  The only unpartitioned window allowed is the offsets
    cumsum over the rid AGGREGATE (<= n_ranges rows), and the offsets
    join back must broadcast."""
    import contextlib
    import io

    from python_fastly_log_query_spark.operators.corpus import shard_plan

    rows = ["z" * (i % 7 + 1) for i in range(40)]
    df = shard_plan(_docs(spark, rows), 64, n_ranges=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the cumsum over the corpus (ordered by key, doc_id) is partitioned
    # by rid: its window spec names rid as partition key
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    corpus_specs = [s for s in specs if "key#" in s and "doc_id#" in s]
    assert corpus_specs, plan
    for s in corpus_specs:
        head = s.split("windowspecdefinition(")[1]
        assert head.split(",")[0].startswith("rid#"), s
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_inverted_index_two_phase_equals_plain_window(spark):
    import random

    from pyspark.sql import Window
    from python_fastly_log_query_spark.operators.corpus import inverted_index

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(12)]
    rows = []
    for d in range(60):
        # 'hot' appears in every doc (the stopword case)
        words = ["hot"] * rng.randint(1, 5) + rng.choices(vocab, k=rng.randint(3, 10))
        rows.append((d, " ".join(words), "en", "s", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = sorted(
        tuple(r) for r in inverted_index(docs, k=4, salt_buckets=4).collect()
    )
    # plain single-window reference
    words = docs.selectExpr("doc_id", "explode(split(text, ' ')) AS term")
    tf = words.groupBy("term", "doc_id").count().withColumnRenamed("count", "tf")
    dfreq = tf.groupBy("term").count().withColumnRenamed("count", "df")
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    ref = (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 4)
        .join(dfreq, "term")
        .selectExpr("term", "CAST(df AS LONG) df", "doc_id",
                    "CAST(tf AS LONG) tf", "CAST(rnk AS LONG) rnk")
    )
    want = sorted(tuple(r) for r in ref.collect())
    assert got == want
    # the hot term's postings are present and capped at k
    hot = [r for r in got if r[0] == "hot"]
    assert len(hot) == 4 and all(r[1] == 60 for r in hot)


def test_chunk_documents_boundaries_and_overlap(spark):
    from python_fastly_log_query_spark.operators.corpus import chunk_documents

    toks = [f"w{i}" for i in range(50)]
    rows = [
        (0, " ".join(toks), "en", "s", 0),        # 50 toks -> 2 chunks
        (1, " ".join(toks[:10]), "en", "s", 0),   # short -> exactly 1 chunk
        (2, " ".join(toks[:32]), "en", "s", 0),   # == window -> 1 chunk
        (3, " ".join(toks[:33]), "en", "s", 0),   # one past -> 2 chunks
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {}
    for r in chunk_documents(docs, chunk_tokens=32, overlap=8).collect():
        out.setdefault(r.doc_id, []).append(r)
    # nc = max(1, ceil((n - overlap) / stride)): 50 toks -> 2 chunks
    # ([0..31], [24..49] covers everything; no trailing all-overlap chunk)
    assert [len(out[d]) for d in range(4)] == [2, 1, 1, 2]
    c0 = sorted(out[0], key=lambda r: r.chunk_id)
    assert [r.start_tok for r in c0] == [0, 24]
    assert [r.n_chunk_tokens for r in c0] == [32, 26]
    import hashlib

    assert c0[1].chunk_md5 == hashlib.md5(" ".join(toks[24:50]).encode()).hexdigest()
    # overlap: chunk 1 re-covers tokens 24..31 that chunk 0 ended with
    assert c0[1].start_tok < 32


def test_pmi_top_bigrams_ranks_planted_collocation(spark):
    from python_fastly_log_query_spark.operators.corpus import pmi_top_bigrams

    # 'new york' always adjacent (perfect collocation); 'the' pairs with
    # everything (high n_a kills its score); singleton pairs cut by
    # min_count
    rows = []
    for i in range(10):
        rows.append((i, "the new york office of the big firm", "en", "s", 0))
    rows.append((10, "one off pair", "en", "s", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = pmi_top_bigrams(docs, k=5, min_count=5).collect()
    top = (out[0].w1, out[0].w2)
    pairs = {(r.w1, r.w2) for r in out}
    assert ("new", "york") in pairs
    # the planted perfect collocation outranks any 'the X' pair
    the_scores = [r.score for r in out if r.w1 == "the"]
    ny = [r.score for r in out if (r.w1, r.w2) == ("new", "york")][0]
    assert all(ny > s for s in the_scores)
    # min_count: the one-off bigrams never appear
    assert ("one", "off") not in pairs


def test_bloom_semijoin_keeps_all_matches_prunes_most_nonmatches(spark):
    """bloom_semijoin: zero false negatives (every matching fact row
    survives the prefilter) and the non-match survival rate stays near
    the ~1% design FP rate at 10 bits/key."""
    from pyspark.sql import functions as F

    from python_fastly_log_query_spark.operators.corpus import bloom_semijoin

    facts = spark.range(0, 20_000).select(F.col("id").alias("k"))
    dim = spark.range(0, 20_000, 40).select(F.col("id").alias("k"))  # 500 keys
    pre = bloom_semijoin(facts, dim, key="k")
    kept = {r["k"] for r in pre.collect()}
    matches = {r["k"] for r in dim.collect()}
    assert matches <= kept  # no false negatives, ever
    fp_rate = (len(kept) - len(matches)) / (20_000 - len(matches))
    assert fp_rate < 0.05  # ~1% by design; generous ceiling
    # composed with the join, the prefilter is row-invisible
    got = sorted(r["k"] for r in pre.join(dim, "k").collect())
    want = sorted(r["k"] for r in facts.join(dim, "k").collect())
    assert got == want
