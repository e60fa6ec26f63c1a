"""Encoding repair (ftfy-style mojibake rule table) and the C4
token-blocklist yield filter.

The registered queries (`encoding_repair_stats`,
`badword_yield_by_source`) are value-oracled against DuckDB by the full
parity sweep; these tests pin the semantics the sweep cannot see —
byte-exact repair of hand-crafted mojibake, U+FFFD stripping, the
strict ppm threshold boundary, and the map-only plan shape.
"""

import hashlib

from pyspark.sql import functions as F

from python_fastly_log_query_spark.operators.corpus import badword_yield
from python_fastly_log_query_spark.operators.webtext import mojibake_repair


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestMojibakeRepair:
    def test_rule_table_repairs_to_exact_bytes(self, spark):
        # caf<C3><A9> don<E2><20AC><2122>t se<C3><B1>or — all three rule
        # classes present, plus one U+FFFD; repaired text is known exactly
        broken = (
            "cafÃ© donâ€™t"
            " seÃ±or x�y"
        )
        fixed = "café don’t señor xy"
        out = mojibake_repair(_docs(spark, [(1, broken)])).collect()[0]
        assert out["n_fixed"] == 3
        assert out["n_unfixable"] == 1
        assert out["clean_chars"] == len(fixed)
        assert out["clean_md5"] == hashlib.md5(fixed.encode("utf-8")).hexdigest()

    def test_clean_text_passes_through(self, spark):
        clean = "already clean ascii text"
        out = mojibake_repair(_docs(spark, [(1, clean)])).collect()[0]
        assert out["n_fixed"] == 0
        assert out["n_unfixable"] == 0
        assert out["clean_md5"] == hashlib.md5(clean.encode("utf-8")).hexdigest()

    def test_repeated_sequences_all_counted(self, spark):
        broken = "Ã©" * 4 + "��"
        out = mojibake_repair(_docs(spark, [(1, broken)])).collect()[0]
        assert out["n_fixed"] == 4
        assert out["n_unfixable"] == 2
        assert out["clean_chars"] == 4  # four e-acute survive, FFFD gone

    def test_real_eacute_untouched(self, spark):
        # a CORRECTLY-encoded e-acute must not be "repaired" — the rules
        # match the two-char mojibake sequence, never the true char
        good = "café"
        out = mojibake_repair(_docs(spark, [(1, good)])).collect()[0]
        assert out["n_fixed"] == 0
        assert out["clean_md5"] == hashlib.md5(good.encode("utf-8")).hexdigest()

    def test_map_only_plan(self, spark):
        plan = mojibake_repair(
            _docs(spark, [(1, "x")])
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestBadwordYield:
    def _one(self, spark, text, max_bad_ppm=80_000):
        df = spark.createDataFrame(
            [(text, "s")], "text string, source string"
        )
        return badword_yield(df, max_bad_ppm=max_bad_ppm).collect()[0]

    def test_flagged_above_threshold(self, spark):
        # 2 bad of 10 tokens = 200,000 ppm > 80,000
        r = self._one(spark, "slow big a a a a a a a a")
        assert (r["docs_flagged"], r["bad_tokens"]) == (1, 2)
        assert r["kept_ppm"] == 0

    def test_exact_threshold_not_flagged(self, spark):
        # 2 bad of 25 tokens = exactly 80,000 ppm — strict > keeps it
        r = self._one(spark, " ".join(["slow", "big"] + ["a"] * 23))
        assert r["docs_flagged"] == 0
        assert r["kept_ppm"] == 1_000_000

    def test_clean_doc_kept(self, spark):
        r = self._one(spark, "the fast table scan")
        assert (r["docs_flagged"], r["bad_tokens"]) == (0, 0)

    def test_per_source_rollup(self, spark):
        rows = [
            ("slow big slow big", "s0"),  # flagged (4/4 bad)
            ("a b c d", "s0"),
            ("a b c d", "s1"),
        ]
        df = spark.createDataFrame(rows, "text string, source string")
        out = {r["source"]: r for r in badword_yield(df).collect()}
        assert out["s0"]["docs_total"] == 2
        assert out["s0"]["docs_flagged"] == 1
        assert out["s0"]["kept_ppm"] == 500_000
        assert out["s1"]["docs_flagged"] == 0

    def test_single_scan_no_join(self, spark):
        df = spark.createDataFrame(
            [("slow a", "s")], "text string, source string"
        )
        plan = badword_yield(df)._jdf.queryExecution().executedPlan().toString()
        # the blocklist rides as a literal — no join operator anywhere
        assert "Join" not in plan


class TestTrainingShuffle:
    """Seeded deterministic shuffle: the parity sweep pins the digest
    values; these pin the CONTRACT — reproducibility, seed sensitivity,
    partitioning invariance, and the no-global-sort plan."""

    def _docs(self, spark, n=64, parts=1):
        return spark.range(n).select(F.col("id").alias("doc_id")).repartition(parts)

    def test_same_seed_reproduces_bit_exact(self, spark):
        from python_fastly_log_query_spark.operators.sampling import training_shuffle

        a = sorted(map(tuple, training_shuffle(self._docs(spark)).collect()))
        b = sorted(map(tuple, training_shuffle(self._docs(spark)).collect()))
        assert a == b

    def test_partitioning_invariant(self, spark):
        from python_fastly_log_query_spark.operators.sampling import training_shuffle

        a = sorted(map(tuple, training_shuffle(self._docs(spark, parts=1)).collect()))
        b = sorted(map(tuple, training_shuffle(self._docs(spark, parts=7)).collect()))
        assert a == b

    def test_seed_repermutes(self, spark):
        from python_fastly_log_query_spark.operators.sampling import training_shuffle

        e0 = {r["shard"]: r["order_md5"]
              for r in training_shuffle(self._docs(spark), seed="epoch0").collect()}
        e1 = {r["shard"]: r["order_md5"]
              for r in training_shuffle(self._docs(spark), seed="epoch1").collect()}
        # a reseed must change the order in (essentially) every shard
        assert sum(e0.get(s) != e1.get(s) for s in e0) >= len(e0) - 1

    def test_every_doc_lands_exactly_once(self, spark):
        from python_fastly_log_query_spark.operators.sampling import training_shuffle

        out = training_shuffle(self._docs(spark, n=100), n_shards=8).collect()
        assert sum(r["n_docs"] for r in out) == 100
        assert len(out) == 8  # 100 docs over 8 shards: all occupied

    def test_one_shuffle_no_sort(self, spark):
        from python_fastly_log_query_spark.operators.sampling import training_shuffle
        from python_fastly_log_query_spark.plans.fingerprint import plan_fingerprint

        fp = plan_fingerprint(training_shuffle(self._docs(spark)))
        assert fp["shuffle_exchanges"] == 1
        assert fp["sorts"] == 0


class TestPhraseSearch:
    """Positional phrase retrieval: the parity sweep pins digests; these
    pin the adjacency algebra — order sensitivity, overlap counting,
    repeated-token offsets, and adjacency (no gaps)."""

    def _d(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_order_sensitive(self, spark):
        from python_fastly_log_query_spark.operators.corpus import phrase_search

        docs = self._d(spark, [(1, "new york city"), (2, "york new city")])
        out = phrase_search(docs, ("new", "york")).collect()
        assert [(r["doc_id"], r["n_matches"], r["first_pos"]) for r in out] == [
            (1, 1, 0)
        ]

    def test_adjacent_only_no_gaps(self, spark):
        from python_fastly_log_query_spark.operators.corpus import phrase_search

        docs = self._d(spark, [(1, "new big york")])
        assert phrase_search(docs, ("new", "york")).count() == 0

    def test_overlapping_matches_counted(self, spark):
        from python_fastly_log_query_spark.operators.corpus import phrase_search

        docs = self._d(spark, [(1, "a a a a")])
        out = phrase_search(docs, ("a", "a")).collect()[0]
        # "a a" occurs at starts 0,1,2 — overlapping matches all count
        assert (out["n_matches"], out["first_pos"]) == (3, 0)

    def test_repeated_token_phrase_exact(self, spark):
        from python_fastly_log_query_spark.operators.corpus import phrase_search

        docs = self._d(spark, [(1, "x echo echo y echo echo echo z")])
        out = phrase_search(docs, ("echo", "echo", "echo")).collect()[0]
        # only the run of three at positions 4-6 matches, once
        assert (out["n_matches"], out["first_pos"]) == (1, 4)

    def test_multiple_occurrences_and_first_pos(self, spark):
        from python_fastly_log_query_spark.operators.corpus import phrase_search

        docs = self._d(spark, [(7, "q w e r q w t q w")])
        out = phrase_search(docs, ("q", "w")).collect()[0]
        assert (out["doc_id"], out["n_matches"], out["first_pos"]) == (7, 3, 0)


class TestContentChunks:
    """Content-defined chunking: the parity sweep pins the corpus
    report; these pin the chunking algebra — lossless reassembly,
    boundary determinism, and the shift-robustness that is the whole
    point of content-defined (vs fixed-window) boundaries."""

    def _d(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_chunks_reassemble_losslessly(self, spark):
        from python_fastly_log_query_spark.operators.corpus import content_chunks

        text = "the fast key order sort table scan merge part window small hash"
        out = content_chunks(self._d(spark, [(1, text)])).collect()
        assert sum(r["n_toks"] for r in out) == len(text.split(" "))
        # chunk indices are dense from 0
        assert sorted(r["chunk_idx"] for r in out) == list(range(len(out)))

    def test_identical_docs_identical_chunks(self, spark):
        from python_fastly_log_query_spark.operators.corpus import content_chunks

        text = "spark group query row data slow small filter customer line"
        out = content_chunks(self._d(spark, [(1, text), (2, text)])).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_md5"], r["n_toks"])
            )
        assert sorted(by_doc[1]) == sorted(by_doc[2])

    def test_shift_robust_payload_dedup(self, spark):
        from python_fastly_log_query_spark.operators.corpus import (
            chunk_storage_stats,
            content_chunks,
        )

        # same long payload behind DIFFERENT one-token prefixes: fixed
        # windows would share nothing; content-defined chunks resync
        payload = (
            "quick copper kettle hums beside the narrow harbor wall "
            "at dusk every single tide turns the lamplight green again"
        )
        docs = self._d(
            spark, [(1, "aaa " + payload), (2, "bbbbb " + payload)]
        )
        ch = content_chunks(docs).collect()
        md5s = {}
        for r in ch:
            md5s.setdefault(r["doc_id"], set()).add(r["chunk_md5"])
        shared = md5s[1] & md5s[2]
        assert shared, "shifted payload produced no shared chunks"
        stats = chunk_storage_stats(docs).collect()[0]
        assert stats["saved_token_ppm"] > 0

    def test_no_join_two_shuffles(self, spark):
        from python_fastly_log_query_spark.operators.corpus import (
            chunk_storage_stats,
        )
        from python_fastly_log_query_spark.plans.fingerprint import (
            plan_fingerprint,
        )

        fp = plan_fingerprint(
            chunk_storage_stats(self._d(spark, [(1, "a b c")]))
        )
        assert fp["broadcast_joins"] + fp["sort_merge_joins"] == 0
        assert fp["cartesian"] + fp["nested_loop_joins"] == 0


class TestWeightedSample:
    """Efraimidis-Spirakis priority sampling: parity pins the exact
    top-k; these pin the contract — determinism, weight monotonicity
    under a shared draw, growth stability, and the top-k plan."""

    def test_deterministic_and_weight_sensitive(self, spark):
        from python_fastly_log_query_spark.operators.sampling import (
            weighted_sample,
        )

        docs = spark.range(200).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7 + 1).alias("n_chars"),
        )
        a = [tuple(r) for r in weighted_sample(docs, k=10).collect()]
        b = [tuple(r) for r in weighted_sample(docs, k=10).collect()]
        assert a == b
        # with weight 10^6 on one row and ~7 elsewhere, the heavy row
        # must out-prioritize everything (u spans only 2^32)
        heavy = docs.withColumn(
            "n_chars",
            F.when(F.col("doc_id") == 123, F.lit(10**12)).otherwise(
                F.col("n_chars")
            ),
        )
        top = weighted_sample(heavy, k=1).collect()[0]
        assert top["doc_id"] == 123

    def test_growth_never_reshuffles_existing_priorities(self, spark):
        from python_fastly_log_query_spark.operators.sampling import (
            weighted_sample,
        )

        small = spark.range(100).select(
            F.col("id").alias("doc_id"), F.lit(50).alias("n_chars")
        )
        big = spark.range(300).select(
            F.col("id").alias("doc_id"), F.lit(50).alias("n_chars")
        )
        pa = {r["doc_id"]: r["priority_ppb"]
              for r in weighted_sample(small, k=100).collect()}
        pb = {r["doc_id"]: r["priority_ppb"]
              for r in weighted_sample(big, k=300).collect()}
        assert all(pb[d] == p for d, p in pa.items())

    def test_take_ordered_plan(self, spark):
        from python_fastly_log_query_spark.operators.sampling import (
            weighted_sample,
        )

        docs = spark.range(50).select(
            F.col("id").alias("doc_id"), F.lit(5).alias("n_chars")
        )
        plan = weighted_sample(docs)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestTableStats:
    def test_handmade_frame(self, spark):
        from python_fastly_log_query_spark.plans.partitioning import table_stats

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None), (10, "b")],
            "k long, s string",
        )
        out = {r["column"]: r for r in table_stats(df, ["k", "s"]).collect()}
        assert out["k"]["n_rows"] == 4
        assert out["k"]["ndv"] == 4
        assert out["k"]["n_nulls"] == 0
        # native-typed min/max: 2 < 10 numerically (a string min would say "10" < "2")
        assert (out["k"]["min_str"], out["k"]["max_str"]) == ("1", "10")
        assert out["s"]["ndv"] == 2  # count_distinct skips NULL
        assert out["s"]["n_nulls"] == 1

    def test_no_corpus_joins_no_expand(self, spark):
        """opt r6: per-column NDVs are their own column-pruned distinct
        aggregates attached via broadcast 1-ROW cross joins — so the
        plan carries exactly n_cols BroadcastNestedLoopJoins (the
        declared benign class), NO corpus-side join strategy, and NO
        Expand (the old all-distincts-in-one-aggregate shape multiplied
        every row (k+1)x through a sort aggregate)."""
        from python_fastly_log_query_spark.plans.partitioning import table_stats

        df = spark.createDataFrame([(1, "a")], "k long, s string")
        plan = table_stats(df, ["k", "s"])._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
        assert plan.count("BroadcastNestedLoopJoin") == 2
        assert "Expand" not in plan
