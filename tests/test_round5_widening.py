"""Round-5 widening operators: triangle counting, blocked edit-distance
near-dup, reciprocal-rank fusion.

The registered queries are value-oracled against DuckDB by the full
parity sweep; these tests pin the semantics the sweep cannot see —
hand-checkable graphs, planted near-dup pairs, planted rank overlap —
and the cross-engine levenshtein agreement the editdist oracle relies
on.
"""

from python_fastly_log_query_spark.operators.corpus import rrf_fuse
from python_fastly_log_query_spark.operators.dedup import editdist_neardup_pairs
from python_fastly_log_query_spark.operators.webgraph import triangle_stats


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src string, dst string, w long"
    )


class TestTriangles:
    def test_single_triangle(self, spark):
        t = triangle_stats(_edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]))
        rows = {r["host"]: r for r in t.collect()}
        assert set(rows) == {"a", "b", "c"}
        for h in rows:
            assert rows[h]["degree"] == 2
            assert rows[h]["triangles"] == 1
            # 2*1*1e6 div (2*1) = 1_000_000 — a closed pair is a clique
            assert rows[h]["clustering_ppm"] == 1_000_000

    def test_square_has_no_triangles(self, spark):
        t = triangle_stats(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
        )
        assert [r["triangles"] for r in t.collect()] == [0, 0, 0, 0]

    def test_k4_per_host_counts(self, spark):
        nodes = ["a", "b", "c", "d"]
        pairs = [(x, y) for x in nodes for y in nodes if x < y]
        t = triangle_stats(_edges(spark, pairs))
        for r in t.collect():
            assert r["degree"] == 3
            # each K4 vertex sits on C(3,2)=3 triangles; clique → ppm 1e6
            assert r["triangles"] == 3
            assert r["clustering_ppm"] == 1_000_000

    def test_direction_and_duplicates_collapse(self, spark):
        # both directions + repeated links + a self-loop: one triangle
        t = triangle_stats(
            _edges(
                spark,
                [
                    ("a", "b"),
                    ("b", "a"),
                    ("b", "c"),
                    ("b", "c"),
                    ("c", "a"),
                    ("a", "a"),
                ],
            )
        )
        assert sum(r["triangles"] for r in t.collect()) == 3

    def test_hub_generates_no_wedges_itself(self, spark):
        # star: hub h linked to 5 leaves, no leaf-leaf edges → 0 triangles,
        # and the orientation sends every edge INTO the hub (leaves have
        # lower degree), which is the power-law scale property.
        t = triangle_stats(_edges(spark, [("h", f"l{i}") for i in range(5)]))
        rows = {r["host"]: r for r in t.collect()}
        assert rows["h"]["degree"] == 5
        assert all(r["triangles"] == 0 for r in rows.values())
        assert rows["h"]["clustering_ppm"] == 0


class TestEditDistance:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_planted_near_pair_found(self, spark):
        base = "the fast key order sort table scan merge part window small hash"
        near = "the fast key order sort table scan merge part windoq small hash"
        far = "the fast z z z z z z z z z z"
        other = "completely different prefix here a b c d e f g h"
        docs = self._docs(spark, [base, near, far, other])
        pairs = editdist_neardup_pairs(docs, max_dist=5).collect()
        assert {(p["doc_a"], p["doc_b"]): p["dist"] for p in pairs} == {(0, 1): 1}

    def test_blocking_requires_shared_prefix(self, spark):
        # distance 1 overall but differing FIRST token → different block
        docs = self._docs(spark, ["aa b c d e", "ab b c d e"])
        assert editdist_neardup_pairs(docs, max_dist=5).count() == 0

    def test_threshold_is_inclusive_and_early_abandons(self, spark):
        docs = self._docs(spark, ["k k aaaa", "k k bbbb", "k k aaab"])
        got = {
            (p["doc_a"], p["doc_b"]): p["dist"]
            for p in editdist_neardup_pairs(
                docs, block_tokens=2, snip_tokens=12, max_dist=1
            ).collect()
        }
        # aaaa↔aaab dist 1 kept; aaaa↔bbbb dist 4 > 1 dropped (returns -1)
        assert got == {(0, 2): 1}

    def test_levenshtein_matches_duckdb_on_corpus(self, spark):
        """The oracle leans on Spark(codepoints) ≡ DuckDB(bytes) over the
        ASCII corpus — check real candidate snippets, not just examples."""
        import duckdb

        from conftest import SF_SMALL

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        pairs = (
            editdist_neardup_pairs(docs, max_dist=10_000)
            .orderBy("doc_a", "doc_b")
            .limit(50)
            .collect()
        )
        assert pairs, "expected prefix-blocked candidates in the corpus"
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{SF_SMALL}/documents.parquet'"
        )
        for p in pairs:
            d = con.sql(
                """
                SELECT levenshtein(a.s, b.s) FROM
                  (SELECT array_to_string(list_slice(string_split(text,' '),1,12),' ') s
                   FROM documents WHERE doc_id = ?) a,
                  (SELECT array_to_string(list_slice(string_split(text,' '),1,12),' ') s
                   FROM documents WHERE doc_id = ?) b
                """,
                params=[p["doc_a"], p["doc_b"]],
            ).fetchone()[0]
            assert d == p["dist"]


class TestRRF:
    def _ranking(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, score double")

    def test_planted_overlap_wins(self, spark):
        a = self._ranking(spark, [(1, 9.0), (2, 8.0), (3, 7.0)])
        b = self._ranking(spark, [(9, 9.0), (2, 8.0), (8, 7.0)])
        out = rrf_fuse([(a, "score"), (b, "score")], k=10).collect()
        by_id = {r["doc_id"]: r for r in out}
        # doc 2: rank 2 in both → 2 * (1e6 div 62)
        assert by_id[2]["rrf_score"] == 2 * (1_000_000 // 62)
        assert by_id[2]["n_sources"] == 2
        # rank-1 singles: 1e6 div 61 < doc 2's fused score
        assert by_id[1]["rrf_score"] == 1_000_000 // 61
        assert out[0]["doc_id"] == 2

    def test_tie_break_by_id_and_k_cut(self, spark):
        a = self._ranking(spark, [(i, 10.0 - i) for i in range(1, 6)])
        b = self._ranking(spark, [(i + 100, 10.0 - i) for i in range(1, 6)])
        out = rrf_fuse([(a, "score"), (b, "score")], k=4).collect()
        # identical per-rank scores across sources → order by doc_id asc
        assert [r["doc_id"] for r in out] == [1, 101, 2, 102]

    def test_rank_ties_broken_by_id_within_source(self, spark):
        a = self._ranking(spark, [(5, 1.0), (3, 1.0), (4, 1.0)])
        out = rrf_fuse([(a, "score")], k=3).collect()
        # equal scores → row_number orders by id: 3,4,5 get ranks 1,2,3
        assert [r["doc_id"] for r in out] == [3, 4, 5]
        assert [r["rrf_score"] for r in out] == [
            1_000_000 // 61,
            1_000_000 // 62,
            1_000_000 // 63,
        ]


class TestEditDistanceAuto:
    def test_block_table_growth_law(self):
        from python_fastly_log_query_spark.operators.dedup import (
            editdist_block_table,
        )

        t = editdist_block_table()
        assert t[1] == 2 and t[2] == 2 and t[3] == 2
        assert t[4] == 3 and t[5] == 4 and t[12] == 11
        # monotone non-decreasing — more data never coarsens the block
        assert all(t[d + 1] >= t[d] for d in range(1, 12))

    def test_auto_widens_block_with_corpus_decade(self, spark):
        """At decade 4 (N ≥ 10^4) the auto dial blocks on 3 tokens: a
        pair sharing only its first 2 tokens drops out of the candidate
        set, while a 3-token-prefix pair is still found — the fixed
        bt=2 twin reports both."""
        from python_fastly_log_query_spark.operators.dedup import (
            editdist_neardup_auto,
            editdist_neardup_pairs,
        )

        filler = spark.range(15_000).selectExpr(
            "id + 100 AS doc_id", "concat('u', id, ' x y z') AS text"
        )
        planted = spark.createDataFrame(
            [
                (0, "p q r aaaa e f"),
                (1, "p q r aaab e f"),
                (2, "s t m1 c d"),
                (3, "s t m2 c d"),
            ],
            "doc_id long, text string",
        )
        docs = filler.unionAll(planted)
        fixed = {
            (r["doc_a"], r["doc_b"])
            for r in editdist_neardup_pairs(docs, max_dist=5).collect()
        }
        auto = {
            (r["doc_a"], r["doc_b"])
            for r in editdist_neardup_auto(docs, max_dist=5).collect()
        }
        assert fixed == {(0, 1), (2, 3)}
        assert auto == {(0, 1)}


class TestSCC:
    def test_two_cycles_with_bridge_and_feeder(self, spark):
        from python_fastly_log_query_spark.operators.webgraph import (
            scc_components,
        )

        # a<->b and c<->d are separate SCCs despite the b->c bridge;
        # feeder f->a reaches everything but nothing reaches it back
        edges = _edges(
            spark,
            [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("b", "c"), ("f", "a")],
        )
        rows = {r["host"]: r for r in scc_components(edges).collect()}
        assert rows["a"]["scc_id"] == rows["b"]["scc_id"] == "a"
        assert rows["c"]["scc_id"] == rows["d"]["scc_id"] == "c"
        assert rows["f"]["scc_id"] == "f"
        assert rows["a"]["scc_size"] == 2
        assert rows["c"]["scc_size"] == 2
        assert rows["f"]["scc_size"] == 1

    def test_long_cycle_needs_doubling(self, spark):
        from python_fastly_log_query_spark.operators.webgraph import (
            scc_components,
        )

        # a 12-node directed ring is one SCC of diameter 11 — covered by
        # 6 doubling rounds (2^6 = 64), NOT by 6 plain relaxations
        n = 12
        ring = [(f"n{i:02d}", f"n{(i + 1) % n:02d}") for i in range(n)]
        rows = scc_components(_edges(spark, ring)).collect()
        assert len(rows) == n
        assert {r["scc_id"] for r in rows} == {"n00"}
        assert all(r["scc_size"] == n for r in rows)


class TestCentrality:
    def test_path_graph_distances(self, spark):
        from python_fastly_log_query_spark.operators.webgraph import (
            centrality_stats,
        )

        rows = {
            r["host"]: r
            for r in centrality_stats(
                _edges(spark, [("a", "b"), ("b", "c")])
            ).collect()
        }
        assert rows["a"]["reachable"] == 2
        assert rows["a"]["eccentricity"] == 2
        assert rows["a"]["harmonic_ppm"] == 1_000_000 + 500_000
        assert rows["b"]["reachable"] == 1
        assert rows["b"]["harmonic_ppm"] == 1_000_000
        # sink: reaches nothing, zeros (harmonic handles it; closeness can't)
        assert rows["c"]["reachable"] == 0
        assert rows["c"]["eccentricity"] == 0
        assert rows["c"]["harmonic_ppm"] == 0

    def test_ring_needs_doubling(self, spark):
        from python_fastly_log_query_spark.operators.webgraph import (
            centrality_stats,
        )

        n = 12
        ring = [(f"n{i:02d}", f"n{(i + 1) % n:02d}") for i in range(n)]
        rows = centrality_stats(_edges(spark, ring)).collect()
        want = sum(1_000_000 // d for d in range(1, n))
        for r in rows:
            assert r["reachable"] == n - 1
            assert r["eccentricity"] == n - 1
            assert r["harmonic_ppm"] == want


class TestBMPCodec:
    def test_roundtrip_matches_rule_and_is_real_bmp(self, spark):
        import hashlib
        import struct

        from python_fastly_log_query_spark.operators.multimodal import (
            _bmp_px,
            bmp_from_docs,
            decode_bmp,
        )

        docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
        media = {r["media_id"]: bytes(r["data"]) for r in bmp_from_docs(docs).collect()}
        decoded = {r["media_id"]: r for r in decode_bmp(bmp_from_docs(docs)).collect()}
        for did, data in media.items():
            # independent header re-parse: magic, declared size == payload size
            assert data[:2] == b"BM"
            assert struct.unpack_from("<I", data, 2)[0] == len(data)
            w, h = 4 + did % 13, 3 + did % 5
            seed = int(hashlib.md5(f"bmp-{did}".encode()).hexdigest()[:8], 16)
            d = decoded[did]
            assert (d["width"], d["height"], d["bpp"]) == (w, h, 24)
            for ci, col in enumerate(("sum_r", "sum_g", "sum_b")):
                want = sum(
                    _bmp_px(seed, x, y, ci) for x in range(w) for y in range(h)
                )
                assert d[col] == want, (did, col)
            assert d["corner_rgb"] == (
                (_bmp_px(seed, 0, 0, 0) << 16)
                | (_bmp_px(seed, 0, 0, 1) << 8)
                | _bmp_px(seed, 0, 0, 2)
            )

    def test_corner_pins_bottom_up_row_order(self):
        """Flipping the stored rows of a valid payload (i.e. a writer
        that ignored BMP's bottom-up convention) keeps the permutation-
        invariant channel sums but MUST change corner_rgb."""
        import hashlib
        import io

        from python_fastly_log_query_spark.operators.multimodal import _bmp_parse

        # build one payload inline via the same code path (no Spark needed)
        import pandas as pd
        from python_fastly_log_query_spark.operators import multimodal as MM

        did, w, h = 1, 5, 4
        seed = int(hashlib.md5(f"bmp-{did}".encode()).hexdigest()[:8], 16)
        # reconstruct with the encoder's exact layout
        pad = (4 - (3 * w) % 4) % 4
        stride = 3 * w + pad
        body = bytearray()
        for y in range(h - 1, -1, -1):
            for x in range(w):
                body += bytes(
                    (MM._bmp_px(seed, x, y, 2), MM._bmp_px(seed, x, y, 1),
                     MM._bmp_px(seed, x, y, 0))
                )
            body += b"\x00" * pad
        import struct

        hdr = struct.pack("<2sIHHI", b"BM", 54 + h * stride, 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0
        )
        good = bytes(hdr + info + body)
        rows = [body[i * stride : (i + 1) * stride] for i in range(h)]
        flipped = bytes(hdr + info + b"".join(reversed(rows)))
        a, b = _bmp_parse(good), _bmp_parse(flipped)
        assert (a["sum_r"], a["sum_g"], a["sum_b"]) == (
            b["sum_r"], b["sum_g"], b["sum_b"],
        )
        assert a["corner_rgb"] != b["corner_rgb"]

    def test_decode_rejects_non_bmp(self, spark):
        import pytest as _pytest

        from python_fastly_log_query_spark.operators.multimodal import (
            _bmp_parse,
            decode_bmp,
        )

        assert _bmp_parse(b"GIF89a not a bitmap") is None
        bad = spark.createDataFrame(
            [(0, "image", b"GIF89a not a bitmap", {"codec": "gif"})],
            "media_id long, kind string, data binary, meta map<string,string>",
        )
        with _pytest.raises(Exception, match="BMP24"):
            decode_bmp(bad).collect()


class TestTfidfOverlap:
    def test_planted_rare_term_pair_outranks_common_overlap(self, spark):
        from python_fastly_log_query_spark.operators.corpus import (
            tfidf_overlap_pairs,
        )

        # docs 0/1 share a RARE bigram ("zq xk"); docs 2..9 all share a
        # COMMON one ("aa bb") — with a df cap of 5 the common term is
        # excluded from the index entirely, so only (0, 1) scores.
        rows = [(0, "zq xk p1"), (1, "zq xk p2")]
        rows += [(i, f"aa bb f{i}") for i in range(2, 10)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = tfidf_overlap_pairs(
            docs, ngram=2, df_cap=5, min_score=1
        ).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in got} == {(0, 1)}
        r = got[0]
        # n=10 docs, df("zq xk")=2 → idf_k = 10*1000 div 2 = 5000; tf 1·1
        assert r["shared_terms"] == 1
        assert r["overlap_score"] == 5000

    def test_tf_weighting_and_threshold(self, spark):
        from python_fastly_log_query_spark.operators.corpus import (
            tfidf_overlap_pairs,
        )

        # doc 0 repeats the rare bigram twice (as two disjoint windows),
        # so tf_a=2 doubles the pair score vs the single-occurrence pair
        docs = spark.createDataFrame(
            [
                (0, "zq xk r zq xk"),
                (1, "zq xk s"),
                (2, "zq xk t"),
            ],
            "doc_id long, text string",
        )
        got = {
            (r["doc_a"], r["doc_b"]): r["overlap_score"]
            for r in tfidf_overlap_pairs(
                docs, ngram=2, df_cap=5, min_score=1
            ).collect()
        }
        # df("zq xk")=3, n=3 → idf_k = 1000
        assert got[(1, 2)] == 1000
        assert got[(0, 1)] == 2000 and got[(0, 2)] == 2000
        # threshold is inclusive
        kept = tfidf_overlap_pairs(docs, ngram=2, df_cap=5, min_score=2000)
        assert {(r["doc_a"], r["doc_b"]) for r in kept.collect()} == {
            (0, 1),
            (0, 2),
        }


class TestAVICodec:
    def _payloads(self, spark, n=8):
        from python_fastly_log_query_spark.operators.multimodal import (
            avi_from_docs,
        )

        docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        return {
            r["media_id"]: bytes(r["data"])
            for r in avi_from_docs(docs).collect()
        }

    def test_roundtrip_matches_rule_and_is_real_avi(self, spark):
        import hashlib
        import struct

        from python_fastly_log_query_spark.operators.multimodal import (
            _avi_px,
            avi_from_docs,
            decode_avi,
        )

        docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
        media = self._payloads(spark)
        decoded = {
            r["media_id"]: r for r in decode_avi(avi_from_docs(docs)).collect()
        }
        for did, data in media.items():
            # independent container re-parse: RIFF magic + declared size
            assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
            assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8
            w, h, nf = 4 + did % 9, 2 + did % 4, 2 + did % 5
            rate = 10 + did % 20
            seed = int(hashlib.md5(f"avi-{did}".encode()).hexdigest()[:8], 16)
            d = decoded[did]
            assert (d["width"], d["height"], d["bpp"]) == (w, h, 24)
            assert (d["n_frames"], d["fps_rate"], d["fps_scale"]) == (nf, rate, 1)
            assert d["duration_ms"] == 1000 * nf // rate
            assert d["n_bytes"] == len(data)
            for ci, col in enumerate(("sum_r", "sum_g", "sum_b")):
                want = sum(
                    _avi_px(seed, f, x, y, ci)
                    for f in range(nf) for x in range(w) for y in range(h)
                )
                assert d[col] == want, (did, col)
            for f, col in ((0, "corner_rgb_f0"), (nf - 1, "corner_rgb_last")):
                assert d[col] == (
                    (_avi_px(seed, f, 0, 0, 0) << 16)
                    | (_avi_px(seed, f, 0, 0, 1) << 8)
                    | _avi_px(seed, f, 0, 0, 2)
                ), (did, col)

    def test_corner_last_pins_frame_order(self, spark):
        """Swapping the first and last '00db' chunks (a demuxer that
        emits frames out of order) keeps the order-invariant channel
        sums but MUST change corner_rgb_last (and _f0)."""
        from python_fastly_log_query_spark.operators.multimodal import (
            _avi_parse,
        )

        data = self._payloads(spark)[3]  # nf = 2 + 3 % 5 = 5 frames
        base = _avi_parse(data)
        movi = data.index(b"movi")
        first = data.index(b"00db", movi)
        sz = base["height"] * ((3 * base["width"] + 3) // 4 * 4)
        step = 8 + sz
        last = first + (base["n_frames"] - 1) * step
        swapped = bytearray(data)
        swapped[first:first + step], swapped[last:last + step] = (
            data[last:last + step], data[first:first + step])
        got = _avi_parse(bytes(swapped))
        assert (got["sum_r"], got["sum_g"], got["sum_b"]) == (
            base["sum_r"], base["sum_g"], base["sum_b"])
        assert got["corner_rgb_f0"] == base["corner_rgb_last"]
        assert got["corner_rgb_last"] == base["corner_rgb_f0"]
        assert got["corner_rgb_f0"] != base["corner_rgb_f0"]

    def test_walker_skips_junk_and_honors_word_alignment(self, spark):
        """A spec-honest reader must skip unknown top-level chunks and
        advance odd-sized chunks with the RIFF pad byte: inserting an
        odd-length JUNK chunk between hdrl and movi changes nothing."""
        import struct

        from python_fastly_log_query_spark.operators.multimodal import (
            _avi_parse,
        )

        data = self._payloads(spark)[1]
        base = _avi_parse(data)
        movi = data.index(b"LIST" + struct.pack(
            "<I", 0)[:0] + b"")  # placeholder, recompute below
        # locate the movi LIST header (the LIST whose type is 'movi')
        i = 12
        while True:
            cid = data[i:i + 4]
            (sz,) = struct.unpack_from("<I", data, i + 4)
            if cid == b"LIST" and data[i + 8:i + 12] == b"movi":
                break
            i += 8 + sz + (sz & 1)
        junk = b"JUNK" + struct.pack("<I", 7) + b"padding" + b"\x00"  # odd+pad
        patched = bytearray(data[:i] + junk + data[i:])
        struct.pack_into(
            "<I", patched, 4,
            struct.unpack_from("<I", bytes(patched), 4)[0] + len(junk))
        got = _avi_parse(bytes(patched))
        assert got is not None
        got["n_bytes"] = base["n_bytes"]  # only size may differ
        assert got == base

    def test_strict_decode_rejects_non_avi(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from python_fastly_log_query_spark.operators.multimodal import (
            _avi_parse, avi_from_docs, decode_avi,
        )

        assert _avi_parse(b"RIFF\x04\x00\x00\x00WAVE") is None
        assert _avi_parse(b"not a riff at all") is None
        docs = spark.createDataFrame([(1,)], "doc_id long")
        broken = avi_from_docs(docs).withColumn(
            "data", F.expr("substring(data, 1, 40)"))
        with pytest.raises(Exception):
            decode_avi(broken).collect()


class TestAVIFrameSample:
    def test_sampled_frames_exact_and_skipped_bytes_irrelevant(self, spark):
        """Every 2nd frame comes back with rule-exact sums/corner, and
        corrupting a SKIPPED (odd) frame's pixels changes nothing — the
        sampler's output is a function of the sampled byte ranges only."""
        from python_fastly_log_query_spark.operators.multimodal import (
            _avi_px,
            avi_frame_sample,
            avi_from_docs,
        )
        import hashlib
        import struct

        docs = spark.createDataFrame([(3,)], "doc_id long")  # nf=5, w=7, h=5
        media = avi_from_docs(docs)
        base = sorted(
            (r["frame_index"], r["sum_r"], r["sum_g"], r["sum_b"], r["corner_rgb"])
            for r in avi_frame_sample(media, every_n=2).collect()
        )
        w, h, nf = 7, 5, 5
        seed = int(hashlib.md5(b"avi-3").hexdigest()[:8], 16)
        want = []
        for f in range(0, nf, 2):
            sums = [
                sum(_avi_px(seed, f, x, y, c) for x in range(w) for y in range(h))
                for c in range(3)
            ]
            corner = (
                (_avi_px(seed, f, 0, 0, 0) << 16)
                | (_avi_px(seed, f, 0, 0, 1) << 8)
                | _avi_px(seed, f, 0, 0, 2)
            )
            want.append((f, sums[0], sums[1], sums[2], corner))
        assert base == want

        # corrupt frame 1 (odd => skipped) in the raw payload
        data = bytes(media.collect()[0]["data"])
        movi = data.index(b"movi")
        first = data.index(b"00db", movi)
        stride = (3 * w + 3) // 4 * 4
        step = 8 + h * stride
        blob = bytearray(data)
        for i in range(first + step + 8, first + 2 * step):
            blob[i] ^= 0xFF
        corrupted = spark.createDataFrame(
            [(3, "video", bytes(blob), {})],
            "media_id long, kind string, data binary, meta map<string,string>",
        )
        got = sorted(
            (r["frame_index"], r["sum_r"], r["sum_g"], r["sum_b"], r["corner_rgb"])
            for r in avi_frame_sample(corrupted, every_n=2).collect()
        )
        assert got == want
