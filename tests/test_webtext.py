"""Webtext crawl-pass operators (operators/webtext.py): URL
canonicalization, registered-domain extraction, HTML text extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_fastly_log_query_spark.operators.webtext import (
    canonicalize_url,
    extract_text,
    registered_domain,
)

URL_CASES = [
    # (raw, canonical)
    ("https://www.Site.COM/a/b/?id=1#frag", "https://site.com/a/b?id=1"),
    ("HTTPS://site.com:443/a", "https://site.com/a"),
    ("http://site.com:80/", "http://site.com/"),
    ("https://site.com", "https://site.com/"),
    ("https://site.com/p?utm_source=x&id=2&utm_medium=y", "https://site.com/p?id=2"),
    ("https://site.com/p?b=2&a=1", "https://site.com/p?a=1&b=2"),
    ("https://site.com/p?gclid=abc&fbclid=def&ref=home", "https://site.com/p"),
    # non-default port and non-www subdomain are preserved
    ("https://cdn.site.com:8443/x/", "https://cdn.site.com:8443/x"),
    # refserved=... is a real param (only exact key 'ref' is tracking)
    ("https://site.com/p?refserved=1", "https://site.com/p?refserved=1"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(r, c) for r, c in URL_CASES], "raw string, want string"
    ).withColumn("got", canonicalize_url(F.col("raw")))
    bad = df.filter(F.col("got") != F.col("want")).collect()
    assert not bad, [(r.raw, r.got, r.want) for r in bad]


def test_canonicalize_url_idempotent(spark):
    df = spark.createDataFrame(
        [(r,) for r, _ in URL_CASES], "raw string"
    )
    once = canonicalize_url(F.col("raw"))
    df = df.select(once.alias("c1"), canonicalize_url(once).alias("c2"))
    bad = df.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad


DOMAIN_CASES = [
    ("www.site.com", "site.com"),
    ("a.b.site.co.uk", "site.co.uk"),
    ("site.co.uk", "site.co.uk"),
    ("co.uk", None),  # the suffix alone is not a registered domain
    ("site.unknowntld", None),
    ("com", None),
    ("x.org.uk", "x.org.uk"),
]


def test_registered_domain(spark):
    df = spark.createDataFrame([(h,) for h, _ in DOMAIN_CASES], "host string")
    got = {
        r.host: r.registered_domain
        for r in registered_domain(df, "host", spark).collect()
    }
    for host, want in DOMAIN_CASES:
        assert got[host] == want, (host, got[host], want)


def test_registered_domain_broadcasts(spark):
    df = spark.createDataFrame([("www.site.com",)], "host string")
    explained = (
        registered_domain(df, "host", spark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in explained
    assert "SortMergeJoin" not in explained


def test_extract_text_drops_script_style_and_decodes(spark):
    html = (
        "<html>\n<body>\n<script>var x = 1 < 2;</script>"
        "<style>p { }</style><p>A &amp; B &lt;tag&gt; &quot;q&quot; "
        "&#39;s&#39;</p>\n<b>end</b></html>"
    )
    df = spark.createDataFrame([(html.encode(),)], "html binary")
    got = df.select(extract_text(F.col("html")).alias("t")).collect()[0].t
    assert got == 'A & B <tag> "q" \'s\' end'


def test_extract_text_double_escaped_stays_literal(spark):
    # '&amp;lt;' is the LITERAL text '&lt;' — must not decode twice to '<'
    df = spark.createDataFrame([("<p>&amp;lt;</p>".encode(),)], "html binary")
    got = df.select(extract_text(F.col("html")).alias("t")).collect()[0].t
    assert got == "&lt;"


# ------------------------------------------------- host boilerplate lines


def _pages(spark, rows):
    return spark.createDataFrame(
        [(i, h, t) for i, (h, t) in enumerate(rows)],
        "doc_id long, host string, text string",
    )


def test_boilerplate_strips_chrome_keeps_content(spark):
    from python_fastly_log_query_spark.operators.webtext import (
        host_boilerplate_strip,
    )

    rows = [
        ("a", "nav\ncontent one\nfooter"),
        ("a", "nav\ncontent two\nfooter"),
        ("a", "nav\ncontent three\nrare promo\nfooter"),
        ("a", "nav\ncontent four\nfooter"),
        # host b: nothing repeats; 1 of 2 pages = exactly 50%, NOT > 50%
        ("b", "content five\nother"),
        ("b", "content six"),
    ]
    out = {
        r["doc_id"]: r
        for r in host_boilerplate_strip(_pages(spark, rows)).collect()
    }
    # host a: nav+footer on 4/4 pages -> stripped; content + 1/4 promo kept
    assert out[0]["n_lines"] == 3 and out[0]["kept_lines"] == 1
    assert out[2]["n_lines"] == 4 and out[2]["kept_lines"] == 2
    # host b: no line repeats across pages -> everything kept
    assert out[4]["kept_lines"] == 2 and out[5]["kept_lines"] == 1


def test_boilerplate_all_chrome_page_drops_to_null(spark):
    from python_fastly_log_query_spark.operators.webtext import (
        host_boilerplate_strip,
    )

    rows = [("a", "nav\nfooter"), ("a", "nav\nfooter"), ("a", "nav\nx\nfooter")]
    out = {
        r["doc_id"]: r
        for r in host_boilerplate_strip(_pages(spark, rows)).collect()
    }
    assert out[0]["kept_lines"] == 0 and out[0]["clean_md5"] is None
    assert out[2]["kept_lines"] == 1 and out[2]["clean_md5"] is not None


def test_boilerplate_is_host_scoped(spark):
    from python_fastly_log_query_spark.operators.webtext import (
        host_boilerplate_strip,
    )

    # the same line is chrome on host a (2/2 pages) but content on host b
    rows = [
        ("a", "shared\nu1"),
        ("a", "shared\nu2"),
        ("b", "shared\nu3"),
        ("b", "u4"),
    ]
    out = {
        r["doc_id"]: r
        for r in host_boilerplate_strip(_pages(spark, rows)).collect()
    }
    assert out[0]["kept_lines"] == 1  # 'shared' stripped on host a (2/2)
    assert out[2]["kept_lines"] == 2  # kept on host b (1/2 not > 50%)


def test_boilerplate_min_pages_guard(spark):
    from python_fastly_log_query_spark.operators.webtext import (
        host_boilerplate_strip,
    )

    # single-page host: nothing can be chrome regardless of frequency
    rows = [("solo", "only\nonly\nonly")]
    out = host_boilerplate_strip(_pages(spark, rows)).collect()[0]
    assert out["n_lines"] == 3 and out["kept_lines"] == 3


# ---------------------------------------------------- crawl snapshot delta


def test_snapshot_delta_statuses(spark):
    from python_fastly_log_query_spark.operators.webtext import snapshot_delta

    old = spark.createDataFrame(
        [("u1", "f1"), ("u2", "f2"), ("u3", "f3")], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("u1", "f1"), ("u2", "f2x"), ("u4", "f4")], "url string, fp string"
    )
    out = {r["url"]: r["status"] for r in snapshot_delta(old, new).collect()}
    assert out == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "added",
    }


# ------------------------------------------------------- domain scorecard


def test_domain_scorecard_verdicts(spark):
    from python_fastly_log_query_spark.operators.webtext import domain_scorecard

    rows = [
        # good.com: 2 unique, long-enough pages, english
        (0, "a.good.com", "one two three four five six", "en"),
        (1, "good.com", "seven eight nine ten eleven twelve", "en"),
        # spam.com: both pages share text with each other -> dup_ppm 1e6
        (2, "spam.com", "buy now cheap deals online today", "en"),
        (3, "www.spam.com", "buy now cheap deals online today", "en"),
        # thin.org: unique but 2-token pages -> mean_tokens < 5
        (4, "thin.org", "click here", "de"),
        # blocked.net: fine content but blocklisted
        (5, "blocked.net", "perfectly reasonable content right here", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "doc_id long, host string, text string, lang string"
    )
    bl = spark.createDataFrame([("blocked.net",)], "registered_domain string")
    out = {
        r["registered_domain"]: r
        for r in domain_scorecard(pages, bl, spark).collect()
    }
    assert out["good.com"]["keep"] == 1 and out["good.com"]["dup_ppm"] == 0
    assert out["good.com"]["n_pages"] == 2 and out["good.com"]["en_ppm"] == 1_000_000
    assert out["spam.com"]["keep"] == 0 and out["spam.com"]["dup_ppm"] == 1_000_000
    assert out["thin.org"]["keep"] == 0 and out["thin.org"]["mean_tokens"] == 2
    assert out["blocked.net"]["keep"] == 0 and out["blocked.net"]["blocklisted"] == 1


def test_domain_scorecard_dup_is_corpus_wide(spark):
    from python_fastly_log_query_spark.operators.webtext import domain_scorecard

    # the same text on two DIFFERENT domains still counts as dup for both
    rows = [
        (0, "a.com", "mirrored syndicated article text here", "en"),
        (1, "b.com", "mirrored syndicated article text here", "en"),
        (2, "b.com", "an original piece of writing entirely", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "doc_id long, host string, text string, lang string"
    )
    bl = spark.createDataFrame([], "registered_domain string")
    out = {
        r["registered_domain"]: r
        for r in domain_scorecard(pages, bl, spark).collect()
    }
    assert out["a.com"]["dup_ppm"] == 1_000_000
    assert out["b.com"]["dup_ppm"] == 500_000


def test_normalize_text_rules_and_idempotency(spark):
    from python_fastly_log_query_spark.operators.webtext import (
        normalize_text,
        normalize_text_sql,
    )

    noisy = (
        "  \u201cIntro\u201d \u2014 body  text\r\n\u00a0tail\u2026\u200b"
        "\r\rx\ty  \n\n\n\n\u2018q\u2019 end  "
    )
    expect = '"Intro" - body text\ntail...\n\nx y\n\n\'q\' end'
    df = spark.createDataFrame([(noisy,)], "t string")
    got = df.select(normalize_text(F.col("t")).alias("n")).first().n
    # idempotent: a second pass is a no-op
    got2 = df.select(
        normalize_text(normalize_text(F.col("t"))).alias("n")
    ).first().n
    # DuckDB twin produces the identical bytes
    import duckdb

    ddb = duckdb.execute(
        "SELECT " + normalize_text_sql("?"), [noisy]
    ).fetchone()[0]
    assert got == ddb
    assert got2 == got
    assert got == expect


def test_url_filter_verdicts_and_precedence(spark):
    from python_fastly_log_query_spark.operators.webtext import url_filter

    cases = [
        ("https://a.com/casino/x?id=1", "blocked_token"),
        ("https://a.com/static/app.js", "non_content_ext"),
        ("https://a.com/feed.rss?x=1", "non_content_ext"),
        ("https://a.com/" + "p" * 300, "too_long"),
        ("https://a.com/p?" + "&".join(f"k{i}=1" for i in range(9)), "too_many_params"),
        ("https://a.com/article/1?id=2", "keep"),
        ("https://a.com/p", "keep"),  # no query at all
        # precedence: blocked token beats too_long and bad ext
        ("https://a.com/casino/" + "x" * 300 + ".js", "blocked_token"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r.url: r.verdict for r in url_filter(df).collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_robots_rules_and_check(spark):
    from python_fastly_log_query_spark.operators.webtext import (
        robots_check,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
                      "Disallow: /tmp\n\nUser-agent: evilbot\nDisallow: /"),
            # stacked UA lines share one block; later non-star block ignored
            ("b.com", "User-agent: evilbot\nUser-agent: *\nDisallow: /x\n\n"
                      "User-agent: other\nDisallow: /y"),
            ("c.com", "User-agent: bot\nDisallow: /z"),   # no star rules
            ("d.com", "User-agent: *\nDisallow:"),        # allow-all
        ],
        "host string, robots_txt string",
    )
    rules = {(r.host, r.prefix): r.allow for r in robots_rules(robots).collect()}
    assert rules == {
        ("a.com", "/private"): 0,
        ("a.com", "/private/ok"): 1,
        ("a.com", "/tmp"): 0,
        ("b.com", "/x"): 0,
    }
    pages = spark.createDataFrame(
        [
            (1, "a.com", "/private/doc"),   # blocked
            (2, "a.com", "/private/ok/doc"),  # longest prefix allows
            (3, "a.com", "/pub"),           # no rule -> allowed
            (5, "b.com", "/x/1"),           # star rule from stacked block
            (6, "b.com", "/y/1"),           # other-bot rule ignored
            (7, "c.com", "/z"),             # bot-only file -> allowed
            (8, "d.com", "/q"),             # empty Disallow -> allowed
        ],
        "page_id long, host string, path string",
    )
    got = {r.page_id: r.allowed for r in robots_check(pages, robots_rules(robots)).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 5: 0, 6: 1, 7: 1, 8: 1}


def test_script_mix_dominance_and_ppm(spark):
    from python_fastly_log_query_spark.operators.webtext import script_mix

    rows = [
        (0, "hello world"),                 # pure latin
        (1, "Абв x"),        # cyrillic beats 1 latin char
        (2, "中文中文 ab"),  # han dominant
        (3, "1234567890 ab"),               # digits dominant
        (4, ""),                            # empty -> other, 0 ppm
        (5, "!!??"),                        # no class scores -> other
        (6, "abАб"),              # 2-2 tie -> earlier class wins
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in script_mix(docs).collect()}
    # "hello world": 10 latin chars / 11 total -> 909090 ppm (floored)
    assert out[0].dominant == "latin" and out[0].latin_ppm == 909090
    assert out[1].dominant == "cyrillic"
    assert out[2].dominant == "han"
    assert out[3].dominant == "digit"
    assert out[4].dominant == "other" and out[4].latin_ppm == 0
    assert out[5].dominant == "other"
    # strict-greater rule: ties keep the earlier class in SCRIPT_CLASSES
    assert out[6].dominant == "latin"


# -------------------------------------------------------- crawl politeness


def test_crawl_waves_politeness_and_priority(spark):
    from pyspark.sql import functions as F

    from python_fastly_log_query_spark.operators.webtext import crawl_waves

    rows = [(f"u{i:02d}", "a.com" if i < 20 else "b.com", 100 - i) for i in range(25)]
    urls = spark.createDataFrame(rows, "url string, host string, score long")
    out = crawl_waves(
        urls, order_by=[F.desc("score"), F.asc("url")], per_wave=8
    ).collect()
    per = {}
    for r in out:
        per.setdefault((r["host"], r["wave"]), []).append(r)
    # politeness: never more than per_wave URLs of one host in a wave
    assert max(len(v) for v in per.values()) <= 8
    # a.com has 20 urls -> waves 0,1,2 sized 8/8/4; b.com all in wave 0
    assert sorted(len(per[("a.com", w)]) for w in (0, 1, 2)) == [4, 8, 8]
    assert len(per[("b.com", 0)]) == 5
    # priority: every wave-0 score >= every wave-1 score within a host
    a0 = min(r["score"] for r in per[("a.com", 0)])
    a1 = max(r["score"] for r in per[("a.com", 1)])
    assert a0 >= a1


def test_crawl_waves_deterministic_under_partitioning(spark):
    from pyspark.sql import functions as F

    from python_fastly_log_query_spark.operators.webtext import crawl_waves

    rows = [(f"u{i}", f"h{i % 5}", i * 7 % 13) for i in range(60)]
    urls = spark.createDataFrame(rows, "url string, host string, score long")
    order = [F.desc("score"), F.asc("url")]
    a = {(r["url"], r["wave"]) for r in crawl_waves(urls, order_by=order).collect()}
    b = {
        (r["url"], r["wave"])
        for r in crawl_waves(urls.repartition(16), order_by=order).collect()
    }
    assert a == b
