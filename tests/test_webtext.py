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
