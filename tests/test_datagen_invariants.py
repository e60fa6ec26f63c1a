"""Datagen determinism + the north-rule per-row invariant
(BASELINE.json input_hint: "byte-identical extracted text per url")."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_fastly_log_query_spark.datagen import generate_docs
from python_fastly_log_query_spark.operators.parse import parse_logs


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_generate_docs_partition_invariant(spark):
    """Every field is a pure function of the row id (no RNG state), so the
    table is identical at any partition count."""
    a = generate_docs(spark, 2000, partitions=2)
    b = generate_docs(spark, 2000, partitions=16)
    assert _rows(a.select("url", "text", "lang", "host")) == _rows(
        b.select("url", "text", "lang", "host")
    )


def test_byte_identical_extracted_text_per_url(spark):
    """The parse stage must carry each row's text through unmodified:
    for every url, the parser's raw_line equals the input text
    byte-for-byte (malformed lines included — raw_line always survives,
    reference src/parse/log_parser.py:69)."""
    docs = generate_docs(spark, 3000, malformed_pct=10, partitions=8)
    parsed = parse_logs(docs, "text", passthrough=["url"],
                        columns=["raw_line", "status_code"])
    joined = parsed.join(docs.select("url", "text"), "url")
    mismatches = joined.filter(F.col("raw_line") != F.trim(F.col("text"))).count()
    assert mismatches == 0
    assert parsed.count() == 3000
    # html column is the utf-8 encoding of text (input-table contract)
    assert docs.filter(F.decode("html", "UTF-8") != F.col("text")).count() == 0


def test_parse_from_html_bytes_equals_text(spark):
    """north rule input: the html BINARY column parses byte-identically
    to the text column (JVM-side UTF-8 decode ahead of the Arrow stage)."""
    from python_fastly_log_query_spark.operators.parse import parse_logs

    docs = generate_docs(spark, 500, partitions=4)
    cols = ["timestamp", "ip_address", "status_code", "response_size"]
    a = parse_logs(docs, "text", columns=cols)
    b = parse_logs(docs, "html", columns=cols)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))
    assert a.count() > 400  # malformed_pct only drops the junk tail
