"""Schemas: the Common-Crawl-style input table and the parsed log record.

The input table shape follows the graft spec (BASELINE.json input_hint):
``(url string, warc_ts timestamp, html binary, text string, lang string)``
where ``text`` carries the raw log payload.

The parsed record is one fixed, all-nullable StructType — the reference's
"truly lazy" dynamic schema (reference src/parse/log_parser.py:52-56) is
reproduced by the parser emitting nulls for absent fields, not by a dynamic
schema (SURVEY.md §1.4).  Column/type mapping per reference
src/parse/log_parser.py:69-186 (see SURVEY.md §1.3 for the field table).
"""

from __future__ import annotations

from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

# Parsed log record fields, in reference emission order
# (reference src/parse/log_parser.py:69-108).
PARSED_FIELDS = [
    T.StructField("raw_line", T.StringType()),
    T.StructField("priority", T.IntegerType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("cache_server", T.StringType()),
    T.StructField("process", T.StringType()),
    T.StructField("pid", T.IntegerType()),
    T.StructField("ip_address", T.StringType()),
    T.StructField("referrer1", T.StringType()),
    T.StructField("referrer2", T.StringType()),
    T.StructField("date_string", T.StringType()),
    T.StructField("http_method", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("query_string", T.StringType()),
    T.StructField("query_params", T.MapType(T.StringType(), T.StringType())),
    T.StructField("status_code", T.IntegerType()),
    T.StructField("response_size", T.LongType()),
    T.StructField("referrer", T.StringType()),
    T.StructField("user_agent", T.StringType()),
    T.StructField("cache_status", T.StringType()),
]

PARSED_SCHEMA = T.StructType(PARSED_FIELDS)

PARSED_COLUMN_NAMES = [f.name for f in PARSED_FIELDS]


def parsed_schema_with(extra: list[T.StructField]) -> T.StructType:
    """Parsed record schema plus passthrough/lineage columns (prepended)."""
    return T.StructType(list(extra) + PARSED_FIELDS)
