"""Parsed-record sinks and analysis sources (SURVEY.md §2.1 S7-S9).

Reference round-trip contract:
- JSON sink: array of row objects (src/parse/log_parser.py:220-230) —
  Spark idiom is JSON-lines (one object per line, splittable); the
  analysis source accepts both.
- CSV sink: the one map column (``query_params``) is JSON-stringified
  (src/parse/log_parser.py:233-252) and re-hydrated on load
  (src/analyze/analytics.py:27-30) → ``to_json`` / ``from_json``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAP = T.MapType(T.StringType(), T.StringType())


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (timestamps as ISO strings, like the reference)."""
    out = df
    if "timestamp" in df.columns:
        out = out.withColumn(
            "timestamp", F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss")
        )
    out.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.json(path)
    if "query_params" in df.columns:
        # schema inference reads the map as a struct of observed keys;
        # restore the MapType contract (SURVEY.md §1.3)
        df = df.withColumn("query_params", F.from_json(F.to_json("query_params"), _MAP))
    if "timestamp" in df.columns:
        df = df.withColumn(
            "timestamp", F.to_timestamp("timestamp", "yyyy-MM-dd'T'HH:mm:ss")
        )
    return df


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with the query_params map JSON-stringified (ref S8)."""
    out = df
    if "query_params" in df.columns:
        out = out.withColumn("query_params", F.to_json("query_params"))
    if "timestamp" in df.columns:
        out = out.withColumn(
            "timestamp", F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss")
        )
    out.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV analysis source with map re-hydration (ref S9)."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    if "query_params" in df.columns:
        df = df.withColumn("query_params", F.from_json("query_params", _MAP))
    if "timestamp" in df.columns and dict(df.dtypes)["timestamp"] == "string":
        df = df.withColumn(
            "timestamp", F.to_timestamp("timestamp", "yyyy-MM-dd'T'HH:mm:ss")
        )
    return df
