"""Data-quality profiling and rule validation (the Deequ/Great-
Expectations shape) — the audit pass a pipeline runs on every ingested
table before trusting it downstream (reference analog: the summary
rollups of ``/root/reference/src/analyze/analytics.py`` generalized to
per-COLUMN metadata instead of per-key analytics).

Scale shape: both passes are ONE multi-aggregate over the table — every
metric (count, null count, distinct count, min/max, rule violations) is
an associative aggregate with map-side partials, so the whole audit is
one scan + one 1-ROW reduce no matter the table size.  The only
scale-sensitive metric is the exact ``countDistinct`` (Spark plans a
per-column Expand); at fleet scale swap ``exact_distinct=False`` for
``approx_count_distinct`` (the engine's HLL) — the same exact↔approx
dial as the percentile call sites, flagged per call.

min/max render AFTER aggregation (``min(col)`` then cast to string), so
numeric columns order numerically, not lexically; bigint/varchar
renderings are byte-identical across engines (doubles are excluded from
min/max profiling for exactly that reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str],
            exact_distinct: bool = True) -> DataFrame:
    """One-pass per-column profile: ``(column, n_rows, n_null,
    n_distinct, min_s, max_s)`` — one output row per profiled column,
    computed in a single aggregate over one scan."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        nd = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            nd.cast("long").alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    parts = [
        row.select(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
        )
        for c in columns
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def validate(df: DataFrame, rules: list[tuple[str, str, object]]) -> DataFrame:
    """Rule validation in ONE aggregate: rules are ``(column, rule,
    param)`` with rule ∈ {not_null, unique, in_set, non_negative};
    returns ``(column, rule, violations, passed)`` per rule.

    unique counts duplicate NON-NULL values (count(c) - distinct(c));
    in_set counts non-null values outside ``param`` (a list); the rule
    table is data, so new checks deploy without replanning anything
    upstream."""
    aggs = []
    for i, (c, rule, param) in enumerate(rules):
        col = F.col(c)
        if rule == "not_null":
            v = F.sum(col.isNull().cast("long"))
        elif rule == "unique":
            v = F.count(col) - F.countDistinct(col)
        elif rule == "in_set":
            v = F.sum((col.isNotNull() & ~col.isin(list(param))).cast("long"))
        elif rule == "non_negative":
            v = F.sum((col < 0).cast("long"))
        else:
            raise ValueError(f"unknown rule {rule!r}")
        aggs.append(v.cast("long").alias(f"r{i}"))
    row = df.agg(*aggs)
    parts = [
        row.select(
            F.lit(c).alias("column"),
            F.lit(rule).alias("rule"),
            F.col(f"r{i}").alias("violations"),
            (F.col(f"r{i}") == 0).cast("long").alias("passed"),
        )
        for i, (c, rule, _) in enumerate(rules)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
