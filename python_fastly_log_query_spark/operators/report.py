"""Report tree: the reference's nested six-branch analytics dict
(reference src/analyze/analytics.py:1030-1037; renderer :845-995),
computed off ONE cached parsed DataFrame.

The reference re-materializes a pandas frame per analyze function
(SURVEY.md §3.2 — the plan is re-scanned six-plus times); here every
branch shares the same cached lineage, so the whole report is one scan
plus cheap aggregations.  Output is a plain JSON-serializable dict whose
keys mirror the reference's report so downstream consumers (dashboards,
the CLI renderer) can switch without changes.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame

from . import aggregates as A


def _kv(df: DataFrame, k: str, v: str) -> dict:
    return {str(r[k]): _py(r[v]) for r in df.collect()}


def _py(v):
    if hasattr(v, "item"):
        return v.item()
    return v


def _row(df: DataFrame) -> dict:
    rows = df.collect()
    return {k: _py(v) for k, v in rows[0].asDict().items()} if rows else {}


def _records(df: DataFrame) -> list[dict]:
    return [{k: _py(v) for k, v in r.asDict().items()} for r in df.collect()]


def traffic(df: DataFrame) -> dict:
    """analyze_traffic_patterns (reference src/analyze/analytics.py:36-82)."""
    return {
        "total_requests": df.count(),
        "requests_per_hour": _kv(A.requests_per_hour(df), "hour", "requests"),
        "requests_per_day": _kv(A.requests_per_day(df), "day", "requests"),
        "popular_endpoints": _kv(A.popular_endpoints(df), "path", "requests"),
        "http_methods": _kv(A.http_methods(df), "http_method", "requests"),
    }


def errors(df: DataFrame) -> dict:
    """analyze_errors (reference src/analyze/analytics.py:85-124)."""
    return {
        "status_code_distribution": _kv(
            A.status_code_distribution(df), "status_code", "requests"
        ),
        **_row(A.error_rates(df)),
        "error_endpoints": _kv(A.error_endpoints(df), "path", "errors"),
    }


def performance(df: DataFrame) -> dict:
    """analyze_performance (reference src/analyze/analytics.py:127-185)."""
    return {
        "cache_statistics": _kv(A.cache_statistics(df), "cache_status", "requests"),
        **_row(A.cache_hit_miss_rates(df)),
        "response_size_statistics": _row(A.response_size_stats(df)),
        "top_endpoints_by_size": _records(A.top_endpoints_by_size(df)),
    }


def user_agents(df: DataFrame) -> dict:
    """analyze_user_agents (reference src/analyze/analytics.py:188-259)."""
    return {
        "top_user_agents": _kv(A.top_user_agents(df), "user_agent", "requests"),
        "agent_type_distribution": _kv(
            A.agent_type_distribution(df), "agent_type", "requests"
        ),
    }


def query_patterns(df: DataFrame) -> dict:
    """analyze_query_patterns (reference src/analyze/analytics.py:262-306)."""
    pv: dict[str, dict[str, int]] = {}
    for r in A.parameter_value_distributions(df).collect():
        pv.setdefault(r["param"], {})[str(r["value"])] = _py(r["occurrences"])
    return {
        "most_common_parameters": _kv(
            A.most_common_parameters(df), "param", "occurrences"
        ),
        "parameter_value_distributions": pv,
        "top_query_signatures": _kv(
            A.top_query_signatures(df), "signature", "requests"
        ),
    }


def slowness_investigation(df: DataFrame) -> dict:
    """analyze_slowness_patterns (reference src/analyze/analytics.py:309-639)."""
    return {
        "requests_by_hour": _kv(A.requests_by_hour_of_day(df), "hour_of_day", "requests"),
        "peak_hour": _row(A.peak_hour(df)),
        "peak_minute": _row(A.peak_minute(df)),
        "largest_traffic_spikes": _records(A.largest_traffic_spikes(df)),
        "requests_by_day_of_week": _kv(
            A.requests_by_day_of_week(df), "day_of_week", "requests"
        ),
        "high_cache_miss_endpoints": _kv(
            A.high_cache_miss_endpoints(df), "path", "miss_rate"
        ),
        "cache_miss_rate_by_hour": _kv(
            A.cache_miss_rate_by_hour(df), "hour_of_day", "miss_rate"
        ),
        "hourly_cache_performance": _records(A.hourly_cache_performance(df)),
        "large_response_endpoints": _records(A.large_response_endpoints(df)),
        "outlier_large_responses": _records(A.outlier_large_responses(df)),
        "hourly_response_sizes": _records(A.hourly_response_sizes(df)),
        "high_error_rate_endpoints": _kv(
            A.high_error_rate_endpoints(df), "path", "error_rate"
        ),
        "server_errors_by_hour": _kv(
            A.server_errors_by_hour(df), "hour_of_day", "server_errors"
        ),
        "hourly_error_rates": _records(A.hourly_error_rates(df)),
        "complex_query_endpoints": _records(A.complex_query_endpoints(df)),
        "top_request_ips": _kv(A.top_request_ips(df), "ip_address", "requests"),
        "top_request_ips_with_ua": _records(A.top_request_ips_with_ua(df)),
        "top_ips_by_request_rate": _records(A.top_ips_by_request_rate(df)),
        "user_agent_response_sizes": _records(A.user_agent_response_sizes(df)),
    }


def full_report(df: DataFrame) -> dict:
    """The six-branch report tree (reference scripts/analyze_logs.py:956-965,
    src superset A:1030-1037), one cached scan for all branches."""
    df = df.cache()
    try:
        return {
            "traffic": traffic(df),
            "errors": errors(df),
            "performance": performance(df),
            "user_agents": user_agents(df),
            "query_patterns": query_patterns(df),
            "slowness_investigation": slowness_investigation(df),
        }
    finally:
        df.unpersist()


def endpoint_report(df: DataFrame, endpoint: str) -> dict:
    """analyze_endpoint drill-down (reference src/analyze/analytics.py:642-759),
    incl. query_parameters.parameter_values (ref :746-757): top-5 values for
    the first-5 params, first-seen ordered when lineage columns exist."""
    parts = A.analyze_endpoint(df, endpoint)
    pv: dict[str, dict[str, int]] = {}
    for r in parts["parameter_values"].collect():
        pv.setdefault(r["param"], {})[str(r["value"])] = _py(r["occurrences"])
    most_common = _kv(parts["most_common_params"], "param", "occurrences")
    return {
        "endpoint": endpoint,
        "requests_by_hour": _kv(parts["requests_by_hour"], "hour_of_day", "requests"),
        "peak_hours": _records(parts["peak_hours"]),
        "status_codes": _kv(parts["status_codes"], "status_code", "requests"),
        "error_analysis": _row(parts["error_analysis"]),
        "response_size_stats": _row(parts["response_size_stats"]),
        "cache_analysis": _row(parts["cache_analysis"]),
        "most_common_params": most_common,
        "query_parameters": {
            "most_common": most_common,
            "parameter_values": pv,
        },
    }


def daily_summary_report(df: DataFrame) -> dict:
    """analyze_daily_summary (reference src/analyze/analytics.py:762-842)."""
    return {"days": _records(A.daily_summary(df))}


def write_report(report: dict, path: str | Path) -> None:
    Path(path).write_text(json.dumps(report, indent=2, default=str))
