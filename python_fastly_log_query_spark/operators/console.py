"""Console report renderer — the reference's text report with its display
thresholds (reference src/analyze/analytics.py:845-995; SURVEY.md §2.3 F8).

Renders the ``report.full_report`` dict; the two threshold FILTERS the
reference applies at render time (not in analytics) live here as named
selections so they are independently testable:

- cache-miss endpoints shown only when miss_rate > 50%  (ref :932-938)
- error-rate endpoints shown only when error_rate > 5%  (ref :960-966)

Key names follow this repo's report dict (e.g. ``mean_size`` where the
reference emits ``mean``); section order and limits mirror the reference.
"""

from __future__ import annotations

HIGH_MISS_THRESHOLD = 50.0  # ref analytics.py:933
HIGH_ERROR_THRESHOLD = 5.0  # ref analytics.py:961


def select_high_miss(high_cache_miss_endpoints: dict[str, float]) -> list[tuple[str, float]]:
    """F8a (ref :932-938): paths above 50% miss rate, rate-desc, top 10."""
    kept = {k: v for k, v in high_cache_miss_endpoints.items() if v > HIGH_MISS_THRESHOLD}
    return sorted(kept.items(), key=lambda x: x[1], reverse=True)[:10]


def select_high_error(high_error_rate_endpoints: dict[str, float]) -> list[tuple[str, float]]:
    """F8b (ref :960-966): paths above 5% error rate, rate-desc, top 10."""
    kept = {k: v for k, v in high_error_rate_endpoints.items() if v > HIGH_ERROR_THRESHOLD}
    return sorted(kept.items(), key=lambda x: x[1], reverse=True)[:10]


def render_report(report: dict) -> str:
    out: list[str] = []
    p = out.append
    p("=" * 80)
    p("FASTLY LOG ANALYTICS REPORT")
    p("=" * 80)

    if "traffic" in report:
        tp = report["traffic"]
        p("\n## Traffic Patterns")
        p(f"Total Requests: {tp.get('total_requests', 0):,}")
        p("\nHTTP Methods:")
        for method, count in tp.get("http_methods", {}).items():
            p(f"  {method}: {count:,}")
        p("\nTop 10 Endpoints:")
        for endpoint, count in list(tp.get("popular_endpoints", {}).items())[:10]:
            p(f"  {endpoint}: {count:,}")

    if "errors" in report:
        err = report["errors"]
        p("\n## Error Analysis")
        p(f"Total Requests: {err.get('total_requests', 0):,}")
        p(f"4xx Errors: {err.get('error_4xx_count', 0):,} ({err.get('error_4xx_rate', 0):.2f}%)")
        p(f"5xx Errors: {err.get('error_5xx_count', 0):,} ({err.get('error_5xx_rate', 0):.2f}%)")
        p(f"Total Error Rate: {err.get('total_error_rate', 0):.2f}%")
        p("\nStatus Code Distribution:")
        for code, count in sorted(err.get("status_code_distribution", {}).items()):
            p(f"  {code}: {count:,}")

    if "performance" in report:
        perf = report["performance"]
        p("\n## Performance Metrics")
        p(f"Cache Hit Rate: {perf.get('cache_hit_rate', 0):.2f}%")
        p(f"Cache Miss Rate: {perf.get('cache_miss_rate', 0):.2f}%")
        rs = perf.get("response_size_statistics", {})
        p("\nResponse Size Statistics:")
        p(f"  Mean: {rs.get('mean_size', 0):.2f} bytes")
        p(f"  Median: {rs.get('median_size', 0):.2f} bytes")
        p(f"  P95: {rs.get('p95_size', 0):.2f} bytes")
        p(f"  P99: {rs.get('p99_size', 0):.2f} bytes")

    if "user_agents" in report:
        ua = report["user_agents"]
        p("\n## User Agent Analysis")
        p("Agent Type Distribution:")
        for agent_type, count in ua.get("agent_type_distribution", {}).items():
            p(f"  {agent_type}: {count:,}")

    if "query_patterns" in report:
        qp = report["query_patterns"]
        p("\n## Query Parameter Analysis")
        p("Most Common Parameters:")
        for param, count in list(qp.get("most_common_parameters", {}).items())[:10]:
            p(f"  {param}: {count:,}")

    if "slowness_investigation" in report:
        slow = report["slowness_investigation"]
        p("\n## Slowness Investigation")

        if "requests_by_hour" in slow:
            p("\n### Traffic by Hour (identify peak times)")
            peak = sorted(slow["requests_by_hour"].items(), key=lambda x: x[1], reverse=True)[:5]
            for hour, count in peak:
                p(f"  Hour {int(hour):02d}:00 - {count:,} requests")

        if "cache_miss_rate_by_hour" in slow:
            p("\n### Cache Miss Rate by Hour (cache misses are slower)")
            for hour in sorted(slow["cache_miss_rate_by_hour"], key=int):
                p(f"  Hour {int(hour):02d}:00 - {slow['cache_miss_rate_by_hour'][hour]:.1f}% cache miss rate")

        if "high_cache_miss_endpoints" in slow:
            p("\n### Endpoints with High Cache Miss Rates (>50%)")
            high_miss = select_high_miss(slow["high_cache_miss_endpoints"])
            if high_miss:
                for endpoint, rate in high_miss:
                    p(f"  {endpoint}: {rate:.1f}% miss rate")
            else:
                p("  (No endpoints with >50% cache miss rate)")

        if "large_response_endpoints" in slow:
            p("\n### Endpoints with Largest Average Response Sizes")
            for rec in slow["large_response_endpoints"][:10]:
                size_mb = rec["mean_size"] / (1024 * 1024)
                p(f"  {rec['path']}: {size_mb:.2f} MB avg ({rec['request_count']:,} requests)")

        if "outlier_large_responses" in slow:
            recs = slow["outlier_large_responses"]
            p("\n### Very Large Responses (Outliers)")
            if recs:
                p(f"  P99 threshold: {recs[0]['p99_threshold'] / (1024 * 1024):.2f} MB")
                p("  Top endpoints with outliers:")
                for rec in recs[:5]:
                    p(f"    {rec['path']}: {rec['outliers']:,}")

        if "high_error_rate_endpoints" in slow:
            p("\n### Endpoints with High Error Rates (might indicate slowness)")
            high_err = select_high_error(slow["high_error_rate_endpoints"])
            if high_err:
                for endpoint, rate in high_err:
                    p(f"  {endpoint}: {rate:.1f}% error rate")
            else:
                p("  (No endpoints with >5% error rate)")

        if "server_errors_by_hour" in slow and slow["server_errors_by_hour"]:
            p("\n### Server Errors (5xx) by Hour")
            for hour in sorted(slow["server_errors_by_hour"], key=int):
                p(f"  Hour {int(hour):02d}:00 - {slow['server_errors_by_hour'][hour]:,} server errors")

        if "complex_query_endpoints" in slow:
            p("\n### Endpoints with Complex Queries (>5 parameters avg)")
            for rec in slow["complex_query_endpoints"][:10]:
                p(f"  {rec['path']}: {rec['avg_params']:.1f} avg params ({rec['request_count']:,} requests)")

        if "top_request_ips" in slow:
            p("\n### Top Request IPs (might indicate bots/crawlers)")
            for ip, count in list(slow["top_request_ips"].items())[:10]:
                p(f"  {ip}: {count:,} requests")

    p("\n" + "=" * 80)
    return "\n".join(out)
