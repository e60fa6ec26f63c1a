"""F8 console renderer golden parity (SURVEY.md §2.3 F8; VERDICT r1 item 5):
the reference's generate_report(console) applies two display-time filters —
miss_rate > 50% (ref analytics.py:932-938) and error_rate > 5% (:960-966).
Render the reference's report and ours over the SAME fixture and compare
WHICH endpoints each filter selected (and their displayed rates)."""

from __future__ import annotations

import contextlib
import importlib.util
import io
import os

import pytest

from python_fastly_log_query_spark.operators import console as C
from python_fastly_log_query_spark.operators import report as R
from python_fastly_log_query_spark.operators.parse import parse_logs

UA = "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/118.0"


def fixture_lines() -> list[str]:
    """Paths engineered to straddle both thresholds:
    /hot-miss: 75% miss (>50) · /warm: 25% miss (<50)
    /flaky: 50% errors (>5)   · /solid: 0% errors
    """
    lines = []
    for i in range(200):
        ts = f"2025-11-01T{i % 24:02d}:{(i * 7) % 60:02d}:{(i * 13) % 60:02d}Z"
        if i % 2 == 0:
            path, status = "/hot-miss", 200
            cache = ["miss", "miss", "miss", "hit"][i % 4]
        elif i % 4 == 1:
            path, status = "/flaky", [200, 503][(i // 4) % 2]
            cache = "hit"
        else:
            path, status = "/warm", 200
            cache = ["miss", "hit", "hit", "hit"][i % 4]
        lines.append(
            f"<134>{ts} cache-sjc s3logsprod[{1000 + i}]: 10.0.0.{i % 250} "
            f'"-" "-" - "GET {path}" {status} {100 + i} "-" "{UA}" {cache}'
        )
    return lines


@pytest.fixture(scope="module")
def ref_analytics():
    path = "/root/reference/src/analyze/analytics.py"
    if not os.path.exists(path):
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location("ref_analytics_console", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _section(text: str, header: str) -> list[str]:
    """Indented entry lines of one '###' section."""
    lines = text.splitlines()
    start = next(i for i, l in enumerate(lines) if header in l)
    out = []
    for l in lines[start + 1 :]:
        if l.startswith("###") or l.startswith("## ") or l.startswith("="):
            break
        if l.strip():
            out.append(l.strip())
    return out


MISS_HDR = "High Cache Miss Rates (>50%)"
ERR_HDR = "High Error Rates"


def test_console_threshold_selections_match_reference(spark, ref_parser, ref_analytics):
    lines = fixture_lines()
    entries = [r for r in (ref_parser.parse_log_line(l) for l in lines) if r]
    ref_report = {
        "traffic": ref_analytics.analyze_traffic_patterns(entries),
        "errors": ref_analytics.analyze_errors(entries),
        "performance": ref_analytics.analyze_performance(entries),
        "user_agents": ref_analytics.analyze_user_agents(entries),
        "query_patterns": ref_analytics.analyze_query_patterns(entries),
        "slowness_investigation": ref_analytics.analyze_slowness_patterns(entries),
    }
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ref_analytics.generate_report(ref_report, "console")
    ref_text = buf.getvalue()

    df = spark.createDataFrame([(l,) for l in lines], "text string")
    ours_text = C.render_report(R.full_report(parse_logs(df, "text")))

    ref_miss, got_miss = _section(ref_text, MISS_HDR), _section(ours_text, MISS_HDR)
    ref_err, got_err = _section(ref_text, ERR_HDR), _section(ours_text, ERR_HDR)

    # the fixture must make both filters non-vacuous
    assert any("miss rate" in l for l in ref_miss) and "/hot-miss" in ref_miss[0]
    assert any("error rate" in l for l in ref_err) and "/flaky" in ref_err[0]
    # identical selections AND identical displayed rates, in order
    assert got_miss == ref_miss
    assert got_err == ref_err


def test_threshold_selection_units():
    miss = {"/a": 80.0, "/b": 50.0, "/c": 50.1, "/d": 10.0}
    assert C.select_high_miss(miss) == [("/a", 80.0), ("/c", 50.1)]  # strict >
    err = {"/x": 5.0, "/y": 5.01, "/z": 99.0}
    assert C.select_high_error(err) == [("/z", 99.0), ("/y", 5.01)]
