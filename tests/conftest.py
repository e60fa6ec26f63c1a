"""Shared pytest fixtures: one SparkSession per test run, reference import,
and the fixture log-line corpus."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
# SPARK_GRAFT_PARITY_SF=sf0.01 reruns the whole oracle-parity sweep (and
# its CORRECTNESS_FULL.json artifact) at the external gate's scale —
# full-registry green there (authoritative count lives in
# CORRECTNESS_FULL.json, not here); sf0.001 is the fast default
SF_SMALL = os.path.join(TESTDATA, os.environ.get("SPARK_GRAFT_PARITY_SF", "sf0.001"))
SF_ORACLE = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from python_fastly_log_query_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ref_parser():
    """The reference's own parser module, imported from /root/reference —
    used ONLY to generate golden expected outputs (SURVEY.md §5.1); the
    reference has no tests of its own, so its executable behavior is the
    spec."""
    path = "/root/reference/src/parse/log_parser.py"
    if not os.path.exists(path):
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location("ref_log_parser", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# A corpus covering: the documented example (reference README.md:242),
# fast-path variants, every fallback probe, bare/duplicate query params,
# malformed and junk lines.
FIXTURE_LINES = [
    # documented example (README.md:242)
    '<134>2025-11-09T23:57:35Z cache-server-001 s3logsprod[254840]: 192.0.2.1 "-" "-" Sun, 09 Nov 2025 23:57:35 GMT "GET /api/endpoint?param=value" 200 18508 "-" "Mozilla/5.0..." hit',
    # fast path, no query string
    '<134>2025-11-09T23:57:36Z cache-sjc-2 s3logsprod[1]: 10.1.2.3 "-" "-" - "GET /static/app.js" 200 512 "-" "curl/8.0.1" miss',
    # duplicate + bare query params (dup last-wins; bare key dropped from map)
    '<13>2025-11-09T00:00:00Z cache-x proc[42]: 10.0.0.1 "-" "-" - "POST /search?q=a&q=b&flag&k=v=w" 404 0 "-" "python-requests/2.31" pass',
    # empty quoted fields → None via safe_get falsiness
    '<1>2025-11-09T01:02:03Z c p[7]: 1.2.3.4 "" "" - "PUT /x?a=" 503 99 "" "" synth',
    # invalid date (month 13) → fast path matches, timestamp None
    '<134>2025-13-09T23:57:35Z cache-a b[1]: 2.3.4.5 "-" "-" - "GET /y" 301 10 "-" "Mozilla/5.0 (X11; Linux)" error',
    # fallback: missing priority → probes fire
    '2025-11-09T23:59:59Z cache-edge-7 worker[88]: 8.8.8.8 "GET /fb?x=1&y=2" 500 12345 "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit" hit',
    # fallback: only an IP and junk
    "garbage line from 172.16.254.1 with nothing else useful",
    # fallback: quoted long UA without Mozilla → no user_agent
    'noise "this is a very long quoted string without the magic word" 204 77 end',
    # fallback: cache status at end-of-line
    "some unstructured entry ending with miss",
    # fallback: process[pid] and cache- server
    "stuff cache-lhr-99 logship[4242]: more stuff",
    # whitespace only → dropped
    "   ",
    # empty → dropped
    "",
    # fallback: status+size probe ' 404 999 '
    "weird prefix 404 999 suffix tail",
    # unicode + quotes stress
    '<99>2025-01-01T00:00:00Z caché-ünit prøc[3]: 9.9.9.9 "ref" "ref2" Mon, 1 "GET /päth?ü=v" 418 1 "r" "Mozilla/5.0 (ünïcode)" hit',
    # method not uppercase → full pattern fails, http probe fails too
    '<134>2025-11-09T23:57:35Z s p[1]: 3.3.3.3 "-" "-" - "get /lower" 200 5 "-" "Mozilla/5.0 xyzabcdefgh" hit',
    # multiple ?: split on first only
    '<134>2025-11-09T10:00:00Z s p[1]: 4.4.4.4 "-" "-" - "GET /a?b=c?d=e" 200 5 "-" "Mozilla/5.0 abcdefghij" hit',
]
