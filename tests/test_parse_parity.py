"""Golden parse parity: our vectorized parser vs the reference's
``parse_log_line`` executed directly (SURVEY.md §5.1)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from conftest import FIXTURE_LINES

from python_fastly_log_query_spark.operators.parse import (
    parse_lines_pdf,
    parse_log_line,
    parse_logs,
)

FIELDS = [
    "raw_line", "priority", "timestamp", "cache_server", "process", "pid",
    "ip_address", "referrer1", "referrer2", "date_string", "http_method",
    "path", "query_string", "query_params", "status_code", "response_size",
    "referrer", "user_agent", "cache_status",
]


def _norm(v):
    """absent key ≡ None ≡ NaN ≡ NaT; ints comparable across int/Int64."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NaT or v is pd.NA:
        return None
    return v


def ref_record(ref_parser, line):
    rec = ref_parser.parse_log_line(line)
    if rec is None:
        return None
    return {f: _norm(rec.get(f)) for f in FIELDS}


@pytest.mark.parametrize("idx", range(len(FIXTURE_LINES)))
def test_line_parity(ref_parser, idx):
    line = FIXTURE_LINES[idx]
    expected = ref_record(ref_parser, line)
    got = parse_log_line(line)
    if expected is None:
        assert got is None
        return
    assert got is not None
    got_full = {f: _norm(got.get(f)) for f in FIELDS}
    assert got_full == expected, f"line {idx}: {line!r}"


def test_batch_equals_scalar():
    """Batch-vectorized output must equal line-at-a-time output."""
    pdf = parse_lines_pdf(pd.Series(FIXTURE_LINES))
    kept = pdf[pdf["_keep"]]
    singles = [parse_log_line(l) for l in FIXTURE_LINES]
    singles = [s for s in singles if s is not None]
    assert len(kept) == len(singles)
    for (_, row), single in zip(kept.iterrows(), singles):
        for f in FIELDS:
            rv = _norm(row[f])
            if f == "timestamp" and rv is not None:
                rv = rv.isoformat()
            assert _norm(single.get(f)) == rv, (f, row["raw_line"])


def test_spark_parse_end_to_end(spark, ref_parser):
    """Full Spark mapInPandas stage vs reference goldens, incl. the
    byte-identical raw text per url invariant."""
    rows = [(f"https://example.org/doc/{i}", line) for i, line in enumerate(FIXTURE_LINES)]
    df = spark.createDataFrame(rows, "url string, text string")
    out = parse_logs(df, line_col="text", passthrough=["url"]).collect()

    expected = {}
    for i, line in enumerate(FIXTURE_LINES):
        rec = ref_record(ref_parser, line)
        if rec is not None:
            expected[f"https://example.org/doc/{i}"] = rec

    assert {r["url"] for r in out} == set(expected)
    for r in out:
        exp = expected[r["url"]]
        for f in FIELDS:
            got = _norm(r[f])
            want = exp[f]
            if f == "timestamp" and got is not None:
                got = got.isoformat()
            assert got == want, (r["url"], f, got, want)
        # byte-identical extracted text per url (BASELINE.json input_hint):
        # raw_line must be exactly the reference's stripped line
        assert r["raw_line"] == exp["raw_line"]


def test_blank_lines_dropped(spark):
    df = spark.createDataFrame([("", ), ("   ",), ("x 404 999 y",)], "text string")
    out = parse_logs(df, line_col="text").collect()
    assert len(out) == 1 and out[0]["raw_line"] == "x 404 999 y"


def test_native_parse_matches_pandas_parser_on_wellformed(spark):
    """parse_logs_native (pure JVM regexp_extract, codegen) must produce
    field-identical records to the pandas byte-parity parser on every
    well-formed line — the oracle corpus is 100% well-formed by
    construction, so full-frame equality is the assertion."""
    from conftest import SF_SMALL as _sf

    from python_fastly_log_query_spark import oracle_corpus as oc
    from python_fastly_log_query_spark.operators.parse import (
        parse_logs, parse_logs_native,
    )

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    lines = oc.log_lines(spark, _sf)

    def rows(df):
        out = {}
        for r in df.collect():
            d = r.asDict()
            key = d.pop("event_id")
            d["query_params"] = dict(d["query_params"]) if d["query_params"] is not None else None
            out[key] = d
        return out

    a = rows(parse_logs(lines, "text", passthrough=["event_id"]))
    b = rows(parse_logs_native(lines, "text", passthrough=["event_id"]))
    assert a.keys() == b.keys()
    mism = {
        k: (a[k], b[k]) for k in a
        if a[k] != b[k]
    }
    assert not mism, list(mism.items())[:2]


def test_native_parse_nulls_malformed(spark):
    from python_fastly_log_query_spark.operators.parse import parse_logs_native

    df = spark.createDataFrame(
        [("corrupt 10.9.9.9 ###",), ("   ",), ("<190>not a real line",)],
        "text string",
    )
    got = parse_logs_native(df, "text").collect()
    # blank line dropped; malformed kept with raw_line + null fields
    assert len(got) == 2
    for r in got:
        d = r.asDict()
        raw = d.pop("raw_line")
        assert raw and all(v is None for v in d.values())


def test_native_parse_prefix_match_ignores_trailing_garbage(spark):
    """Both parsers are \\A-anchored PREFIX matches: a well-formed line
    with trailing junk must parse identically in both (the one-pass
    regexp_replace shape needs its end sentinel for this)."""
    from python_fastly_log_query_spark.operators.parse import (
        parse_logs, parse_logs_native,
    )

    line = ('<134>2025-11-01T10:00:00Z cache-sjc s3logsprod[4242]: 10.1.2.3 '
            '"-" "-" - "GET /api/x?page=1" 200 512 "-" "curl/8.4.0" hit extra trailing junk')
    df = spark.createDataFrame([(line,)], "text string")
    a = parse_logs(df, "text").collect()[0].asDict()
    b = parse_logs_native(df, "text").collect()[0].asDict()
    a["query_params"] = dict(a["query_params"]); b["query_params"] = dict(b["query_params"])
    assert a == b
    assert a["cache_status"] == "hit"

def test_native_parse_sentinel_injection_is_nulled(spark):
    """ADVICE r2: a raw line containing the \\x01 slot separator must not
    fake the slot count into garbage fields — it is treated as malformed
    (all-null fields, raw_line preserved), even when the rest of the line
    would otherwise match the full pattern."""
    from python_fastly_log_query_spark.operators.parse import parse_logs_native

    good = ('<134>2025-11-01T10:00:00Z cache-sjc s3logsprod[4242]: 10.1.2.3 '
            '"-" "-" - "GET /api/x?page=1" 200 512 "-" "curl/8.4.0" hit')
    evil = good.replace("curl/8.4.0", "curl\x018.4.0\x01x\x01y")
    df = spark.createDataFrame([(good,), (evil,)], "text string")
    rows = {r["raw_line"]: r.asDict() for r in parse_logs_native(df, "text").collect()}
    assert rows[good]["status_code"] == 200
    bad = rows[evil]
    bad.pop("raw_line")
    assert all(v is None for v in bad.values())
