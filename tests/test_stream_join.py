"""Stream-stream interval join: batch equality + bounded-state eviction.

The registered query (`streaming_error_attribution`) is oracled against
DuckDB by the full parity sweep; these tests pin the two properties the
sweep cannot see — that the join buffers state ACROSS micro-batches, and
that on a time-ordered landing zone a finite watermark actually EVICTS
join state (rows_removed > 0) while the result still equals the batch
join (the horizon exceeds the interval bound plus file disorder, so no
row is dropped before its last possible match arrives).
"""

import os

import pyarrow as pa
import pyarrow.parquet as papq

from pyspark.sql import functions as F

from python_fastly_log_query_spark.streaming import jobs as SJ

BASE = 1_700_000_000


def _write_hour_files(path: str, side: str, n_hours: int, per_hour: int) -> None:
    """One parquet FILE per hour with strictly increasing mtimes, so the
    file-stream source replays them in event-time order (one micro-batch
    per file) — the landing-zone shape.

    Every hour also plants one FILE-BOUNDARY-straddling pair on the
    dedicated key "kx": the left event at ``h*3600 + 3500`` can only
    match the right event at ``(h+1)*3600 + 100`` (200s later, within
    the 600s bound) — which lives in the NEXT hour's file, i.e. a later
    micro-batch.  Same-hour kx events never match (the right kx at
    ``h*3600 + 100`` PRECEDES the left one), so every kx output row is
    direct proof the join buffered state across micro-batches; a
    within-batch-only join would emit zero kx rows (ADVICE r4)."""
    os.makedirs(path, exist_ok=True)
    for h in range(n_hours):
        keys, ts = [], []
        for j in range(per_hour):
            keys.append(f"k{j % 3}")
            # right-side events land 120s after the left-side events of
            # the same hour slot -> within the 600s interval bound
            off = h * 3600 + j * 300 + (120 if side == "r" else 0)
            ts.append(BASE + off)
        keys.append("kx")
        ts.append(BASE + h * 3600 + (100 if side == "r" else 3500))
        papq.write_table(
            pa.table(
                {
                    f"{side}_key": pa.array(keys, pa.string()),
                    f"{side}_ts": pa.array(ts, pa.int64()),
                }
            ),
            f"{path}/f{h:02d}.parquet",
        )
        t = BASE + h * 60
        os.utime(f"{path}/f{h:02d}.parquet", (t, t))


def test_interval_join_evicts_state_and_matches_batch(spark, tmp_path):
    n_hours, per_hour = 8, 6
    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    _write_hour_files(left_dir, "l", n_hours, per_hour)
    _write_hour_files(right_dir, "r", n_hours, per_hour)

    def _stream(path, side):
        return SJ.stream_docs(
            spark,
            path,
            schema=f"{side}_key string, {side}_ts long",
            max_files_per_trigger=1,
        ).select(
            f"{side}_key",
            F.timestamp_seconds(F.col(f"{side}_ts")).alias(f"{side}_tstamp"),
        )

    joined = SJ.interval_join_streams(
        _stream(left_dir, "l"),
        _stream(right_dir, "r"),
        "l_key",
        "r_key",
        "l_tstamp",
        "r_tstamp",
        upper_seconds=600,
        # horizon (2h) >> interval bound (600s) + max file disorder (0 on
        # ordered mtimes), but << the 8h stream span -> eviction must fire
        watermark="2 hours",
    )
    q = SJ.run_available_now(
        joined, str(tmp_path / "ckpt"), queryName="t_sjoin", outputMode="append"
    )
    got = spark.sql(
        "SELECT l_key, count(*) AS n FROM t_sjoin GROUP BY 1 ORDER BY 1"
    ).collect()

    lb = spark.read.parquet(left_dir).select(
        "l_key", F.timestamp_seconds("l_ts").alias("l_tstamp")
    )
    rb = spark.read.parquet(right_dir).select(
        "r_key", F.timestamp_seconds("r_ts").alias("r_tstamp")
    )
    want = (
        lb.join(
            rb,
            (F.col("l_key") == F.col("r_key"))
            & (F.col("r_tstamp") >= F.col("l_tstamp"))
            & (F.col("r_tstamp") <= F.col("l_tstamp") + F.expr("INTERVAL 600 SECONDS")),
            "inner",
        )
        .groupBy("l_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_key")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert sum(r.n for r in got) > 0
    # the planted boundary-straddling pairs: hour h's left kx event
    # matches ONLY hour h+1's right kx event (a later file = a later
    # micro-batch), so these rows exist iff join state crossed batches
    kx = {r.l_key: r.n for r in got}.get("kx", 0)
    assert kx == n_hours - 1, got

    metrics = SJ.state_metrics(q)
    # the plan must be the engine's streaming symmetric hash join (state
    # buffered on both sides), not a fallback
    assert {m["operator"] for m in metrics} == {"symmetricHashJoin"}, metrics
    assert len({m["batch"] for m in metrics}) >= n_hours  # state crossed batches
    assert sum(m["rows_removed"] or 0 for m in metrics) > 0, metrics
    # bounded: live state never approaches the full stream volume
    total_rows = 2 * n_hours * (per_hour + 1)
    assert max(m["state_rows"] for m in metrics) < total_rows, metrics


def test_interval_join_batching_invariant(spark, tmp_path):
    """The joined result must not depend on how the backlog is split into
    micro-batches: 1 file/trigger, 2 files/trigger, and
    swallow-the-backlog must all produce the same multiset of pairs (the
    state store makes cross-batch matches equal to within-batch ones)."""
    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    _write_hour_files(left_dir, "l", 4, 5)
    _write_hour_files(right_dir, "r", 4, 5)

    def _run(mfpt, tag):
        def _stream(path, side):
            return SJ.stream_docs(
                spark,
                path,
                schema=f"{side}_key string, {side}_ts long",
                max_files_per_trigger=mfpt,
            ).select(
                f"{side}_key",
                F.timestamp_seconds(F.col(f"{side}_ts")).alias(f"{side}_tstamp"),
            )

        joined = SJ.interval_join_streams(
            _stream(left_dir, "l"),
            _stream(right_dir, "r"),
            "l_key", "r_key", "l_tstamp", "r_tstamp",
            upper_seconds=600,
            watermark="30 days",
        )
        SJ.run_available_now(
            joined, str(tmp_path / f"ckpt_{tag}"), queryName=f"t_bi_{tag}",
            outputMode="append",
        )
        return sorted(
            tuple(r) for r in spark.table(f"t_bi_{tag}").collect()
        )

    results = [_run(1, "one"), _run(2, "two"), _run(None, "all")]
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0


def test_interval_join_checkpoint_incremental(spark, tmp_path):
    """Landing-zone contract: a SECOND AvailableNow run over the same
    checkpoint processes only files that landed after the first run, and
    the accumulated sink equals the batch join over everything — the
    streaming analog of the batch kill-resume lineage (exactly-once
    across runs, no reprocessing of completed files)."""
    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    _write_hour_files(left_dir, "l", 3, 4)
    _write_hour_files(right_dir, "r", 3, 4)

    def _stream(path, side):
        return SJ.stream_docs(
            spark, path, schema=f"{side}_key string, {side}_ts long"
        ).select(
            f"{side}_key",
            F.timestamp_seconds(F.col(f"{side}_ts")).alias(f"{side}_tstamp"),
        )

    def _run(sink_dir):
        joined = SJ.interval_join_streams(
            _stream(left_dir, "l"),
            _stream(right_dir, "r"),
            "l_key", "r_key", "l_tstamp", "r_tstamp",
            upper_seconds=600,
            watermark="30 days",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    sink = str(tmp_path / "sink")
    _run(sink)
    n_first = spark.read.parquet(sink).count()
    assert n_first > 0

    # more files land (later event times, later mtimes), same checkpoint
    for h in range(3, 5):
        for d, side in ((left_dir, "l"), (right_dir, "r")):
            keys, ts = [], []
            for j in range(4):
                keys.append(f"k{j % 3}")
                ts.append(BASE + h * 3600 + j * 300 + (120 if side == "r" else 0))
            papq.write_table(
                pa.table(
                    {
                        f"{side}_key": pa.array(keys, pa.string()),
                        f"{side}_ts": pa.array(ts, pa.int64()),
                    }
                ),
                f"{d}/f{h:02d}.parquet",
            )
            t = BASE + h * 60
            os.utime(f"{d}/f{h:02d}.parquet", (t, t))
    _run(sink)

    lb = spark.read.parquet(left_dir).select(
        "l_key", F.timestamp_seconds("l_ts").alias("l_tstamp")
    )
    rb = spark.read.parquet(right_dir).select(
        "r_key", F.timestamp_seconds("r_ts").alias("r_tstamp")
    )
    want = lb.join(
        rb,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_tstamp") >= F.col("l_tstamp"))
        & (F.col("r_tstamp") <= F.col("l_tstamp") + F.expr("INTERVAL 600 SECONDS")),
        "inner",
    ).count()
    got = spark.read.parquet(sink).count()
    assert got == want
    assert got > n_first  # second run really added the new files' matches


def test_registered_attribution_state_crosses_batches(spark):
    """The registered query runs multi-batch on the request side
    (maxFilesPerTrigger=2 over 4 files) — its state metrics must show
    more than one micro-batch, i.e. the join genuinely buffers."""
    from python_fastly_log_query_spark import queries as Q

    out = Q.queries()["streaming_error_attribution"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r.attributed for r in out) > 0
    metrics = Q.LAST_STREAM_STATE_METRICS["streaming_error_attribution"]
    assert len({m["batch"] for m in metrics}) >= 2, metrics
