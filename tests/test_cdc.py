"""Semantics and plan contracts for the CDC operators
(operators/cdc.py): latest-wins compaction with delete suppression,
SCD2 interval chaining, and the one-shuffle max_by plan shape.
The cross-engine value oracle for the registered queries
(cdc_latest_snapshot / cdc_scd2_history) runs in test_oracle_parity."""

from datetime import datetime

from pyspark.sql import functions as F

from python_fastly_log_query_spark.operators.cdc import (
    compact_changelog,
    scd2_history,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _changelog(spark):
    rows = [
        # key "a": insert, update, update  -> survives with v3
        ("a", 1, "upsert", _ts("2024-01-01 00:00:00"), "x", 1.0),
        ("a", 2, "upsert", _ts("2024-01-02 00:00:00"), "y", 2.0),
        ("a", 3, "upsert", _ts("2024-01-03 00:00:00"), "z", 3.0),
        # key "b": insert then delete -> dropped from the snapshot
        ("b", 4, "upsert", _ts("2024-01-01 06:00:00"), "p", 4.0),
        ("b", 5, "delete", _ts("2024-01-02 06:00:00"), None, None),
        # key "c": insert, delete, re-insert -> survives with v8
        ("c", 6, "upsert", _ts("2024-01-01 12:00:00"), "q", 5.0),
        ("c", 7, "delete", _ts("2024-01-02 12:00:00"), None, None),
        ("c", 8, "upsert", _ts("2024-01-03 12:00:00"), "r", 6.0),
    ]
    return spark.createDataFrame(
        rows, "k string, seq long, op string, ts timestamp, payload string, v double"
    )


def test_compact_latest_wins_and_delete_suppression(spark):
    snap = {
        r["k"]: r.asDict()
        for r in compact_changelog(_changelog(spark), key="k", seq="seq").collect()
    }
    assert set(snap) == {"a", "c"}  # b's latest change is a delete
    assert snap["a"]["payload"] == "z" and snap["a"]["v"] == 3.0
    assert snap["a"]["last_seq"] == 3 and snap["a"]["n_changes"] == 3
    # re-insert after delete survives
    assert snap["c"]["payload"] == "r" and snap["c"]["last_seq"] == 8
    assert snap["c"]["n_changes"] == 3


def test_compact_is_one_shuffle_no_sort(spark):
    plan = (
        compact_changelog(_changelog(spark), key="k", seq="seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # groupBy(key) only
    assert "Window" not in plan  # max_by, not a ranking window
    # partial aggregation runs map-side so the shuffle carries one
    # (seq, payload) pair per key per task (struct-valued max_by plans
    # as SortAggregate: the Sorts are partition-local by group key,
    # upstream of the one exchange — not a global sort)
    assert "partial_max_by" in plan


def test_scd2_intervals_chain_and_current_flag(spark):
    hist = scd2_history(_changelog(spark), key="k", seq="seq").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: r["seq"])
        # intervals chain: each version closes at the NEXT change
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] is not None and a["valid_to"] <= b["valid_from"]
    a_rows = by_key["a"]
    assert [r["is_current"] for r in a_rows] == [0, 0, 1]
    assert a_rows[-1]["valid_to"] is None
    # b: single version, closed by the delete, never current
    (b_row,) = by_key["b"]
    assert b_row["is_current"] == 0
    assert b_row["valid_to"] == _ts("2024-01-02 06:00:00")
    # c: the pre-delete version closed at the delete ts, re-insert current
    c_rows = by_key["c"]
    assert [r["is_current"] for r in c_rows] == [0, 1]
    assert c_rows[0]["valid_to"] == _ts("2024-01-02 12:00:00")


def test_snapshot_equals_history_current_rows(spark):
    """The compacted snapshot IS the is_current slice of the history —
    the invariant a MERGE-maintained table must satisfy against its
    SCD2 audit twin."""
    log = _changelog(spark)
    snap = {
        (r["k"], r["payload"], r["v"])
        for r in compact_changelog(log, key="k", seq="seq").collect()
    }
    cur = {
        (r["k"], r["payload"], r["v"])
        for r in scd2_history(log, key="k", seq="seq")
        .filter(F.col("is_current") == 1)
        .collect()
    }
    assert snap == cur


def test_streaming_cdc_crosses_micro_batches_and_equals_batch(spark, tmp_path):
    """cdc_materialize_stream folds latest-wins state ACROSS micro-batches
    (maxFilesPerTrigger=1 over a multi-file changelog) and the drained
    snapshot equals the batch compaction."""
    from pyspark.sql import functions as F

    from python_fastly_log_query_spark.operators.cdc import compact_changelog
    from python_fastly_log_query_spark.streaming.jobs import (
        cdc_materialize_stream,
        run_available_now,
        stream_docs,
    )

    log = _changelog(spark).select(
        "k", "seq", "ts", "op", F.col("payload").alias("event_type"),
        F.col("v").alias("value"),
    )
    src = str(tmp_path / "src")
    log.repartition(4).write.parquet(src)
    chg = stream_docs(
        spark,
        src,
        schema="k string, seq long, ts timestamp, op string, "
        "event_type string, value double",
        max_files_per_trigger=1,
    )
    q = run_available_now(
        cdc_materialize_stream(chg),
        str(tmp_path / "ckpt"),
        queryName="cdc_state_test",
        outputMode="update",
    )
    assert len(q.recentProgress) >= 4  # one micro-batch per file
    snap = spark.table("cdc_state_test")
    latest = (
        snap.groupBy("k")
        .agg(
            F.max_by(
                F.struct("last_seq", "n_changes", "op", "event_type", "value"),
                F.col("n_changes"),
            ).alias("_s")
        )
        .filter(F.col("_s.op") != "delete")
        .select(
            "k",
            F.col("_s.last_seq").alias("last_seq"),
            F.col("_s.n_changes").alias("n_changes"),
            F.col("_s.event_type").alias("event_type"),
            F.col("_s.value").alias("value"),
        )
    )
    got = {tuple(r) for r in latest.collect()}
    want = {
        tuple(r)
        for r in compact_changelog(
            log, key="k", seq="seq", payload=["event_type", "value"]
        ).collect()
    }
    assert got == want
