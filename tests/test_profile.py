"""Data-quality profiling + rule validation (operators/profile.py) —
the Deequ-shape one-pass audit."""

from __future__ import annotations

import pytest

from python_fastly_log_query_spark.operators.profile import profile, validate


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "a", 5),
        (2, "b", -3),     # negative value
        (2, "a", 0),      # duplicate id
        (None, "zz", 1),  # null id, out-of-set type
        (4, None, 2),     # null type
    ]
    return spark.createDataFrame(rows, "id long, typ string, val long")


def test_profile_counts_and_minmax(dirty):
    out = {r.column: r for r in
           profile(dirty, ["id", "typ", "val"]).collect()}
    assert out["id"].n_rows == 5 and out["id"].n_null == 1
    assert out["id"].n_distinct == 3          # 1, 2, 4 (nulls excluded)
    assert out["id"].min_s == "1" and out["id"].max_s == "4"
    assert out["typ"].min_s == "a" and out["typ"].max_s == "zz"
    assert out["val"].min_s == "-3"


def test_profile_approx_distinct_dial(dirty):
    out = {r.column: r for r in
           profile(dirty, ["id"], exact_distinct=False).collect()}
    # HLL on 3 values is exact in practice; the dial just swaps the agg
    assert out["id"].n_distinct == 3


def test_validate_rules(dirty):
    rules = [
        ("id", "not_null", None),
        ("id", "unique", None),
        ("typ", "in_set", ("a", "b")),
        ("val", "non_negative", None),
    ]
    out = {(r.column, r.rule): r for r in validate(dirty, rules).collect()}
    assert out[("id", "not_null")].violations == 1
    assert out[("id", "unique")].violations == 1      # one duplicated non-null id
    assert out[("typ", "in_set")].violations == 1     # 'zz' (null not counted)
    assert out[("val", "non_negative")].violations == 1
    assert all(r.passed == 0 for r in out.values())


def test_validate_unknown_rule_raises(dirty):
    with pytest.raises(ValueError, match="unknown rule"):
        validate(dirty, [("id", "between", (0, 9))])
