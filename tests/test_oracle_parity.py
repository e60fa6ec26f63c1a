"""Local mirror of the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle over the same parquet, compare row count,
column names, and order-insensitive values (SURVEY.md §5.3)."""

from __future__ import annotations

import math

import duckdb
import pytest

from conftest import SF_SMALL

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return None
        # absorb float-representation noise beyond rounded precision
        return round(val, 6)
    if isinstance(val, int):
        return int(val)
    return str(val)


def _rows_to_set(cols, rows):
    # driver compare is order-insensitive with columns sorted by name
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_SMALL)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    sset = _rows_to_set(scols, srows)
    oset = _rows_to_set(ocols, orows)
    if sset != oset:
        diff_s = [r for r in sset if r not in oset][:5]
        diff_o = [r for r in oset if r not in sset][:5]
        raise AssertionError(f"{name}: values differ\n spark-only: {diff_s}\n oracle-only: {diff_o}")


def test_no_oracle_queries_still_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_SMALL)
        assert df.count() >= 0, name
