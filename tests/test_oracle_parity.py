"""Local mirror of the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle over the same parquet, compare row count,
column names, and order-insensitive values (SURVEY.md §5.3).

Full-coverage artifact (ADVICE r2): the registry is iterated in stable
insertion order and external gates may verify only a prefix of it, so this
module records a per-query result for EVERY registered query and writes
CORRECTNESS_FULL.json at the repo root when the whole sweep ran —
the legitimate full-coverage record, regenerated on each pytest run."""

from __future__ import annotations

import json
import math
import os

import duckdb
import pytest

from conftest import SF_SMALL

import __spark_entry__ as entrymod

_ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "CORRECTNESS_FULL.json")
_RESULTS: dict[str, dict] = {}

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


_SCALAR_TYPES = (bool, int, float, str, bytes, type(None))


def _canon(val):
    """BIT-EXACT scalar canonicalization (VERDICT r3 item 1): the external
    gate hashes values with no tolerance, so this mirror must too.  Floats
    canonicalize to their shortest repr — equal iff the same IEEE double
    (round-3's round(6) tolerance could pass a value the gate's hash
    rejects).  NaN gets a distinct marker; -0.0 stays distinct from 0.0
    (stricter than any plausible gate normalization — queries must simply
    not emit the ambiguity).  Non-scalar values (arrays/maps/structs) are
    a hard error: r2's media_features proved they crash the gate's
    canonicalizer."""
    if val is None:
        return "∅"
    if isinstance(val, float):
        return "nan" if math.isnan(val) else repr(val)
    if isinstance(val, bool):
        return f"b:{val}"
    if isinstance(val, int):
        return f"i:{val}"
    if isinstance(val, (list, tuple, dict, set)):
        raise AssertionError(f"non-scalar result value {type(val).__name__}: {val!r:.80}")
    # str / bytes / datetime / date / Decimal → stable string form
    return str(val)


def _rows_to_set(cols, rows):
    # driver compare is order-insensitive with columns sorted by name
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _value_hash(canon_rows) -> str:
    import hashlib

    h = hashlib.sha256()
    for row in canon_rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    rec = _RESULTS[name] = {"status": "error", "oracle": "full"}
    sdf = QUERIES[name](spark, SF_SMALL)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    rec.update(spark_rows=len(srows), oracle_rows=len(orows))
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    sset = _rows_to_set(scols, srows)
    oset = _rows_to_set(ocols, orows)
    rec["value_hash"] = _value_hash(sset)
    rec["hash_match"] = _value_hash(oset) == rec["value_hash"]
    if sset != oset:
        diff_s = [r for r in sset if r not in oset][:5]
        diff_o = [r for r in oset if r not in sset][:5]
        raise AssertionError(f"{name}: values differ\n spark-only: {diff_s}\n oracle-only: {diff_o}")
    assert rec["hash_match"]
    rec["status"] = "match"


def test_no_oracle_queries_still_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        rec = _RESULTS[name] = {"status": "error", "oracle": "rows_only"}
        df = QUERIES[name](spark, SF_SMALL)
        rec["spark_rows"] = df.count()
        assert rec["spark_rows"] >= 0, name
        rec["status"] = "ran"


def test_zz_write_full_coverage_artifact():
    """Runs last (alphabetical within module); writes the artifact only
    when the whole registry was swept in this pytest invocation."""
    if set(_RESULTS) != set(QUERIES):
        pytest.skip("partial run — artifact reflects full sweeps only")
    out = {
        "sf": SF_SMALL,
        "generated_by": (
            "pytest tests/test_oracle_parity.py (order-insensitive BIT-EXACT "
            "value compare vs DuckDB: columns sorted by name, rows sorted, "
            "shortest-repr floats, sha256 value hash per side)"
        ),
        "registered": len(QUERIES),
        "with_full_oracle": len(ORACLES),
        "queries": {n: _RESULTS[n] for n in QUERIES},
    }
    with open(_ARTIFACT, "w") as f:
        json.dump(out, f, indent=1, default=str)
        f.write("\n")
