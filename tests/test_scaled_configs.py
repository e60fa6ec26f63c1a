"""The scale-honest embedding configs' growth-law DISPATCH, exercised at
a cell count the fixtures never reach (VERDICT r4 item 1, the
dedup_minhash_lsh_auto treatment: verify per distinct config branch).

At every committed fixture the corpus is small enough that
max(8, N // 250) resolves to the 8-cell floor, so the gate's green rows
alone would never run the dynamic-k SQL at k != 8.  This module builds a
3,000-vector table (sf0.1's 2,000 embeddings + 1,000 exact-duplicate
copies — also the dup-heavy regime SemDeDup exists for), where the law
resolves to k = 12, and checks the registered Spark queries against
their registered oracles on that table: the SAME oracle statement must
verify whichever k the dispatch resolves to.
"""

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from python_fastly_log_query_spark import queries as Q


@pytest.fixture(scope="module")
def big_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_big")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = emb.count()
    assert n == 2000
    copies = emb.filter(F.col("vec_id") < 1000).select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding", "label"
    )
    emb.select("vec_id", "embedding", "label").unionAll(copies).write.mode(
        "overwrite"
    ).parquet(str(d / "embeddings.parquet"))
    return str(d)


def _canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return v


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _check(spark, big_dir, name):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{big_dir}/embeddings.parquet/*.parquet')"
    )
    sdf = Q.queries()[name](spark, big_dir)
    got = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = con.execute(Q.oracle_sql()[name])
    want = _rows([c[0] for c in res.description], res.fetchall())
    assert len(got) == len(want) and got == want, (
        name, len(got), len(want), got[:3], want[:3])
    return got


def test_scaled_cells_law_resolves_past_the_floor(spark, big_dir):
    emb = spark.read.parquet(f"{big_dir}/embeddings.parquet")
    assert Q._scaled_cells(emb) == 12  # not the 8-cell fixture floor


def test_semdedup_scaled_oracle_at_k12(spark, big_dir):
    rows = _check(spark, big_dir, "semdedup_scaled")
    cells = {r[0] for r in rows}  # columns sorted: cell, is_dup, vec_id
    assert max(cells) == 11 and len(cells) == 12  # 12 cells actually used
    # the 1,000 exact duplicates force is_dup hits
    assert sum(r[1] for r in rows) >= 1000


def test_knn_graph_scaled_oracle_at_k12(spark, big_dir):
    rows = _check(spark, big_dir, "knn_graph_scaled")
    # columns sorted: cosine, nbr_id, rank, vec_id — every duplicated
    # vector's top neighbor is its exact copy at cosine 1.0
    top = {r[3]: (r[1], r[0]) for r in rows if r[2] == 1}
    hits = sum(
        1 for v in range(1000) if top.get(v, (None, 0))[0] == v + 2000
    )
    assert hits >= 900  # copies live in the same trained cell
