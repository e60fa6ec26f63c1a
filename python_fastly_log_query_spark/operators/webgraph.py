"""Host-level web-graph analytics: outlink extraction from HTML and an
integer-exact PageRank iteration.

The link structure of a crawl is a first-class signal for a training
pipeline (domain authority as a quality prior, spam-farm detection via
degree anomalies) and the canonical "iterative graph algorithm over a
web-scale edge list" — the shape Spark's join+aggregate model handles
at any size (reference analog: the per-key rollup loops of
``/root/reference/src/analyze/analytics.py`` generalized to a fixpoint).

Scale shape:

- Outlink extraction is MAP-ONLY: one ``regexp_extract_all`` over the
  page bytes, explode, aggregate to a weighted host→host edge list.
  The edge table is hosts² at worst — dimension-like next to 10^12
  pages — and is the only thing the iteration ever touches.
- Each PageRank round is ONE join (prev scores onto edge sources) and
  ONE aggregate (incoming shares by destination) — both shuffle on the
  host key; with the edge list bucketed by ``src`` the join is
  co-located and a round costs a single Exchange of score rows.
- All arithmetic is INTEGER (scores scaled by 10^12, shares via
  multiply-then-``div``): sums are associative, so the result is
  bit-identical under any partitioning/ordering, and the DuckDB oracle
  (the K-stage unrolled SQL fixpoint, same pattern as
  ``operators/bpe.py``) replays it exactly.  This is the same
  determinism discipline as ``dsir_bucket_weights``' ppm weights:
  transcendental-free, associativity-proof.

PageRank variant (documented, deterministic): with damping d=0.85 and
N graph nodes,

    share(e)    = pr(src) * w(e) div out_w(src)
    pr_next(v)  = (15 * SCALE) div (100 * N)
                  + (85 * sum(incoming shares)) div 100

Floor division loses a few units of 10^-12 mass per round rather than
renormalizing — rank order matches float PageRank far beyond the
score's useful precision, and every engine computes the identical
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE = 10**12

_HREF_RE = r'<a href="https://([^/"]+)/'


def extract_outlinks(
    pages: DataFrame, html_col: str = "html", src_col: str = "src_host",
    binary: bool = True,
) -> DataFrame:
    """(src_host, dst_host, w) weighted edge list from anchor hrefs —
    map-only extraction + one aggregate on the edge key."""
    s = F.decode(F.col(html_col), "UTF-8") if binary else F.col(html_col)
    links = F.regexp_extract_all(s, F.lit(_HREF_RE), 1)
    return (
        pages.select(F.col(src_col).alias("src"), F.explode(links).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Integer-exact PageRank over a weighted (src, dst, w) edge list;
    returns (host, pr) with pr scaled by ``SCALE``.  See module doc for
    the exact variant.  Driver holds only the loop counter — scores and
    edges stay distributed; ``localCheckpoint`` keeps the K-round plan
    shallow (same pattern as connected_components)."""
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()  # reused every round; cut the distinct's lineage
    )
    n = nodes.count()
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = edges.join(outw, "src").localCheckpoint()  # (src, dst, w, ow)
    teleport = (15 * SCALE) // (100 * n)
    pr = nodes.withColumn("pr", F.lit(SCALE // n).cast("long"))
    for k in range(1, iterations + 1):
        inc = (
            ew.join(pr.withColumnRenamed("host", "src"), "src")
            .select("dst", F.expr("pr * w div ow").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("inc"))
        )
        pr = (
            nodes.join(inc.withColumnRenamed("dst", "host"), "host", "left")
            .select(
                "host",
                (
                    F.lit(teleport)
                    + F.expr("85 * coalesce(inc, 0L) div 100")
                ).cast("long").alias("pr"),
            )
        )
        if k % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=False)
    return pr


# ------------------------------------------------------------- SQL twin


def extract_outlinks_sql(html_expr: str, src_expr: str,
                         from_clause: str) -> str:
    """DuckDB CTE body mirroring :func:`extract_outlinks` (the oracle
    builds pages as VARCHAR, so no decode)."""
    return f"""
  SELECT {src_expr} AS src, unnest(regexp_extract_all({html_expr},
         '<a href="https://([^/"]+)/', 1)) AS dst
  FROM {from_clause}
"""


def pagerank_sql(iterations: int, edges_cte: str = "edges") -> tuple[str, str]:
    """(CTE chain, final select) unrolling :func:`pagerank` over a
    ``{edges_cte}(src, dst, w)`` relation — kept in lockstep with the
    DataFrame loop."""
    parts = [
        f"nodes AS (SELECT DISTINCT host FROM (SELECT src AS host FROM {edges_cte} "
        f"UNION ALL SELECT dst FROM {edges_cte}))",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM {edges_cte} GROUP BY 1)",
        f"pr0 AS (SELECT host, CAST({SCALE} // n AS BIGINT) AS pr FROM nodes, nn)",
    ]
    for k in range(1, iterations + 1):
        prev = f"pr{k - 1}"
        parts.append(f"""
inc{k} AS (
  SELECT e.dst, CAST(sum(p.pr * e.w // o.ow) AS BIGINT) AS inc
  FROM {edges_cte} e
  JOIN {prev} p ON p.host = e.src
  JOIN outw o ON o.src = e.src
  GROUP BY 1),
pr{k} AS (
  SELECT n.host,
         CAST((15 * {SCALE}) // (100 * nn.n)
              + 85 * COALESCE(i.inc, 0) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN inc{k} i ON i.dst = n.host, nn)""")
    return ",".join(parts), f"SELECT host, pr FROM pr{iterations}"
