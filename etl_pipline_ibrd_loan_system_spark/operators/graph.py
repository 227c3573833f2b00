"""Graph operators: fixed-point PageRank over an edge DataFrame.

Not reference-derived — the iterative-algorithm representative of the
engine (alongside dedup.connected_components), built to be EXACTLY
reproducible: all rank arithmetic is 64-bit INTEGER fixed-point
(1e12 units), so the result is independent of partition count, shuffle
order, and engine — float PageRank differs in the last ulps between
any two reduction orders, which would both break the DuckDB oracle
hash and make cluster runs non-reproducible run-to-run.

The deliberate fixed-point truncation (integer division loses < 1 unit
= 1e-12 of rank per edge per iteration) is far below any ranking
decision threshold, and both engines truncate identically.

Scale shape: each iteration is one join (ranks |x| edges on src — the
SAME key partitioning every iteration, so a co-partitioned cluster
layout shuffles once total) plus one map-side-combined integer sum on
dst. Driver state: none (ranks stay distributed; only the iteration
COUNT is driver-side). Edges are localCheckpoint'ed once so lineage
doesn't grow with iterations — the connected_components lesson.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1e12 fixed-point units per unit of rank


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank_units) after `iters` damped iterations.

    rank_0   = SCALE div N
    contrib  = rank div outdeg           (per out-edge, integer)
    rank_k+1 = (100-d)*SCALE div (100*N) + d * sum(contribs) div 100

    Every node is expected to have outdeg >= 1 (make the graph
    symmetric first if needed — dangling-node mass redistribution is
    out of scope for the fixed-point contract)."""
    e = edges.select(
        F.col(src).cast("bigint").alias("src"), F.col(dst).cast("bigint").alias("dst")
    ).localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    n = nodes.count()  # driver-side scalar, like the IVF centroid count
    base = ((100 - damping_pct) * SCALE) // (100 * n)
    ranks = nodes.select("node", F.lit(SCALE // n).cast("bigint").alias("rank"))
    for _ in range(iters):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(deg.withColumnRenamed("node", "__dn"), e.src == F.col("__dn"))
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).alias("rank"),
        )
    return ranks.select("node", F.col("rank").alias("rank_units"))


def pagerank_oracle_ctes(iters: int = 3, damping_pct: int = 85) -> str:
    """DuckDB CTE chain replaying the fixed-point iterations verbatim.
    Expects CTEs `edges(src, dst)` to exist; emits `prfinal(node,
    rank_units)`. Generated from the same constants as the Spark path
    (the lloyd_oracle_ctes pattern) so the two can't drift."""
    parts = [
        "prnodes AS (SELECT DISTINCT src AS node FROM (SELECT src FROM edges"
        " UNION ALL SELECT dst FROM edges))",
        "prdeg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "prn AS (SELECT COUNT(*) AS n FROM prnodes)",
        f"pr0 AS (SELECT node, ({SCALE} // n)::BIGINT AS rank FROM prnodes, prn)",
    ]
    prev = "pr0"
    for k in range(1, iters + 1):
        parts.append(
            f"prc{k} AS (SELECT e.dst AS node, SUM(r.rank // d.outdeg) AS s"
            f" FROM edges e JOIN {prev} r ON e.src = r.node"
            f" JOIN prdeg d ON d.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"pr{k} AS (SELECT p.node,"
            f" (({100 - damping_pct} * {SCALE}) // (100 * n)"
            f" + ({damping_pct} * COALESCE(c.s, 0)) // 100)::BIGINT AS rank"
            f" FROM prnodes p CROSS JOIN prn LEFT JOIN prc{k} c ON p.node = c.node)"
        )
        prev = f"pr{k}"
    parts.append(
        f"prfinal AS (SELECT node, rank AS rank_units FROM {prev})"
    )
    return ",\n    ".join(parts)
