"""Fixed-point PageRank properties (operators/graph.py)."""

from __future__ import annotations

from etl_pipline_ibrd_loan_system_spark.operators import graph


def test_pagerank_star_ranks_center_highest(spark):
    """On a 4-spoke star (symmetric edges), the center must outrank the
    spokes, spokes are symmetric (identical units), and total mass
    stays within truncation slack of SCALE."""
    e0 = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        e0 + [(b, a) for a, b in e0], "src long, dst long"
    )
    out = {r.node: r.rank_units for r in graph.pagerank_fixed_point(edges, iters=3).collect()}
    assert len(out) == 5
    assert all(out[0] > out[i] for i in range(1, 5))
    assert len({out[i] for i in range(1, 5)}) == 1, "spokes must be symmetric"
    total = sum(out.values())
    # integer truncation only ever loses mass: <= 1 unit per edge+node per iter
    assert graph.SCALE * 0.999 < total <= graph.SCALE


def test_pagerank_deterministic_across_partitionings(spark):
    """The fixed-point contract: identical units under different
    partition counts (a float PageRank would differ in the last ulps)."""
    import random

    rnd = random.Random(7)
    e0 = list({(rnd.randrange(30), rnd.randrange(30)) for _ in range(120)})
    e0 = [(a, b) for a, b in e0 if a != b]
    sym = e0 + [(b, a) for a, b in e0]
    one = spark.createDataFrame(sym, "src long, dst long").coalesce(1)
    many = spark.createDataFrame(sym, "src long, dst long").repartition(13)
    r1 = {r.node: r.rank_units for r in graph.pagerank_fixed_point(one, iters=3).collect()}
    r2 = {r.node: r.rank_units for r in graph.pagerank_fixed_point(many, iters=3).collect()}
    assert r1 == r2
