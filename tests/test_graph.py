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


def test_bellman_ford_improves_after_discovery(spark):
    """A node first reached expensively must take the cheaper longer
    path found in a later round — the semantics BFS's visited set would
    destroy (cost may improve after discovery)."""
    from etl_pipline_ibrd_loan_system_spark.operators.graph import bellman_ford

    # seed -> a (w=10) ; seed -> b (w=1) -> c (w=1) -> a (w=1):
    # round1 discovers a at 10; round3 improves it to 3
    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 3, 1), (3, 1, 1)],
        "src bigint, dst bigint, w bigint",
    )
    seeds = spark.createDataFrame([(0,)], "node bigint")
    got = {r.node: r.dist for r in bellman_ford(edges, seeds, rounds=3).collect()}
    assert got == {0: 0, 1: 3, 2: 1, 3: 2}


def test_bellman_ford_partition_invariance(spark):
    """Integer distances: any edge partitioning gives identical rows."""
    from etl_pipline_ibrd_loan_system_spark.operators.graph import bellman_ford

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20, 1 + (i % 4)) for i in range(40)]
        + [((i * 7 + 3) % 20, i, 1 + (i % 4)) for i in range(40)],
        "src bigint, dst bigint, w bigint",
    )
    seeds = spark.createDataFrame([(0,), (5,)], "node bigint")
    a = sorted(
        (r.node, r.dist)
        for r in bellman_ford(edges.repartition(1), seeds, rounds=3).collect()
    )
    b = sorted(
        (r.node, r.dist)
        for r in bellman_ford(edges.repartition(13), seeds, rounds=3).collect()
    )
    assert a == b
