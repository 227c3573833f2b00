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


def test_bellman_ford_pinned_edge_layout_parity_and_reuse(spark):
    """edge_partitions pins a src-hash layout of the static edge table;
    results must be identical to the re-shuffle-every-round path
    (integer weights: partition-invariant), and the relaxation join must
    read edges from the cache (InMemoryTableScan in the plan) instead of
    recomputing the edge lineage each round."""
    from etl_pipline_ibrd_loan_system_spark.cache import release_pinned
    from etl_pipline_ibrd_loan_system_spark.operators.graph import bellman_ford

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (1, 3, 9), (3, 4, 2), (4, 1, 7)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    base = {
        (r.node, r.dist) for r in bellman_ford(edges, seeds, rounds=3).collect()
    }
    pinned = {
        (r.node, r.dist)
        for r in bellman_ford(edges, seeds, rounds=3, edge_partitions=4).collect()
    }
    assert pinned == base
    assert release_pinned() >= 1  # the layout was registered for cleanup

    # layout-reuse proof on one relaxation round (the per-round plan is
    # checkpointed away inside bellman_ford, so assert on its shape
    # directly): the edge side comes from the cache, and the only
    # Exchange hash-partitions the dist side into the cached layout
    from etl_pipline_ibrd_loan_system_spark.cache import pin
    from pyspark.sql import functions as F

    e = pin(edges.repartition(4, "src"))
    e.count()  # materialize the cache
    dist = seeds.select("node", F.lit(0).cast("bigint").alias("dist"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at scale the edge side is far beyond broadcast size: force the
        # SMJ shape the layout reuse exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        relax = dist.join(e, dist.node == e.src).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        plan = relax._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "InMemoryTableScan" in plan
    # everything after InMemoryRelation is the cached BUILD plan (its
    # one-time repartition Exchange included in the toString) — live
    # Exchanges are only those before it: exactly one, on the dist side
    live = plan.split("InMemoryRelation", 1)[0]
    assert live.count("Exchange hashpartitioning") == 1, plan
    release_pinned()


def test_kcore_peels_tendrils_keeps_clique(spark):
    """K5 clique + pendant chain at k=3: the chain peels away, the
    clique survives with exact within-core degrees; an insufficient
    max_rounds raises instead of returning a truncated peel."""
    import pytest

    from etl_pipline_ibrd_loan_system_spark.operators import graph

    clique = [(a, b) for a in range(1, 6) for b in range(1, 6) if a != b]
    chain = [(5, 6), (6, 5), (6, 7), (7, 6)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")

    out = {r.node: r.core_degree for r in graph.kcore(edges, k=3).collect()}
    assert out == {1: 4, 2: 4, 3: 4, 4: 4, 5: 4}

    # k above the clique degree cascades everything away
    assert graph.kcore(edges, k=5).count() == 0

    # the guard: peeling needs 2 rounds here (drop 7+6, then recount)
    with pytest.raises(ValueError, match="did not converge"):
        graph.kcore(edges, k=3, max_rounds=1)


def _lpa_reference(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Independent synchronous LPA replay (self-vote, min-label ties)."""
    from collections import Counter, defaultdict

    neigh = defaultdict(list)
    for s, d in edges:
        neigh[d].append(s)
    labels = {n: n for n in {s for s, _ in edges}}
    for _ in range(rounds):
        nxt = {}
        for node in labels:
            votes = Counter(labels[s] for s in neigh[node])
            votes[labels[node]] += 1  # self-vote
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[node] = best[0]
        labels = nxt
    return labels


def test_label_propagation_two_triangles(spark):
    """Two triangles bridged by one edge: each triangle collapses onto
    its smallest member's label; the bridge alone can't flip either
    side (1 neighbor vote vs 2 triangle votes + self-vote). Matches an
    independent Python replay exactly, at any partitioning."""
    from etl_pipline_ibrd_loan_system_spark.operators import graph

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(4, 5), (5, 6), (4, 6)]
    bridge = [(3, 4)]
    sym = [(a, b) for a, b in tri1 + tri2 + bridge] + [
        (b, a) for a, b in tri1 + tri2 + bridge
    ]
    edges = spark.createDataFrame(sym, "src long, dst long")

    got = {
        r.node: r.community
        for r in graph.label_propagation(edges, rounds=4).collect()
    }
    assert got == _lpa_reference(sym, rounds=4)
    assert {got[1], got[2], got[3]} == {1}
    assert {got[4], got[5], got[6]} == {4}

    # partition-count invariance (integer state: bit-identical)
    got12 = {
        r.node: r.community
        for r in graph.label_propagation(
            edges.repartition(12), rounds=4
        ).collect()
    }
    assert got12 == got

    # vote_partitions memory-envelope knob (VERDICT r8 item 4): the
    # per-round node-bucket repartition changes only WHERE vote rows
    # sit, never the argmax — bit-identical communities
    got_knob = {
        r.node: r.community
        for r in graph.label_propagation(
            edges, rounds=4, vote_partitions=7
        ).collect()
    }
    assert got_knob == got


def test_label_propagation_matches_reference_on_bipartite(spark):
    """Synchronous LPA's hard case — a complete bipartite K2,3 — must
    still match the independent replay round-for-round (the self-vote
    damps, but whatever the dynamics do, both implementations do it
    together; fixed-round output is the contract, not convergence)."""
    from etl_pipline_ibrd_loan_system_spark.operators import graph

    left, right = [1, 2], [10, 11, 12]
    sym = [(a, b) for a in left for b in right]
    sym += [(b, a) for a, b in sym]
    edges = spark.createDataFrame(sym, "src long, dst long")
    for rounds in (1, 2, 3):
        got = {
            r.node: r.community
            for r in graph.label_propagation(edges, rounds=rounds).collect()
        }
        assert got == _lpa_reference(sym, rounds=rounds), rounds


def test_hyperball_matches_independent_hll_replay(spark):
    """Two triangles + bridge: ball estimates at every radius equal an
    independent Python replay of the same HLL (md5-based shared hash,
    rho cascade, decimal register sum, same estimator branches), and
    balls are monotone with ball_r0 == 1 on a 512-register sketch."""
    import hashlib
    import math
    from collections import defaultdict

    from etl_pipline_ibrd_loan_system_spark.operators import graph

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(4, 5), (5, 6), (4, 6)]
    sym = tri1 + tri2 + [(3, 4)]
    sym = sym + [(b, a) for a, b in sym]
    edges = spark.createDataFrame(sym, "src long, dst long")
    out = {r.node: r for r in graph.hyperball(edges, rounds=3).collect()}

    B, CAP = 9, 20
    m = 2 ** B

    def h60(v: int) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    def rho(w: int) -> int:
        for k in range(1, CAP):
            if w % (2 ** k) == 2 ** (k - 1):
                return k
        return CAP

    def estimate(members: set[int]) -> int:
        regs: dict[int, int] = {}
        for v in members:
            h = h60(v)
            b = h % m
            regs[b] = max(regs.get(b, 0), rho(h >> B))
        npres = len(regs)
        z = (m - npres) + sum(2.0 ** -r for r in regs.values())
        alpha_m2 = 0.7213 / (1.0 + 1.079 / m) * m * m
        raw = alpha_m2 / z
        if raw <= 2.5 * m and (m - npres) > 0:
            return round(m * math.log(m / (m - npres)))
        return round(raw)

    neigh = defaultdict(set)
    for a, b in sym:
        neigh[a].add(b)
    balls = {v: {v} for v in neigh}
    for node in neigh:
        assert out[node].ball_r0 == estimate({node}) == 1
    for r in range(1, 4):
        balls = {
            v: balls[v] | set().union(*(balls[u] for u in neigh[v]))
            for v in balls
        }
        for node in neigh:
            got = out[node][f"ball_r{r}"]
            assert got == estimate(balls[node]), (node, r)
            assert got >= out[node][f"ball_r{r - 1}"]


def test_register_max_merge_matches_sql_aggregation(spark):
    """The Arrow register combine (optimization r12: replaces the m
    per-column MAX aggregates that executed interpreted) must merge
    bit-identically to the SQL form it replaced — including nodes
    spread across partitions, single-row nodes, and the rho cap value.
    """
    import random

    import pyspark.sql.functions as F

    m = 32
    rng = random.Random(7)
    rows = [
        (node, [rng.choice([0, 1, 3, 7, 20]) for _ in range(m)])
        for node in (1, 2, 2, 3, 3, 3, 9)
        for _ in range(2)
    ]
    df = spark.createDataFrame(
        [(n, [int(x) for x in v]) for n, v in rows],
        "node long, regs array<tinyint>",
    ).repartition(5)
    got = {
        r.node: list(r.regs)
        for r in graph._register_max_merge(df, m).collect()
    }
    ref = {
        r.node: [r[f"r{i}"] for i in range(m)]
        for r in df.groupBy("node")
        .agg(*[F.max(F.element_at("regs", i + 1)).alias(f"r{i}") for i in range(m)])
        .collect()
    }
    assert got == ref
    # empty input: no rows, no failure
    empty = spark.createDataFrame([], "node long, regs array<tinyint>")
    assert graph._register_max_merge(empty, m).count() == 0
