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
    # nodes/deg are NODE-sized derivations of the EDGE-sized checkpoint:
    # materialize them once, or every iteration's plan re-runs the
    # 2x|E|-row distinct and the degree aggregate per reference (the r8
    # sf10 wall: four 100M-row distincts inside one mega-plan OOM'd a
    # 24g JVM; node-sized checkpoints make each iteration's memory the
    # one edges-join, the same discipline bfs_hops already applies)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct().localCheckpoint(eager=True)
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).localCheckpoint(eager=True)
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
        # per-iteration cut (node-sized), as in bfs_hops: without it the
        # final action executes every iteration's joins inside one plan
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).alias("rank"),
        ).localCheckpoint(eager=False)
    return ranks.select("node", F.col("rank").alias("rank_units"))


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over an UNDIRECTED simple
    graph given as (src, dst) pairs (either or both orientations; loops
    and duplicates are removed here).

    Algorithm: degree-ordered orientation (Cohen / Suri-Vassilvitskii's
    MR triangle counting). Each undirected edge is kept once, oriented
    from the LOWER-(degree, id) endpoint to the higher. Wedges are then
    a self-join of the oriented edge list on its source, and a wedge
    (a→b, a→c) closes iff oriented edge b→c exists — a second equi-join.
    Orientation by degree bounds every node's oriented out-degree by
    O(sqrt(|E|)) on any graph, so the wedge fan-out — the quadratic
    term that kills the naive a<b<c id-orientation on skewed graphs
    (one celebrity hub = deg² wedges) — is capped regardless of skew.
    The triangle SET is orientation-invariant, so the oracle can replay
    with the simple id-ordering and identical results.

    Both joins are plain equi-joins on node keys: broadcastable when the
    oriented edge list is small, shuffle-partitioned otherwise, and the
    wedge join and closure join share the same key family. Returns
    (node, n_triangles) for every node in at least one triangle.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("bigint").alias("u"),
            F.greatest(F.col(src), F.col(dst)).cast("bigint").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient low (deg, id) -> high (deg, id): a strict total order, so
    # each undirected edge survives exactly once
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("lo"), F.col("v").alias("hi")),
            )
            .otherwise(F.struct(F.col("v").alias("lo"), F.col("u").alias("hi")))
            .alias("e")
        )
        .select(F.col("e.lo").alias("a"), F.col("e.hi").alias("b"))
    )
    e1 = oriented.select(F.col("a").alias("w_a"), F.col("b").alias("w_b"))
    e2 = oriented.select(F.col("a").alias("w_a"), F.col("b").alias("w_c"))
    # w_b < w_c (id order) keeps each unordered wedge once; the closing
    # edge test then goes against the CANONICAL (u<v) undirected list —
    # a plain two-key equi-join (hash join), not the OR-of-orientations
    # condition that would fall off the hash-join path
    wedges = e1.join(e2, "w_a").where(F.col("w_b") < F.col("w_c"))
    tri = wedges.join(
        und,
        (F.col("u") == F.col("w_b")) & (F.col("v") == F.col("w_c")),
        "left_semi",
    ).select("w_a", "w_b", "w_c")
    corners = (
        tri.select(F.col("w_a").alias("node"))
        .union(tri.select(F.col("w_b").alias("node")))
        .union(tri.select(F.col("w_c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


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


def bfs_hops(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 3
) -> DataFrame:
    """Bounded-depth multi-source BFS: (node, dist) for every node within
    `max_depth` hops of the seed set (dist = MINIMUM hop count; seeds
    are dist 0).

    The Pregel frontier pattern in DataFrame form: each round expands
    only the CURRENT frontier (not the whole visited set) through one
    (frontier |x| edges) join on src, then anti-joins the visited set so
    a node is labeled exactly once, at its first (= minimal) depth.
    Every round shuffles on the same node key — a co-partitioned layout
    shuffles once; state stays fully distributed (no driver collect).
    Frontiers are localCheckpoint'ed per round: the lineage would
    otherwise double per depth (the connected_components lesson), and
    the checkpoint also stops Catalyst from re-deriving round k-1's
    anti-join inside round k's.

    Depth is a FIXED bound, not a convergence test — the oracle unrolls
    the same rounds, and a 100 TB run sizes max_depth to the analysis
    question (reachability radius), never to the graph diameter.
    """
    seeds = seeds.select(F.col("node").cast("bigint")).distinct()
    edges = edges.select(
        F.col("src").cast("bigint"), F.col("dst").cast("bigint")
    ).localCheckpoint(eager=False)
    known = seeds.select("node", F.lit(0).alias("dist")).localCheckpoint(
        eager=True
    )
    frontier = known.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(known.select("node"), "node", "left_anti")
            .select("node", F.lit(depth).alias("dist"))
            .localCheckpoint(eager=True)
        )
        known = known.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return known


def bellman_ford(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    weight: str = "w",
    edge_partitions: int | None = None,
) -> DataFrame:
    """Bounded-round Bellman-Ford: minimum path cost from any seed in at
    most `rounds` edge relaxations. `edges` carries (src, dst, w) with
    INTEGER weights — distances stay integer-exact, so any partitioning
    yields bit-identical results (the g3 pagerank discipline).

    Each round is one (dist |x| edges) join keyed on src plus one
    combinable MIN aggregate over (previous dists UNION relaxed
    candidates) — the same per-round shuffle budget as bfs_hops, with
    the visited anti-join replaced by the min fold (a node's cost may
    IMPROVE after first discovery, the thing BFS may assume away only
    for unit weights). localCheckpoint per round keeps lineage flat.

    `edge_partitions` is the 100 TB escape the round-6 decade sweep
    demanded (g6 scaled 2.8x across 10x edges — every round re-shuffled
    the static edge table): hash-partition edges on src ONCE and pin the
    layout; each round's join then reuses the cached partitioning, so
    only the (small) frontier/dist side moves per round. The per-round
    shuffle drops from O(|E|) to O(|dist|). Cache-pinned, so the driver
    loop releases it after the query materializes."""
    edges = edges.select(
        F.col("src").cast("bigint"),
        F.col("dst").cast("bigint"),
        F.col(weight).cast("bigint").alias("w"),
    )
    if edge_partitions:
        from ..cache import pin

        edges = pin(edges.repartition(edge_partitions, "src"))
    else:
        edges = edges.localCheckpoint(eager=False)
    dist = seeds.select(
        F.col("node").cast("bigint"), F.lit(0).cast("bigint").alias("dist")
    ).distinct().localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = (
            dist.join(edges, dist.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.union(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def personalized_pagerank_fixed_point(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Personalized PageRank (random walk with restart to the SEED set):
    like pagerank_fixed_point but the teleport mass returns only to the
    seeds — rank becomes proximity TO the seed set, the graph-retrieval
    primitive (related-entity ranking, seed-expansion labeling) where
    global PageRank is just importance. Identical integer fixed-point
    discipline: 1e12-unit ranks, `div` everywhere, so partitioning and
    reduction order can't move a single unit and the oracle replays the
    iterations verbatim (ppr_oracle_ctes, generated from the same
    constants).

    rank_0(v)   = SCALE div |S| for v in S, else 0
    rank_k+1(v) = [v in S] * (100-d)*SCALE div (100*|S|)
                  + d * sum(contribs) div 100

    Scale: per-iteration cost equals one edges x ranks equi-join plus a
    node-grain aggregate (the Pregel superstep); |S| is a driver-side
    scalar (the IVF-centroid rule). Mass leaks at dangling/unreached
    nodes exactly as in the global variant — proximity ORDER, the thing
    retrieval uses, is unaffected."""
    e = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    ).localCheckpoint(eager=True)
    # node-sized checkpoints for the same reason as pagerank_fixed_point:
    # every iteration references nodes/deg, and without the cut each
    # reference replays the 2x|E|-row distinct / degree aggregate
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).localCheckpoint(eager=True)
    s = seeds.select(F.col("node").cast("bigint").alias("node")).distinct()
    ns = s.count()  # driver-side scalar, bounded by the seed set
    if ns == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    seed_base = ((100 - damping_pct) * SCALE) // (100 * ns)
    init = SCALE // ns
    seed_flag = s.withColumn("__seed", F.lit(True))
    ranks = nodes.join(seed_flag, "node", "left").select(
        "node",
        F.when(F.col("__seed"), F.lit(init))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rank"),
    )
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
        ranks = (
            nodes.join(contribs, "node", "left")
            .join(seed_flag, "node", "left")
            .select(
                "node",
                (
                    F.when(F.col("__seed"), F.lit(seed_base))
                    .otherwise(F.lit(0))
                    .cast("bigint")
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0)) div 100"
                    ).cast("bigint")
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.withColumnRenamed("rank", "rank_units")


def ppr_oracle_ctes(iters: int = 3, damping_pct: int = 85) -> str:
    """DuckDB CTE chain replaying personalized_pagerank_fixed_point.
    Expects `edges(src, dst)` and `pprseeds(node)`; emits
    `pprfinal(node, rank_units)`."""
    parts = [
        "pprnodes AS (SELECT DISTINCT src AS node FROM (SELECT src FROM edges"
        " UNION ALL SELECT dst FROM edges))",
        "pprdeg AS (SELECT src AS node, COUNT(*) AS outdeg"
        " FROM edges GROUP BY src)",
        "pprns AS (SELECT COUNT(*) AS ns FROM (SELECT DISTINCT node"
        " FROM pprseeds))",
        f"ppr0 AS (SELECT p.node, (CASE WHEN s.node IS NOT NULL"
        f" THEN {SCALE} // ns ELSE 0 END)::BIGINT AS rank"
        f" FROM pprnodes p CROSS JOIN pprns"
        f" LEFT JOIN (SELECT DISTINCT node FROM pprseeds) s"
        f" ON s.node = p.node)",
    ]
    prev = "ppr0"
    for k in range(1, iters + 1):
        parts.append(
            f"pprc{k} AS (SELECT e.dst AS node, SUM(r.rank // d.outdeg) AS s"
            f" FROM edges e JOIN {prev} r ON e.src = r.node"
            f" JOIN pprdeg d ON d.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"ppr{k} AS (SELECT p.node,"
            f" ((CASE WHEN sd.node IS NOT NULL"
            f" THEN ({100 - damping_pct} * {SCALE}) // (100 * ns)"
            f" ELSE 0 END)"
            f" + ({damping_pct} * COALESCE(c.s, 0)) // 100)::BIGINT AS rank"
            f" FROM pprnodes p CROSS JOIN pprns"
            f" LEFT JOIN pprc{k} c ON p.node = c.node"
            f" LEFT JOIN (SELECT DISTINCT node FROM pprseeds) sd"
            f" ON sd.node = p.node)"
        )
        prev = f"ppr{k}"
    parts.append(f"pprfinal AS (SELECT node, rank AS rank_units FROM {prev})")
    return ",\n    ".join(parts)


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 8,
) -> DataFrame:
    """The k-CORE of an undirected graph (edges given symmetric, as for
    pagerank): the maximal subgraph where every node keeps degree >= k,
    computed by iterative peeling — drop sub-k nodes, recount degrees
    among survivors, repeat to fixpoint. Core membership is a standard
    graph-quality gate (spam rings and isolated tendrils fall out of
    low cores; the dense collaboration/trade structure survives).

    Returns (node, core_degree) with core_degree the node's degree
    WITHIN the core. Deterministic: peeling has a unique fixpoint
    regardless of removal order, and every step is integer counting.

    Scale shape: per round, ONE edges join against the (node-sized,
    eagerly checkpointed) survivor set on each endpoint and a map-side-
    combinable degree count — the edge table itself is checkpointed
    once and never recomputed (the pagerank/bfs lineage discipline).
    Rounds are data-bounded: the loop exits as soon as a round removes
    nothing (each round's survivor count is already on the driver), and
    RAISES if `max_rounds` passes without convergence, so a truncated
    peel can never silently masquerade as the core — `max_rounds` is an
    oracle-parity bound (the unrolled SQL replays the same rounds;
    post-fixpoint rounds are no-ops on both engines), not an
    approximation knob.
    """
    e = edges.select(
        F.col(src).cast("bigint").alias("src"),
        F.col(dst).cast("bigint").alias("dst"),
    ).localCheckpoint(eager=True)
    surv = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = surv.count()
    for _ in range(max_rounds):
        deg = (
            e.join(surv.withColumnRenamed("node", "__a"), e.src == F.col("__a"))
            .join(surv.withColumnRenamed("node", "__b"), e.dst == F.col("__b"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )
        kept = deg.where(F.col("core_degree") >= k).localCheckpoint(eager=True)
        n_now = kept.count()
        surv = kept.select("node")
        if n_now == n_prev:
            return kept.select("node", "core_degree")
        n_prev = n_now
        if n_now == 0:
            return kept.select("node", "core_degree")
    raise ValueError(
        f"kcore: peeling did not converge within max_rounds={max_rounds}; "
        "raise max_rounds (the oracle unrolls the same bound)"
    )


def kcore_oracle_ctes(k: int, rounds: int = 8) -> str:
    """DuckDB CTE chain replaying `rounds` peeling rounds verbatim
    (pagerank_oracle_ctes pattern). Expects `edges(src, dst)`; emits
    `kcfinal(node, core_degree)`. Post-fixpoint rounds recompute the
    same survivor set, so any rounds >= the true peel depth yield the
    exact k-core — matching the Spark loop's early-exit semantics."""
    # every kcs CTE is referenced TWICE by the next round's degree
    # count: without AS MATERIALIZED the inliner doubles the plan per
    # round (2^rounds copies of the whole chain — measured: sf0.1 at
    # rounds=8 ran minutes instead of seconds). kcedges pins the edge
    # list once for the same reason.
    parts = [
        "kcedges AS MATERIALIZED (SELECT src, dst FROM edges)",
        "kcs0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM kcedges)",
    ]
    prev = "kcs0"
    for r in range(1, rounds + 1):
        parts.append(
            f"kcd{r} AS (SELECT e.src AS node, COUNT(*) AS core_degree"
            f" FROM kcedges e JOIN {prev} a ON e.src = a.node"
            f" JOIN {prev} b ON e.dst = b.node GROUP BY e.src)"
        )
        parts.append(
            f"kcs{r} AS MATERIALIZED (SELECT node, core_degree FROM kcd{r}"
            f" WHERE core_degree >= {k})"
        )
        prev = f"kcs{r}"
    parts.append(
        f"kcfinal AS (SELECT node, core_degree FROM {prev})"
    )
    return ",\n    ".join(parts)


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    vote_partitions: int | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation (edges
    given symmetric, as for pagerank/kcore): every node starts in its
    own community (label = node id); each round it adopts the most
    frequent label among its neighbors PLUS its own current label (the
    self-vote), ties broken by the smallest label. Runs EXACTLY
    `rounds` rounds — LPA has no convergence guarantee (synchronous
    updates on a bipartite graph oscillate without the self-vote, and
    can cycle even with it), so fixed-round output is the only
    deterministic contract; both engines replay the same rounds, and
    GraphFrames' labelPropagation(maxIter) ships the same semantics.
    All state is integer labels and counts — no floats anywhere.

    Returns (node, community) after `rounds` rounds.

    Scale shape: per round, ONE edges-with-labels hash join on src (the
    edge table is localCheckpoint'ed once; the label table is
    node-sized and re-checkpointed each round so lineage stays flat —
    the pagerank/kcore discipline), one map-side-combinable
    (node, label) count, and a node-partitioned argmax window whose
    per-partition row count is bounded by the node's distinct
    neighbor-label count, never the corpus.

    MEMORY ENVELOPE (the dd3/SCALE.md precedent, VERDICT r8 item 4):
    everything that is per-round working memory here is EDGE-scale —
    the checkpointed edge table's cache blocks and the pre-combine
    (node, label) vote table (one row per edge plus the self-votes) —
    so the envelope follows |E| / partitions, not |V|. Measured at
    sf10 (~110 M symmetric edge rows): DIES on the default 8 GiB
    single-box heap at 32 shuffle partitions (AGGREGATE_OUT_OF_MEMORY
    in the edge-distinct while the localCheckpoint's storage blocks
    hold the protected half of unified memory); completes in 115 s on
    a 48 GiB heap; completes in **152.6 s on the DEFAULT 8 GiB heap**
    with both dials set to 256 (SCALE.md round-9). The dials: (1)
    session spark.sql.shuffle.partitions sized so |E|/partitions stays
    in the low millions — that bounds the edge-distinct hash maps that
    build the checkpoint; (2) `vote_partitions` — when set, the vote
    table is hash-repartitioned into that many node buckets before the
    count, bounding per-partition vote rows to ~|E|/vote_partitions
    regardless of the session setting, and (since HashPartitioning on
    node satisfies both the count's and the argmax window's clustering)
    replacing the per-round groupBy+window double exchange with ONE.
    On a real cluster the same dials are the stage's shuffle-partition
    count; AQE coalescing keeps the small-label tail cheap."""
    from pyspark.sql.window import Window

    e = edges.select(
        F.col(src).cast("bigint").alias("src"),
        F.col(dst).cast("bigint").alias("dst"),
    ).localCheckpoint(eager=True)
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(rounds):
        neigh = e.join(
            labels.withColumnRenamed("node", "__s"), e.src == F.col("__s")
        ).select(F.col("dst").alias("node"), "label")
        votes = neigh.unionByName(labels)  # self-vote
        if vote_partitions:
            # bound per-partition vote rows to ~|E|/vote_partitions —
            # the memory-envelope knob documented above
            votes = votes.repartition(vote_partitions, "node")
        freq = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = (
            freq.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def lpa_oracle_ctes(rounds: int = 4) -> str:
    """DuckDB CTE chain replaying label_propagation verbatim
    (pagerank/kcore oracle pattern). Expects `edges(src, dst)`; emits
    `lpfinal(node, community)`. Every lp{r} is referenced twice by the
    next round (neighbor join + self-vote), so AS MATERIALIZED pins
    each round once — without it the inliner doubles the plan per
    round (the kcore 2^rounds lesson)."""
    parts = [
        "lpedges AS MATERIALIZED (SELECT src, dst FROM edges)",
        "lp0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label"
        " FROM lpedges)",
    ]
    prev = "lp0"
    for r in range(1, rounds + 1):
        parts.append(
            f"lpv{r} AS (SELECT e.dst AS node, l.label"
            f" FROM lpedges e JOIN {prev} l ON e.src = l.node"
            f" UNION ALL SELECT node, label FROM {prev})"
        )
        parts.append(
            f"lp{r} AS MATERIALIZED (SELECT node, label FROM ("
            f"SELECT node, label, row_number() OVER ("
            f"PARTITION BY node ORDER BY COUNT(*) DESC, label ASC) AS rn"
            f" FROM lpv{r} GROUP BY node, label) WHERE rn = 1)"
        )
        prev = f"lp{r}"
    parts.append(f"lpfinal AS (SELECT node, label AS community FROM {prev})")
    return ",\n    ".join(parts)


def _register_max_merge(pairs: DataFrame, m: int) -> DataFrame:
    """Elementwise-max merge of (node, regs array<tinyint>[m]) rows —
    the HyperBall register combine — as TWO Arrow kernels instead of m
    per-column MAX aggregates. The m-wide SQL aggregate exceeds the
    whole-stage-codegen field limit and executes interpreted: measured
    4.5 s per round at sf0.01 (~58M scalar updates on 2 tasks) vs
    ~0.3 s for `np.maximum.reduceat` over the same rows; raising
    spark.sql.codegen.maxFields to cover 512 buffers made it slower
    still (giant-method JIT fallback). Same exchange bytes as the SQL
    form: level 1 is the map-side combine (at most one row per
    (input partition, node) leaves an executor), the pinned hash
    repartition clusters nodes, level 2 finishes the merge — so each
    node exits exactly once. Integer max is order-free, so the merge
    is partition- and batch-order-invariant (the determinism the
    oracle replay relies on)."""

    def seg_max(batches):
        import numpy as np
        import pandas as pd

        nodes_parts, mats = [], []
        for pdf in batches:
            if len(pdf):
                nodes_parts.append(pdf["node"].to_numpy(dtype=np.int64))
                mats.append(np.stack(pdf["regs"].to_numpy()).astype(np.int8, copy=False))
        if not nodes_parts:
            return
        nodes = np.concatenate(nodes_parts)
        regs = np.vstack(mats)
        order = np.argsort(nodes, kind="stable")
        nodes = nodes[order]
        regs = regs[order]
        starts = np.flatnonzero(
            np.r_[True, nodes[1:] != nodes[:-1]]
        )
        merged = np.maximum.reduceat(regs, starts, axis=0)
        yield pd.DataFrame({"node": nodes[starts], "regs": list(merged)})

    schema = "node long, regs array<tinyint>"
    par = pairs.sparkSession.sparkContext.defaultParallelism
    partial = pairs.mapInPandas(seg_max, schema)
    # pinned numPartitions: AQE's size-based coalescing would fold the
    # small-but-CPU-dense register partials onto 1-2 tasks (measured —
    # that, plus the interpreted agg, was the whole g18 gate wall)
    return partial.repartition(par, "node").mapInPandas(seg_max, schema)


def hyperball(
    edges: DataFrame,
    rounds: int = 3,
    b: int = 9,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the per-node neighborhood
    function — |ball(v, r)| for r = 0..rounds — via mergeable HLL
    sketches instead of per-node visited sets. THE web-scale
    centrality algorithm: exact per-node balls need O(n) state per
    node (all-pairs BFS); HyperBall keeps 2^b registers per node and
    one register-wise MAX merge per round, so radius-r reach, and the
    harmonic centrality derived from it, costs r joins total at ANY
    graph size. Edges given symmetric, as for pagerank/kcore/LPA.

    Determinism: registers are integer (shared 60-bit hash, rho
    cascade, MAX merge — sketches.hll_registers), and each radius's
    estimate is the house HLL estimator rounded to an integer, so the
    result is partition- and engine-invariant; the oracle unrolls the
    same rounds from the same generated expressions. harmonic_micro =
    sum_r greatest(ball_r - ball_{r-1}, 0) * 1e6 div r — integer
    arithmetic over the integer estimates (clamped: nested sketches
    give monotone RAW estimates, but an estimator branch switch can
    dip a delta by an epsilon).

    Scale shape: registers are PACKED — one row per node carrying the
    full 2^b register vector as an array column (Boldi & Vigna's
    actual layout), so each round is ONE edges join on src whose
    fanout is |E| ROWS (array payloads ride along), not |E| x 2^b
    register rows, followed by a node-grain elementwise-MAX combine
    (2^b max aggregates — map-side combinable like any agg). Measured
    on the sf0.1 trade graph (1.2M edges, 16k nodes, saturated
    sketches): the sparse row layout generated ~600M combine inputs
    per round and ran 205 s; packed runs the identical math in 46 s
    (the 512-aggregate codegen costs ~10 s of fixed compile time, so
    tiny graphs pay a constant overhead the fanout savings dwarf at
    any real size).
    The register table is re-checkpointed per round (flat lineage),
    the edge table once. Estimates are per-node array expressions —
    no extra shuffle; the decimal register sum is order-free so
    packing cannot change a single estimate."""
    from .sketches import _alpha, hll_registers

    m = 2 ** b
    e = edges.select(
        F.col(src).cast("bigint").alias("src"),
        F.col(dst).cast("bigint").alias("dst"),
    ).localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).distinct()
    sparse = hll_registers(nodes.withColumn("v", F.col("node")), "v", ["node"], b)
    # registers live as TINYINT (rho caps at 20): the register vector
    # rides every edge row of every round's join, so its width IS the
    # per-round shuffle volume — 8-byte registers put the sf10 trade
    # graph (~110M symmetric edges) at ~0.4 TB of shuffle per round
    # and filled the disk; byte registers are ~7x smaller (true
    # HyperBall packs 6-bit registers tighter still — bit-packing into
    # longs is the next step if a corpus needs it).
    # Each node's ball(0) sketch holds exactly ONE hashed member (the
    # node id itself), so `sparse` is one (node, bucket, m_reg) row per
    # node and the dense vector is a PROJECTION — zeros, the register,
    # zeros — not an m-wide pivot aggregate (which executed interpreted
    # at 3-4 s; see _register_max_merge).
    z8 = F.lit(0).cast("tinyint")
    regs = (
        sparse.select(
            "node",
            F.concat(
                F.array_repeat(z8, F.col("bucket").cast("int")),
                F.array(F.col("m_reg").cast("tinyint")),
                F.array_repeat(
                    z8, F.lit(m - 1) - F.col("bucket").cast("int")
                ),
            ).alias("regs"),
        )
        .localCheckpoint(eager=True)
    )

    alpha_m2 = _alpha(m) * m * m
    present = F.filter("regs", lambda x: x > 0)
    z = (
        (F.lit(m) - F.size(present)).cast("decimal(38,21)")
        + F.aggregate(
            present,
            F.lit(0).cast("decimal(38,21)"),
            # the re-cast is lossless: register values cap at RHO_CAP=20,
            # and 2^-20 needs exactly 20 fractional digits — Spark types
            # the raw sum (38,20), which still holds every partial exactly
            lambda acc, x: (
                acc + F.pow(F.lit(2.0), -x).cast("decimal(38,21)")
            ).cast("decimal(38,21)"),
        )
    ).cast("double")
    v = F.lit(m) - F.size(present)
    raw = F.lit(alpha_m2) / z
    est_expr = F.round(
        F.when(
            (raw <= 2.5 * m) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v),
        ).otherwise(raw)
    ).cast("bigint")

    balls = regs.select("node", est_expr.alias("ball_r0"))
    for t in range(1, rounds + 1):
        contrib = e.join(
            regs.withColumnRenamed("node", "__s"), e.src == F.col("__s")
        ).select(F.col("dst").alias("node"), "regs")
        regs = _register_max_merge(
            contrib.unionByName(regs.select("node", "regs")), m
        ).localCheckpoint(eager=True)
        balls = balls.join(
            regs.select("node", est_expr.alias(f"ball_r{t}")), "node"
        )
    harmonic = None
    for t in range(1, rounds + 1):
        delta = F.greatest(
            F.col(f"ball_r{t}") - F.col(f"ball_r{t - 1}"), F.lit(0)
        )
        term = F.expr(f"__d{t} * 1000000 div {t}")
        balls = balls.withColumn(f"__d{t}", delta)
        harmonic = term if harmonic is None else harmonic + term
    return balls.select(
        "node",
        *[f"ball_r{r}" for r in range(rounds + 1)],
        harmonic.cast("bigint").alias("harmonic_micro"),
    )


def hyperball_oracle_ctes(rounds: int = 3, b: int = 9) -> str:
    """DuckDB CTE chain replaying hyperball (pagerank/LPA oracle
    pattern; register expressions generated by operators/sketches.py).
    Expects `edges(src, dst)`; emits `hbfinal(node, ball_r0..,
    harmonic_micro)`."""
    from .sketches import RHO_CAP, _rho_sql, hll_estimate_sql

    m = 2 ** b
    h = "CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15) AS BIGINT)"
    rho = _rho_sql(f"h // {m}", RHO_CAP)
    parts = [
        "hbnodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)",
        f"""hbr0 AS MATERIALIZED (
      SELECT node, h % {m} AS bucket, MAX({rho}) AS m_reg
      FROM (SELECT node, {h} AS h FROM hbnodes) GROUP BY node, bucket
    )""",
    ]
    for t in range(1, rounds + 1):
        parts.append(f"""hbr{t} AS MATERIALIZED (
      SELECT node, bucket, MAX(m_reg) AS m_reg FROM (
        SELECT e.dst AS node, r.bucket, r.m_reg
        FROM edges e JOIN hbr{t - 1} r ON e.src = r.node
        UNION ALL SELECT node, bucket, m_reg FROM hbr{t - 1}
      ) GROUP BY node, bucket
    )""")
    for t in range(rounds + 1):
        parts.append(
            f"hbe{t} AS ({hll_estimate_sql(f'hbr{t}', ['node'], b)})"
        )
    joins = " ".join(
        f"JOIN hbe{t} USING (node)" for t in range(1, rounds + 1)
    )
    balls = ", ".join(
        f"hbe{t}.est_distinct AS ball_r{t}" if t == 0
        else f"hbe{t}.est_distinct AS ball_r{t}"
        for t in range(rounds + 1)
    )
    harm = " + ".join(
        f"(GREATEST(hbe{t}.est_distinct - hbe{t - 1}.est_distinct, 0)"
        f" * 1000000 // {t})"
        for t in range(1, rounds + 1)
    )
    return ",\n    ".join(parts) + f""",
    hbfinal AS (
      SELECT node, {balls}, CAST({harm} AS BIGINT) AS harmonic_micro
      FROM hbe0 {joins}
    )"""
