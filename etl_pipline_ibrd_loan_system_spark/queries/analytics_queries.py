"""Analytics-surface widening (round 6): unpivot, ntile, filtered
aggregates, ratio-to-report, array higher-order functions, edit
distance.

Each query exercises a distinct engine capability a warehouse user
reaches for daily, expressed with the built-in JVM operators (zero
Python UDFs) and paired with a portable DuckDB oracle. Float outputs
follow the functions/exact.py discipline; divisions happen in double
space on decimal-exact numerators/denominators so both engines round
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import davg, dsum, sql_davg, sql_dsum
from . import query


@query(
    "e8_unpivot_part_metrics",
    sql=f"""
    WITH long AS (
      SELECT p_brand, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
      FROM part
      UNION ALL
      SELECT p_brand, 'retailprice' AS metric, p_retailprice AS value
      FROM part
    )
    SELECT p_brand, metric, COUNT(*) AS n, {sql_dsum('value', 'total')}
    FROM long GROUP BY p_brand, metric
    """,
)
def e8_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (melt): part's numeric measures become
    (metric, value) rows, then aggregate per brand+metric. Spark's
    native `unpivot` is a zero-shuffle projection (each input row emits
    k output rows in place) — the only shuffle is the final aggregate,
    identical to what the wide layout would need. The oracle replays it
    as the portable UNION ALL long-form."""
    part = load_table(spark, sf_dir, "part").select(
        "p_brand",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    long = part.unpivot(
        ids=["p_brand"],
        values=["size", "retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return long.groupBy("p_brand", "metric").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "total")
    )


@query(
    "e9_ntile_quartiles",
    sql="""
    SELECT event_type, quartile, COUNT(*) AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM (
      SELECT event_type, value,
             NTILE(4) OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS quartile
      FROM events
    )
    GROUP BY event_type, quartile
    """,
)
def e9_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles per event type with per-bucket extrema. The
    (value, event_id) order key is total, so bucket boundaries are
    engine-independent. One shuffle on event_type; each partition's
    window sorts locally — at 100 TB a heavily-skewed single type wants
    the e1b-style range-bucket two-pass instead, which is why this
    partitions by type rather than running one global NTILE."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@query(
    "d13_filtered_aggregates",
    sql=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(ROUND(SUM(
             CASE WHEN o_orderstatus = 'O'
                  THEN CAST(o_totalprice AS DECIMAL(18,4))
                  ELSE CAST(0 AS DECIMAL(18,4)) END
           ), 2) AS DOUBLE) AS open_total,
           {sql_davg('o_totalprice', 'avg_price')}
    FROM orders GROUP BY o_orderpriority
    """,
)
def d13_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: FILTER-clause counts and a
    status-gated decimal sum next to an unconditional average, one pass,
    one shuffle. Spark expresses the filters as count_if / sum(CASE)
    inside the same hash aggregate — no extra scan per condition (the
    anti-pattern is one groupBy per predicate unioned after)."""
    orders = load_table(spark, sf_dir, "orders")
    open_total = F.when(
        F.col("o_orderstatus") == "O",
        F.col("o_totalprice").cast("decimal(18,4)"),
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.round(F.sum(open_total), 2).cast("double").alias("open_total"),
        davg("o_totalprice", "avg_price"),
    )


@query(
    "m9_ratio_to_report",
    sql=f"""
    WITH nat AS (
      SELECT n_name, r_name,
             {sql_dsum('o_totalprice', 'nation_total')}
      FROM orders, customer, nation, region
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
      GROUP BY n_name, r_name
    )
    SELECT n_name, r_name, nation_total,
           ROUND(nation_total / SUM(nation_total) OVER (PARTITION BY r_name), 6)
             AS region_share
    FROM nat
    """,
)
def m9_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's order
    volume. Aggregate FIRST (nation grain — tiny), then the window
    runs over ~25 rows: the whole-partition SUM window never sees the
    fact table, which is the difference between a 25-row window and a
    100 TB one. Division happens in double on decimal-exact totals,
    rounded to 6 places, so both engines emit identical bits."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(dsum("o_totalprice", "nation_total"))
    )
    w = Window.partitionBy("r_name")
    return nat.withColumn(
        "region_share",
        F.round(F.col("nation_total") / F.sum("nation_total").over(w), 6),
    )


@query(
    "f10_embedding_component_stats",
    sql="""
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(AVG(CAST(n_pos AS DOUBLE)), 6) AS avg_n_positive,
           COUNT(DISTINCT argmax) AS n_distinct_argmax
    FROM (
      SELECT label,
             len(list_filter(embedding, x -> x > 0)) AS n_pos,
             list_position(embedding, list_max(embedding)) AS argmax
      FROM embeddings
    )
    GROUP BY label
    """,
)
def f10_embedding_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions on the embedding column, JVM-side:
    per-vector positive-component count (filter+size) and argmax
    position (array_position of array_max — exact float equality on
    identical stored bits, so both engines agree), aggregated per
    label. This is the no-Python path for vector feature extraction:
    whole-stage codegen over array<float>, no Arrow transfer, no UDF.
    avg over integer counts divides in double (exact: small ints)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_pos = F.size(F.filter("embedding", lambda x: x > 0))
    argmax = F.array_position(F.col("embedding"), F.array_max("embedding"))
    return (
        emb.select("label", n_pos.alias("n_pos"), argmax.alias("argmax"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(F.col("n_pos").cast("double")), 6).alias(
                "avg_n_positive"
            ),
            F.countDistinct("argmax").alias("n_distinct_argmax"),
        )
    )


@query(
    "tx14_edit_distance_neighbors",
    sql="""
    SELECT doc_id, next_id,
           levenshtein(substr(text, 1, 40), substr(next_text, 1, 40)) AS dist
    FROM (
      SELECT doc_id, text,
             LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS next_id,
             LEAD(text) OVER (PARTITION BY source ORDER BY doc_id) AS next_text
      FROM documents
    )
    WHERE next_id IS NOT NULL
    """,
)
def tx14_edit_distance_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance between source-adjacent documents: LEAD pairs each
    doc with its successor (per-source window — one shuffle, no self
    join), then JVM levenshtein on 40-char prefixes. The prefix cap
    bounds the O(m*n) DP per pair, the pairing bounds pair count to n-1
    per source — the two levers that keep edit distance feasible at
    corpus scale (full all-pairs Levenshtein is the textbook
    non-starter; candidate pairing belongs to the dedup family's
    banding, dd2-dd5)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    paired = docs.select(
        "doc_id",
        "text",
        F.lead("doc_id").over(w).alias("next_id"),
        F.lead("text").over(w).alias("next_text"),
    ).where(F.col("next_id").isNotNull())
    return paired.select(
        "doc_id",
        "next_id",
        F.levenshtein(
            F.substring("text", 1, 40), F.substring("next_text", 1, 40)
        ).alias("dist"),
    )


@query(
    "d14_stats_moments",
    sql="""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) *
                      CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) *
                      CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((sxy - (sx * sy) / n) / (n - 1), 4) AS covar_qty_price,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS corr_qty_price,
           ROUND(SQRT((sxx - (sx * sx) / n) / (n - 1)), 6) AS stddev_qty
    FROM sums
    """,
)
def d14_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (sample covariance, Pearson correlation,
    sample stddev) per return flag. The built-in corr/covar_samp
    aggregates sum doubles in partition order — order-dependent last-ulp
    drift that the hash gate would catch — so the moments are assembled
    from DECIMAL power sums (widths sized so DuckDB 1.0's product
    precision p1+p2 stays executable: (8,2) and (12,2) per factor) (exact, associative, mergeable: the same
    five sums a map-side combiner or an incremental rollup would keep)
    and the closed forms evaluate in double space with identical
    association on both engines; sqrt is correctly rounded in IEEE 754,
    so every output bit matches. Plan: one map-side-combined hash
    aggregate over the scan — the moment calculus is a projection on 3
    grouped rows. At 100 TB the state is 5 decimals x 3 groups."""
    li = load_table(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast("decimal(8,2)")
    dy = F.col("l_extendedprice").cast("decimal(12,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return sums.select(
        "l_returnflag",
        "n",
        F.round((sxy - (sx * sy) / n) / (n - 1), 4).alias("covar_qty_price"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        F.round(F.sqrt((sxx - (sx * sx) / n) / (n - 1)), 6).alias("stddev_qty"),
    )


@query(
    "e10_funnel_stages",
    sql="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
      COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
        AS n_view_click,
      COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                         AND t_purchase > t_click) AS n_full_funnel
    FROM stages
    """,
)
def e10_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: users who progressed view -> click ->
    purchase IN THAT ORDER, via per-user first-occurrence timestamps
    (one conditional-MIN aggregate — no sequence window, no self-join:
    the strictly-increasing-first-timestamp criterion is equivalent to
    'an ordered traversal exists' for first-touch funnels). Two
    aggregates total: user-grain (map-side combined on user_id) then a
    3-counter global fold. At 100 TB the only shuffle keys on
    user_id."""
    ev = load_table(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return stages.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(
            F.when(
                F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_view_click"),
        F.count(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@query(
    "m10_cohort_retention",
    sql="""
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, date_trunc('day', e.ts))
               AS days_since
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_day, CAST(days_since AS INTEGER) AS days_since,
           COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_day, days_since
    """,
)
def m10_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity DAY
    (the events table spans one month, so day grain gives the matrix
    its depth; a year-spanning deployment flips the truncation to
    month — same plan), counted on each subsequent day they were
    active. The first-seen aggregate is user-grain (map-side combined);
    the cohort map joins back on user_id — the SAME partitioning the
    first aggregate produced, so at scale the join is shuffle-free —
    and the day distinct+count is combined on the (cohort, day) pair.
    days_since is exact calendar arithmetic on truncated days,
    identical in both engines."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day"))
            .cast("int")
            .alias("days_since"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "days_since").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


from ..operators import graph as _graph  # noqa: E402


@query(
    "g3_pagerank_trade_graph",
    sql=f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders, lineitem WHERE o_orderkey = l_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    {_graph.pagerank_oracle_ctes(iters=3)}
    SELECT node, rank_units FROM prfinal
    """,
)
def g3_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 damped iterations) over the symmetric
    customer<->supplier trade graph derived from orders |x| lineitem.
    All rank arithmetic is 64-bit integer (1e12 fixed-point units), so
    the distributed result is bit-identical regardless of partitioning
    or reduction order — which is also what lets a DuckDB oracle replay
    the iterations verbatim (pagerank_oracle_ctes generates the CTE
    chain from the same constants as the Spark loop). Supplier node ids
    are offset by 1e6 to disambiguate the bipartite sides."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return _graph.pagerank_fixed_point(edges, iters=3)


@query(
    "g5_bfs_hops",
    sql="""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders, lineitem WHERE o_orderkey = l_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    d0 AS (SELECT DISTINCT s_suppkey + 1000000 AS node, 0 AS dist
           FROM supplier WHERE s_nationkey < 5),
    f1 AS (SELECT DISTINCT e.dst AS node FROM edges e
           JOIN d0 ON e.src = d0.node
           WHERE e.dst NOT IN (SELECT node FROM d0)),
    k1 AS (SELECT * FROM d0 UNION ALL SELECT node, 1 FROM f1),
    f2 AS (SELECT DISTINCT e.dst AS node FROM edges e
           JOIN f1 ON e.src = f1.node
           WHERE e.dst NOT IN (SELECT node FROM k1)),
    k2 AS (SELECT * FROM k1 UNION ALL SELECT node, 2 FROM f2),
    f3 AS (SELECT DISTINCT e.dst AS node FROM edges e
           JOIN f2 ON e.src = f2.node
           WHERE e.dst NOT IN (SELECT node FROM k2)),
    k3 AS (SELECT * FROM k2 UNION ALL SELECT node, 3 FROM f3)
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS INTEGER) AS dist
    FROM k3
    """,
)
def g5_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth multi-source BFS (reachability radius 3) over the
    symmetric customer<->supplier trade graph, seeded at the
    suppliers of nations 0-4: each node gets its MINIMUM hop distance, assigned
    exactly once via frontier expansion + visited anti-join
    (operators/graph.bfs_hops — Pregel frontier pattern, per-round
    localCheckpoint so lineage stays flat). The oracle unrolls the
    identical three rounds as CTEs."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") < 5)
        .select((F.col("s_suppkey") + 1000000).alias("node"))
    )
    out = _graph.bfs_hops(edges, seeds, max_depth=3)
    return out.select(F.col("node"), F.col("dist").cast("int").alias("dist"))


@query(
    "m11_rfm_segments",
    sql="""
    WITH base AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT quantile_cont(recency_days, 0.5) AS r50,
             quantile_cont(frequency, 0.5) AS f50,
             quantile_cont(monetary, 0.5) AS m50
      FROM base
    )
    SELECT custkey, recency_days, frequency, monetary,
           CASE WHEN recency_days <= r50 THEN 2 ELSE 1 END AS r_score,
           CASE WHEN frequency > f50 THEN 2 ELSE 1 END AS f_score,
           CASE WHEN monetary > m50 THEN 2 ELSE 1 END AS m_score,
           CASE
             WHEN recency_days <= r50 AND frequency > f50
                  AND monetary > m50 THEN 'champion'
             WHEN recency_days <= r50 THEN 'recent'
             WHEN frequency > f50 OR monetary > m50 THEN 'at_risk_valuable'
             ELSE 'hibernating'
           END AS segment
    FROM base, cuts
    """,
)
def m11_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation, scale-shaped: recency (days since
    last order, anchored at the corpus max date so the result is
    deterministic), frequency, and decimal-exact monetary roll up in
    ONE custkey aggregate; the split points are exact median statistics
    (Spark `percentile` == DuckDB `quantile_cont`, the d9 parity pair)
    computed in a one-row aggregate and BROADCAST back — never an
    ntile/row_number window, which would funnel every customer through
    one task at 100 TB. Scores and the segment label are then pure
    projections."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("__anchor"))
    base = (
        orders.join(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.max("__anchor"), F.max("o_orderdate")).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    from ..cache import pin

    base = pin(base)
    cuts = base.agg(
        F.expr("percentile(recency_days, 0.5)").alias("r50"),
        F.expr("percentile(frequency, 0.5)").alias("f50"),
        F.expr("percentile(monetary, 0.5)").alias("m50"),
    )
    r, f_, m = F.col("recency_days"), F.col("frequency"), F.col("monetary")
    recent = r <= F.col("r50")
    freq = f_ > F.col("f50")
    val = m > F.col("m50")
    return base.join(F.broadcast(cuts)).select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.when(recent, 2).otherwise(1).alias("r_score"),
        F.when(freq, 2).otherwise(1).alias("f_score"),
        F.when(val, 2).otherwise(1).alias("m_score"),
        F.when(recent & freq & val, "champion")
        .when(recent, "recent")
        .when(freq | val, "at_risk_valuable")
        .otherwise("hibernating")
        .alias("segment"),
    )


@query(
    "d15_cube",
    sql=f"""
    SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(GROUPING(o_orderstatus, year(o_orderdate)) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "sum_price")}
    FROM orders
    GROUP BY CUBE(o_orderstatus, year(o_orderdate))
    """,
)
def d15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: every grouping-set combination of (status, order year) —
    detail, both one-dimension margins, and the grand total — in ONE
    Expand + hash aggregate (4 grouping sets × input rows map-side, one
    shuffle of partials). Completes the grouping family next to m8
    (ROLLUP) and d12 (explicit GROUPING SETS); same leftmost-is-MSB
    grouping_id() bitmask on both engines. At 100 TB the Expand
    multiplies map output ×4 but the shuffle still carries only
    aggregated partials per grouping set — never 4 scans."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .cube("o_orderstatus", "order_year")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
        .select("o_orderstatus", "order_year", "gid", "n_orders", "sum_price")
    )


_BASKET_MIN_SUPPORT = 3


@query(
    "m12_market_basket",
    sql=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), freq AS (
      SELECT l_partkey FROM items
      GROUP BY l_partkey HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
    ), pruned AS (
      SELECT i.l_orderkey, i.l_partkey FROM items i
      JOIN freq USING (l_partkey)
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders_together
    FROM pruned a JOIN pruned b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
    """,
)
def m12_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs (market-basket co-occurrence) with a-priori
    pruning: a pair can only reach min support if BOTH items do, so item
    frequencies are counted first (one partial-aggregated shuffle over
    the ~|parts| key space) and infrequent items leave the pipeline
    BEFORE the order-keyed self-join — at 100 TB this is the difference
    between joining the long tail of one-off items (quadratic in basket
    width) and joining only the frequent-item sublattice. The self-join
    shuffles once on orderkey (both sides co-partitioned, a single
    exchange each), pair fan-out is bounded by the pruned basket width,
    and `part_a < part_b` canonicalizes pairs so each is counted once.
    Same shape as the FP-growth/Apriori candidate-generation step of a
    recommendation pipeline."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    from ..cache import pin

    items = pin(items)
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("__supp"))
        .filter(F.col("__supp") >= _BASKET_MIN_SUPPORT)
        .select("l_partkey")
    )
    pruned = items.join(F.broadcast(freq), "l_partkey").select(
        "l_orderkey", "l_partkey"
    )
    a = pruned.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = pruned.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .filter(F.col("n_orders_together") >= _BASKET_MIN_SUPPORT)
    )


@query(
    "m13_pareto_share",
    sql="""
    WITH rev AS (
      SELECT o_custkey AS custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS revenue
      FROM orders GROUP BY o_custkey
    ), tot AS (
      SELECT SUM(revenue) AS total FROM rev
    ), run AS (
      SELECT custkey, revenue,
             CAST(row_number() OVER (
               ORDER BY revenue DESC, custkey
             ) AS BIGINT) AS rank,
             SUM(revenue) OVER (
               ORDER BY revenue DESC, custkey
               ROWS UNBOUNDED PRECEDING
             ) AS running
      FROM rev
    )
    SELECT custkey, CAST(revenue AS DOUBLE) AS revenue, rank,
           CAST(running AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
           CAST(running AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8
             OR CAST(running - revenue AS DOUBLE) / CAST(total AS DOUBLE) < 0.8
             AS in_top80
    FROM run, tot
    """,
)
def m13_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) analysis: customers ranked by revenue with the
    running cumulative revenue share; `in_top80` marks the minimal
    prefix covering 80% of revenue (a customer is in if the share
    BEFORE adding them is still under 0.8). The cumulative sum runs in
    exact decimal space and divides once into double, so both engines
    round identically. The global window runs at CUSTOMER grain — three
    to four orders of magnitude below the fact table after the keyed
    aggregate — and ROWS UNBOUNDED PRECEDING with a total (revenue,
    custkey) order keeps it deterministic; at 100 TB the same two-pass
    range-bucket decomposition as e1b/dd11 replaces the single-task
    window (per-bucket local cumsum + broadcast bucket offsets), which
    this grain does not yet need."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("revenue")
    )
    from ..cache import pin

    rev = pin(rev)
    tot = rev.agg(F.sum("revenue").alias("total"))
    w = Window.orderBy(F.desc("revenue"), "custkey")
    run = rev.select(
        "custkey",
        "revenue",
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.sum("revenue")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("running"),
    )
    share = F.col("running").cast("double") / F.col("total").cast("double")
    prev_share = (F.col("running") - F.col("revenue")).cast("double") / F.col(
        "total"
    ).cast("double")
    return run.join(F.broadcast(tot)).select(
        "custkey",
        F.col("revenue").cast("double").alias("revenue"),
        "rank",
        share.alias("cum_share"),
        ((share <= 0.8) | (prev_share < 0.8)).alias("in_top80"),
    )


from ..operators import zorder  # noqa: E402


@query(
    "zo1_zorder_layout",
    sql=zorder.zorder_layout_oracle_sql(
        "events", "user_id", "(epoch_us(ts) // 1000000)"
    ),
)
def zo1_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-key layout statistics for events clustered on
    (user_id, event second): rows bucketed by the top 8 bits of the
    32-bit interleaved key, with each bucket's min/max in BOTH
    dimensions — the rectangles a Z-ordered file layout would pin to
    files, i.e. the scan-pruning guarantee for two-filter workloads
    that 1-D range clustering cannot give. Keys are integer-exact and
    bit-replayed by the oracle (operators/zorder.py)."""
    ev = load_table(spark, sf_dir, "events")
    return zorder.zorder_layout(
        ev, "user_id", "CAST(CAST(ts AS TIMESTAMP) AS BIGINT)"
    )


@query(
    "e17_mad_robust_stats",
    sql="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
      FROM events e JOIN med m USING (event_type)
    )
    SELECT event_type, COUNT(*) AS n,
           MIN(med) AS median,
           quantile_cont(adev, 0.5) AS mad
    FROM dev GROUP BY event_type
    """,
)
def e17_mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median absolute deviation per event type — the robust
    dispersion statistic outlier screens should prefer over stddev
    (dq3's z-score is moment-based; MAD survives the very outliers it
    hunts). Two passes by construction (the deviation needs the median
    first): pass one reduces to |types| medians (Spark `percentile` ==
    DuckDB `quantile_cont`, the d9 parity pair) and broadcasts them
    back; pass two aggregates |x - med| with the same exact-percentile
    machinery. Nothing between the two scans materializes more than the
    group-key cardinality."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    return dev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("med").alias("median"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
    )


def _g6_oracle() -> str:
    """Unrolled Bellman-Ford CTEs: d{k+1}(v) = min(d{k}(v), min over
    edges (u,v,w) of d{k}(u) + w)."""
    rounds = []
    prev = "d0"
    for k in (1, 2, 3):
        rounds.append(
            f"d{k} AS (SELECT node, MIN(dist) AS dist FROM ("
            f"SELECT node, dist FROM {prev} UNION ALL "
            f"SELECT e.dst AS node, {prev}.dist + e.w AS dist "
            f"FROM edges e JOIN {prev} ON e.src = {prev}.node"
            f") GROUP BY node)"
        )
        prev = f"d{k}"
    return f"""
    WITH pair AS (
      SELECT o_custkey AS cust, l_suppkey AS supp, COUNT(DISTINCT o_orderkey) AS n
      FROM orders, lineitem WHERE o_orderkey = l_orderkey
      GROUP BY o_custkey, l_suppkey
    ), e0 AS (
      SELECT cust AS src, supp + 1000000 AS dst,
             1 + greatest(0, 5 - n) AS w
      FROM pair
    ),
    edges AS (SELECT src, dst, w FROM e0 UNION ALL SELECT dst, src, w FROM e0),
    d0 AS (SELECT DISTINCT s_suppkey + 1000000 AS node, 0 AS dist
           FROM supplier WHERE s_nationkey < 5),
    {", ".join(rounds)}
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
    FROM d3
    """


@query("g6_weighted_shortest_path", sql=_g6_oracle())
def g6_weighted_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round weighted shortest paths (Bellman-Ford, 3
    relaxations) over the symmetric trade graph, seeded at the nation
    0-4 suppliers — the weighted completion of g5's BFS: edge cost is
    the integer 1 + max(0, 5 - n_orders) (strong trading pairs are
    cheap links), so a node's cost can IMPROVE after first discovery
    and the min fold, not a visited set, carries the semantics. All
    arithmetic integer-exact (operators/graph.bellman_ford); the
    oracle unrolls the identical three relaxation rounds."""
    from ..operators.graph import bellman_ford

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    pair = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .agg(F.count_distinct("o_orderkey").alias("n"))
    )
    e0 = pair.select(
        F.col("cust").alias("src"),
        (F.col("supp") + 1000000).alias("dst"),
        (F.lit(1) + F.greatest(F.lit(0), F.lit(5) - F.col("n"))).alias("w"),
    )
    edges = e0.unionByName(
        e0.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    seeds = (
        supplier.where(F.col("s_nationkey") < 5)
        .select((F.col("s_suppkey") + 1000000).alias("node"))
    )
    # edges partitioned on src ONCE and cache-pinned: each relaxation
    # round reuses the layout instead of re-shuffling the static edge
    # table (the 2.8x-per-decade fix from the round-6 sf1 sweep)
    return bellman_ford(edges, seeds, rounds=3, edge_partitions=32)


@query(
    "m14_yoy_growth",
    sql="""
    WITH yearly AS (
      SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY n_name, year(o_orderdate)
    )
    SELECT n_name, yr,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND(CAST(rev - lag(rev) OVER w AS DOUBLE)
                 / CAST(lag(rev) OVER w AS DOUBLE), 6) AS yoy_growth
    FROM yearly
    WINDOW w AS (PARTITION BY n_name ORDER BY yr)
    """,
)
def m14_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the period-over-period
    BI measure: aggregate FIRST to (nation, year) grain (decimal-exact
    sums), then the lag window runs over ~25 nations x a handful of
    years, never the fact table. The growth ratio subtracts and divides
    in double on the exact decimal totals, rounded to 6 places; the
    first year of each nation is NULL by lag semantics on both engines
    (nullable double — fine for the canonicalizer, unlike nullable
    timestamps, see selfcheck.normalize)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("int").alias("yr")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("rev").over(w)
    return yearly.select(
        "n_name",
        "yr",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            (F.col("rev") - prev).cast("double") / prev.cast("double"), 6
        ).alias("yoy_growth"),
    )


# --- round-6 seventh wave: feature-engineering encoders -----------------


@query(
    "fv2_target_encode",
    sql="""
    WITH total AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS gsum,
             COUNT(*)::BIGINT AS gcnt
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cat AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS cat_sum,
             COUNT(*)::BIGINT AS cat_cnt
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, cat_cnt,
           (cat_cnt * 1000000) // gcnt AS freq_ppm,
           ROUND((cat_sum + 100.0 * (gsum / gcnt))
                 / (cat_cnt + 100.0), 4) AS target_enc
    FROM cat, total
    """,
)
def fv2_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of a categorical feature (market
    segment -> mean order value, shrunk toward the global mean with
    pseudo-count m=100): the standard leak-resistant categorical
    encoder for tabular ML. Plan shape at 100 TB: the fact joins the
    broadcast customer key projection once, ONE combinable aggregate
    produces category grain (5 rows), the 1-row global stats cross-join
    onto it — nothing after the aggregate exceeds category cardinality.
    Exactness: sums fold in decimal; the shrinkage formula is evaluated
    in double with an identical operation tree on both engines;
    frequency is integer ppm (floor division)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    cat = joined.groupBy("c_mktsegment").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("cat_sum"),
        F.count(F.lit(1)).alias("cat_cnt"),
    )
    total = joined.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("gsum"),
        F.count(F.lit(1)).alias("gcnt"),
    )
    return cat.crossJoin(F.broadcast(total)).select(
        "c_mktsegment",
        "cat_cnt",
        F.expr("cat_cnt * 1000000 DIV gcnt").alias("freq_ppm"),
        F.round(
            (F.col("cat_sum") + 100.0 * (F.col("gsum") / F.col("gcnt")))
            / (F.col("cat_cnt") + 100.0),
            4,
        ).alias("target_enc"),
    )


@query(
    "fv3_vector_scale",
    sql="""
    WITH ex AS (
      SELECT vec_id, i.i AS dim, embedding[i.i]::DOUBLE AS x
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i
    ), st AS (
      SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY dim
    )
    SELECT vec_id, ex.dim::BIGINT AS dim,
           CASE WHEN mx = mn THEN 0
                ELSE CAST(FLOOR((x - mn) / (mx - mn) * 1000000) AS BIGINT)
           END AS scaled_ppm
    FROM ex JOIN st ON ex.dim = st.dim
    """,
)
def fv3_vector_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension min-max scaling of the embedding corpus (the
    feature-store normalization pass before quantization or indexing),
    emitted as (vec_id, dim, scaled_ppm) scalars per rp1's convention.
    Plan shape: posexplode is narrow; the stats aggregate map-side
    combines to 64 rows per partition before one tiny shuffle; the
    stats broadcast back onto the exploded scan — the corpus itself
    never shuffles. Exactness: min/max over doubles are order-free,
    the rescale is one fixed IEEE expression tree on both engines, and
    FLOOR squashes the result to integer ppm (Spark's double->bigint
    cast truncates while DuckDB's rounds, so the explicit FLOOR is the
    cross-engine contract)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "xf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    st = ex.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    joined = ex.join(F.broadcast(st), "dim")
    scaled = F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint")).otherwise(
        F.floor((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 1000000)
    )
    return joined.select(
        "vec_id",
        F.col("dim").cast("bigint").alias("dim"),
        scaled.alias("scaled_ppm"),
    )


@query(
    "m15_market_concentration",
    sql="""
    WITH rev AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(8,4)))
                  AS DECIMAL(15,4)) AS r
      FROM lineitem GROUP BY year(l_shipdate), l_suppkey
    )
    SELECT yr, COUNT(*) AS n_suppliers,
           ROUND(CAST(SUM(CAST(r AS DECIMAL(19,4)) * r) AS DOUBLE)
                 / (CAST(SUM(r) AS DOUBLE) * CAST(SUM(r) AS DOUBLE)), 9)
             AS hhi,
           ROUND(CAST(MAX(r) AS DOUBLE) / CAST(SUM(r) AS DOUBLE), 9)
             AS top_share
    FROM rev GROUP BY yr
    """,
)
def m15_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per shipment
    year. The textbook formula squares per-supplier SHARES — a division
    before a float sum, which is cross-engine-inexact. The identity
    HHI = sum(r^2) / (sum r)^2 moves every reduction into exact decimal
    space (revenue and squared-revenue sums are associative decimals)
    and leaves ONE correctly-rounded double division per group, so both
    engines agree bit-for-bit. Two map-side-combinable aggregates —
    (year, supplier) grain then year grain — no window, no join; at
    100 TB the shuffle carries one decimal triple per supplier-year.
    r is bounded to DECIMAL(15,4) (1e11 per supplier-year) so r*r stays
    inside DECIMAL(38,*) on both engines; the oracle additionally casts
    one operand to DECIMAL(19,4) because DuckDB keeps width<=18
    multiplies in int64 and overflows before consulting the result
    type."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy(
            F.year("l_shipdate").cast("bigint").alias("yr"), "l_suppkey"
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
            )
            .cast("decimal(15,4)")
            .alias("r")
        )
    )
    sum_r = F.sum("r").cast("double")
    return rev.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(
            F.sum(F.col("r") * F.col("r")).cast("double") / (sum_r * sum_r), 9
        ).alias("hhi"),
        F.round(F.max("r").cast("double") / sum_r, 9).alias("top_share"),
    )


@query(
    "g10_degree_assortativity",
    sql="""
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
      SELECT src, dst FROM e0
      UNION ALL
      SELECT dst AS src, src AS dst FROM e0
    ), deg AS (
      SELECT src AS node, COUNT(*)::BIGINT AS d FROM edges GROUP BY 1
    ), pairs AS (
      SELECT du.d AS dx, dv.d AS dy
      FROM edges e
      JOIN deg du ON du.node = e.src
      JOIN deg dv ON dv.node = e.dst
    ), mom AS (
      SELECT COUNT(*)::BIGINT AS n,
             SUM(CAST(dx AS DECIMAL(18,0))) AS sx,
             SUM(CAST(dy AS DECIMAL(18,0))) AS sy,
             SUM(CAST(dx AS DECIMAL(18,0)) * CAST(dx AS DECIMAL(18,0))) AS sxx,
             SUM(CAST(dy AS DECIMAL(18,0)) * CAST(dy AS DECIMAL(18,0))) AS syy,
             SUM(CAST(dx AS DECIMAL(18,0)) * CAST(dy AS DECIMAL(18,0))) AS sxy
      FROM pairs
    )
    SELECT n,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS assortativity
    FROM mom
    """,
)
def g10_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the symmetric customer<->supplier trade
    graph (Newman 2002): the Pearson correlation of endpoint degrees
    over the directed edge list — positive means hubs trade with hubs.
    Completes the graph-stats family next to g3 (PageRank), g4
    (triangles) and dd8's components.

    Exactness: degrees are exact bigint counts; the five moment sums
    accumulate in decimal space (order-free); the Pearson assembles in
    the same fixed double tree as e23, with the identical zero-variance
    CASE guard. Scale: two equi-joins of the edge list against the
    node-sized degree table (key-partitioned, no fan-out — deg is one
    row per node), then ONE map-side-combined global moment aggregate;
    nothing is ever quadratic in nodes or edges."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    du = deg.select(F.col("node").alias("src"), F.col("d").alias("dx"))
    dv = deg.select(F.col("node").alias("dst"), F.col("d").alias("dy"))
    pairs = edges.join(du, "src").join(dv, "dst")
    dec = "decimal(18,0)"
    dx, dy = F.col("dx").cast(dec), F.col("dy").cast(dec)
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
        F.sum(dx * dy).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    r = F.when(
        (var_x > 0) & (var_y > 0),
        (nd * sxy - sx * sy) / (F.sqrt(var_x) * F.sqrt(var_y)),
    )
    return mom.select("n", r.alias("assortativity"))


@query(
    "cf1_cosupplier_similarity",
    sql="""
    WITH links AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), deg AS (
      SELECT supp, COUNT(*)::BIGINT AS n_cust FROM links GROUP BY supp
    ), pairs AS (
      SELECT a.supp AS supp_a, b.supp AS supp_b,
             COUNT(*)::BIGINT AS n_shared
      FROM links a JOIN links b
        ON a.cust = b.cust AND a.supp < b.supp
      GROUP BY 1, 2
    ), scored AS (
      SELECT supp_a, supp_b, n_shared, da.n_cust AS cust_a,
             db.n_cust AS cust_b,
             CAST(n_shared AS DOUBLE)
               / sqrt(CAST(da.n_cust * db.n_cust AS DOUBLE)) AS cosine
      FROM pairs
      JOIN deg da ON da.supp = pairs.supp_a
      JOIN deg db ON db.supp = pairs.supp_b
      WHERE n_shared >= 3
    ), ranked AS (
      SELECT *, row_number() OVER (
               ORDER BY cosine DESC, supp_a, supp_b) AS rank
      FROM scored
    )
    SELECT supp_a, supp_b, n_shared, cust_a, cust_b, cosine,
           rank::INT AS rank
    FROM ranked WHERE rank <= 20
    """,
)
def cf1_cosupplier_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarity: suppliers as
    items, customers as baskets, cosine over shared-customer counts —
    the 'suppliers like this one' primitive (Sarwar et al. 2001's
    item-item CF on implicit feedback), distinct from m12's association
    rules (which rank directional confidence) and dd6's embedding
    cosine (which needs vectors to exist). Top-20 pairs with min
    support 3.

    Exactness: co-occurrence and degrees are exact bigints; the cosine
    is one double division by one sqrt of an int64 product — fixed
    tree; rank ties break on the id pair. Scale: the pair self-join
    fans out per CUSTOMER (degree-bounded baskets, the g4 lines-
    per-order argument — never per supplier), the support filter cuts
    the long tail before the degree joins, and the global top-20
    compiles to TakeOrderedAndProject."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    links = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
    )
    deg = links.groupBy("supp").agg(F.count(F.lit(1)).alias("n_cust"))
    a = links.select("cust", F.col("supp").alias("supp_a"))
    b = links.select(F.col("cust").alias("cust_b"), F.col("supp").alias("supp_b"))
    pairs = (
        a.join(b, (a.cust == b.cust_b) & (F.col("supp_a") < F.col("supp_b")))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )
    da = deg.select(F.col("supp").alias("supp_a"), F.col("n_cust").alias("cust_a"))
    db = deg.select(F.col("supp").alias("supp_b"), F.col("n_cust").alias("cust_b"))
    scored = pairs.join(da, "supp_a").join(db, "supp_b").select(
        "supp_a", "supp_b", "n_shared", "cust_a", "cust_b",
        (
            F.col("n_shared").cast("double")
            / F.sqrt((F.col("cust_a") * F.col("cust_b")).cast("double"))
        ).alias("cosine"),
    )
    # TakeOrderedAndProject for the cut (bounded per-partition heaps);
    # the rank window then runs on 20 rows only — the sp9 pattern
    top = scored.orderBy(F.desc("cosine"), "supp_a", "supp_b").limit(20)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("cosine"), "supp_a", "supp_b")
        ).cast("int"),
    )
    return ranked.select(
        "supp_a", "supp_b", "n_shared", "cust_a", "cust_b", "cosine", "rank"
    )


@query(
    "g12_neighborhood_features",
    sql="""
    WITH hi AS (
      SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 45
    ), e0 AS (
      SELECT DISTINCT CAST(a.l_suppkey AS BIGINT) AS u,
                      CAST(b.l_suppkey AS BIGINT) AS v
      FROM hi a JOIN hi b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ), edges AS (
      SELECT u AS src, v AS dst FROM e0
      UNION ALL SELECT v, u FROM e0
    ), feat AS (
      SELECT CAST(s_suppkey AS BIGINT) AS node,
             CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM supplier
    ), hop1 AS (
      SELECT e.src AS node, SUM(f.cents)::BIGINT AS s1,
             COUNT(*)::BIGINT AS c1
      FROM edges e JOIN feat f ON f.node = e.dst
      GROUP BY e.src
    ), hop2 AS (
      SELECT e.src AS node, SUM(h.s1)::BIGINT AS s2,
             SUM(h.c1)::BIGINT AS c2
      FROM edges e JOIN hop1 h ON h.node = e.dst
      GROUP BY e.src
    )
    SELECT node, c2 AS walk2_count,
           CAST(s2 AS DOUBLE) / CAST(c2 * 100 AS DOUBLE)
             AS mean_2hop_acctbal
    FROM hop2
    """,
)
def g12_neighborhood_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighborhood feature aggregation over the co-supply graph
    — GNN-style message passing as two rounds of join+aggregate: each
    supplier's mean account balance over all 2-hop WALK endpoints
    (multiset semantics, back-steps included — exactly the quantity a
    mean-aggregator GCN layer stack computes). The graph-feature-
    engineering primitive for tabular models and GNN data prep.

    Exactness: a mean of hop-1 MEANS would sum doubles (order-
    dependent); instead both hops carry exact int64 (cents_sum, count)
    pairs and the single division happens once at the end — the m15
    sum-of-squares lesson applied to message passing. Scale: each round
    is one equi-join of the edge list against a node-sized table plus a
    map-side-combinable aggregate — the Pregel superstep shape; K hops
    = K such rounds, state never exceeds one row per node."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    a = li.select("l_orderkey", F.col("l_suppkey").alias("sa"))
    b = li.select("l_orderkey", F.col("l_suppkey").alias("sb"))
    e0 = (
        a.join(b, "l_orderkey")
        .where(F.col("sa") < F.col("sb"))
        .select(
            F.col("sa").cast("bigint").alias("src"),
            F.col("sb").cast("bigint").alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    feat = sup.select(
        F.col("s_suppkey").cast("bigint").alias("node"),
        (F.col("s_acctbal").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    hop1 = (
        edges.join(feat, edges.dst == feat.node)
        .groupBy("src")
        .agg(F.sum("cents").alias("s1"), F.count(F.lit(1)).alias("c1"))
        .select(F.col("src").alias("node"), "s1", "c1")
    )
    hop2 = (
        edges.join(hop1, edges.dst == hop1.node)
        .groupBy("src")
        .agg(F.sum("s1").alias("s2"), F.sum("c1").alias("c2"))
        .select(F.col("src").alias("node"), "s2", "c2")
    )
    return hop2.select(
        "node",
        F.col("c2").alias("walk2_count"),
        (
            F.col("s2").cast("double")
            / (F.col("c2") * 100).cast("double")
        ).alias("mean_2hop_acctbal"),
    )


@query(
    "m16_gini_concentration",
    sql="""
    WITH rev AS (
      SELECT c.c_nationkey AS nation, o.o_custkey,
             SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                      AS BIGINT))::BIGINT AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT nation, cents,
             ROW_NUMBER() OVER (
               PARTITION BY nation ORDER BY cents, o_custkey
             )::BIGINT AS i
      FROM rev
    )
    SELECT nation,
           COUNT(*)::BIGINT AS n_customers,
           SUM(cents)::BIGINT AS total_cents,
           2.0 * CAST(SUM(i * cents) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
             - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE)
             AS gini
    FROM ranked GROUP BY nation
    """,
)
def m16_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration per nation —
    the Lorenz-curve inequality measure that complements m15's HHI
    (HHI weighs the top; Gini describes the whole distribution) and
    m13's Pareto share (a single point on the same curve). Computed
    via the rank identity G = 2*Sum(i*x_i)/(n*Sum(x)) - (n+1)/n.

    Exactness: revenue in int64 cents, rank x value products summed in
    exact integer space (order under ties is irrelevant to the sum but
    pinned by custkey anyway), then ONE fixed double expression — two
    divisions and a subtraction — identical on both engines.

    Scale: the per-customer rollup is map-side combinable; the rank
    window partitions by nation (bounded by customers-per-nation, and a
    skewed nation takes the mx2b sub-bucket + offset pattern); the
    final reduction is one aggregate at nation grain."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nation"), F.col("o_custkey")
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "bigint"
                )
            ).alias("cents")
        )
    )
    w = Window.partitionBy("nation").orderBy("cents", "o_custkey")
    ranked = rev.select(
        "nation", "cents", F.row_number().over(w).cast("bigint").alias("i")
    )
    n = F.count(F.lit(1))
    s = F.sum("cents")
    a = F.sum(F.col("i") * F.col("cents"))
    gini = (
        F.lit(2.0) * a.cast("double") / (n.cast("double") * s.cast("double"))
        - (n.cast("double") + F.lit(1.0)) / n.cast("double")
    )
    return ranked.groupBy("nation").agg(
        n.alias("n_customers"),
        s.cast("bigint").alias("total_cents"),
        gini.alias("gini"),
    )


@query(
    "m17_ratio_to_parent",
    sql="""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                      AS BIGINT))::BIGINT AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    ), reg AS (
      SELECT region, SUM(cents)::BIGINT AS cents FROM nat GROUP BY 1
    ), tot AS (
      SELECT SUM(cents)::BIGINT AS cents FROM reg
    )
    SELECT 'nation' AS level, region, nation, n.cents,
           CAST(n.cents AS DOUBLE) / CAST(r.cents AS DOUBLE)
             AS share_of_parent
    FROM nat n JOIN reg r USING (region)
    UNION ALL
    SELECT 'region', region, NULL, r.cents,
           CAST(r.cents AS DOUBLE) / CAST(t.cents AS DOUBLE)
    FROM reg r, tot t
    """,
)
def m17_ratio_to_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent down the geographic hierarchy: each nation's
    revenue share OF ITS REGION and each region's share of the total —
    the drill-down companion to m9's flat ratio-to-report (share of
    grand total only). The hierarchical normalization every BI
    drill-path needs, and the mixture-weight computation a corpus
    curator runs over source -> domain hierarchies.

    Exactness: one decimal-cents rollup at nation grain feeds
    everything (parents are re-aggregations of the SAME int64 sums —
    consistent by construction, no re-scan drift); each share is one
    double division. Scale: the fact aggregates once at the finest
    grain; parents aggregate the nation-grain table (25 rows); shares
    attach via broadcast joins."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    nat = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                nation.select("n_nationkey", "n_name", "n_regionkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(cents).alias("cents"))
    )
    reg = nat.groupBy("region").agg(F.sum("cents").alias("r_cents"))
    tot = reg.agg(F.sum("r_cents").alias("t_cents"))
    nation_rows = nat.join(F.broadcast(reg), "region").select(
        F.lit("nation").alias("level"),
        "region",
        "nation",
        F.col("cents").cast("bigint").alias("cents"),
        (F.col("cents").cast("double") / F.col("r_cents").cast("double"))
        .alias("share_of_parent"),
    )
    region_rows = reg.crossJoin(F.broadcast(tot)).select(
        F.lit("region").alias("level"),
        "region",
        F.lit(None).cast("string").alias("nation"),
        F.col("r_cents").cast("bigint").alias("cents"),
        (F.col("r_cents").cast("double") / F.col("t_cents").cast("double"))
        .alias("share_of_parent"),
    )
    return nation_rows.unionByName(region_rows)


@query(
    "m18_new_vs_returning",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
    )
    SELECT ud.day,
           SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END)::BIGINT
             AS new_users,
           SUM(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END)::BIGINT
             AS returning_users
    FROM ud JOIN firsts f USING (user_id)
    GROUP BY ud.day
    """,
)
def m18_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning user split per day — the acquisition/retention
    decomposition of e27's DAU: a user counts as NEW only on their
    first-ever active day. One (user, day) dedup, one user-grain min,
    one key equi-join back (first_day is user-sized — broadcastable),
    one day-grain aggregate; all exact integer counts."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ud.join(F.broadcast(firsts), "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).cast("bigint").alias("new_users"),
            F.sum(
                F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
            ).cast("bigint").alias("returning_users"),
        )
    )


@query(
    "m19_growth_accounting",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), seq AS (
      SELECT user_id, day,
             LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
             LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
      FROM ud
    ), active AS (
      SELECT day,
             SUM(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS new_users,
             SUM(CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END)::BIGINT
               AS retained,
             SUM(CASE WHEN prev_day IS NOT NULL AND prev_day < day - 1
                      THEN 1 ELSE 0 END)::BIGINT AS resurrected
      FROM seq GROUP BY day
    ), churn AS (
      SELECT day + 1 AS day, COUNT(*)::BIGINT AS churned
      FROM seq
      WHERE next_day IS NULL OR next_day > day + 1
      GROUP BY day + 1
    )
    SELECT coalesce(a.day, c.day) AS day,
           coalesce(a.new_users, 0) AS new_users,
           coalesce(a.retained, 0) AS retained,
           coalesce(a.resurrected, 0) AS resurrected,
           coalesce(c.churned, 0) AS churned
    FROM active a FULL OUTER JOIN churn c ON c.day = a.day
    """,
)
def m19_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting (the Social-Capital framework): every
    active user-day is NEW (first ever), RETAINED (also active the
    previous day) or RESURRECTED (back after a gap), and a user CHURNS
    the day after their activity stops (including the day after their
    final observed day). DAU(d) = new + retained + resurrected, and
    DAU(d) - DAU(d-1) = new + resurrected - churned — the accounting
    identity dashboards reconcile against (m18 is its two-bucket
    collapse, e27 its rolling-window smoothing).

    Exactness: all classifications are integer date comparisons off one
    per-user lag/lead window; counts are exact bigints. Scale: one
    shuffle to user grain for the window (state = 2 adjacent days), two
    day-grain aggregates, one day-keyed outer join."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    seq = ud.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    active = seq.groupBy("day").agg(
        F.sum(
            F.when(F.col("prev_day").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("new_users"),
        F.sum(
            F.when(F.col("prev_day") == F.date_sub(F.col("day"), 1), 1)
            .otherwise(0)
        ).cast("bigint").alias("retained"),
        F.sum(
            F.when(
                F.col("prev_day").isNotNull()
                & (F.col("prev_day") < F.date_sub(F.col("day"), 1)),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("resurrected"),
    )
    churn = (
        seq.where(
            F.col("next_day").isNull()
            | (F.col("next_day") > F.date_add(F.col("day"), 1))
        )
        .groupBy(F.date_add(F.col("day"), 1).alias("day"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    j = active.join(churn, "day", "full_outer")
    z = F.lit(0).cast("bigint")
    return j.select(
        "day",
        F.coalesce("new_users", z).alias("new_users"),
        F.coalesce("retained", z).alias("retained"),
        F.coalesce("resurrected", z).alias("resurrected"),
        F.coalesce("churned", z).alias("churned"),
    )


_CF_CAP = 30
_CF_CAP_HASH = "CAST('0x' || substr(md5('cfcap:' || CAST(supp AS VARCHAR)), 1, 15) AS BIGINT)"


@query(
    "cf1b_capped_similarity",
    sql=f"""
    WITH links0 AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), links AS (
      SELECT cust, supp FROM (
        SELECT cust, supp,
               row_number() OVER (
                 PARTITION BY cust ORDER BY {_CF_CAP_HASH}, supp
               ) AS rn
        FROM links0
      ) WHERE rn <= {_CF_CAP}
    ), deg AS (
      SELECT supp, COUNT(*)::BIGINT AS n_cust FROM links GROUP BY supp
    ), pairs AS (
      SELECT a.supp AS supp_a, b.supp AS supp_b,
             COUNT(*)::BIGINT AS n_shared
      FROM links a JOIN links b
        ON a.cust = b.cust AND a.supp < b.supp
      GROUP BY 1, 2
    ), scored AS (
      SELECT supp_a, supp_b, n_shared, da.n_cust AS cust_a,
             db.n_cust AS cust_b,
             CAST(n_shared AS DOUBLE)
               / sqrt(CAST(da.n_cust * db.n_cust AS DOUBLE)) AS cosine
      FROM pairs
      JOIN deg da ON da.supp = pairs.supp_a
      JOIN deg db ON db.supp = pairs.supp_b
      WHERE n_shared >= 3
    ), ranked AS (
      SELECT *, row_number() OVER (
               ORDER BY cosine DESC, supp_a, supp_b) AS rank
      FROM scored
    )
    SELECT supp_a, supp_b, n_shared, cust_a, cust_b, cosine,
           rank::INT AS rank
    FROM ranked WHERE rank <= 20
    """,
)
def cf1b_capped_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cf1's documented basket-size cap, registered: each customer
    contributes at most 30 supplier links, chosen by deterministic hash
    rank (rerun-/engine-stable — the DIMSUM idea of bounding a heavy
    row's pair contribution, with a deterministic selector instead of
    random sampling so the oracle replays it bit-exactly). Pair volume
    is now <= cap²/2 per customer REGARDLESS of basket fattening — the
    cure for cf1's measured 4.5x decade under replication-fattened
    baskets. Deliberately its own oracle: capping changes the estimate
    (that's the point); registering both keeps the tradeoff visible."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    from ..operators.dedup import shared_hash60

    links0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
    )
    h = shared_hash60(
        F.concat(F.lit("cfcap:"), F.col("supp").cast("string"))
    )
    w = Window.partitionBy("cust").orderBy(h.asc(), F.col("supp").asc())
    links = (
        links0.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _CF_CAP)
        .select("cust", "supp")
    )
    deg = links.groupBy("supp").agg(F.count(F.lit(1)).alias("n_cust"))
    a = links.select("cust", F.col("supp").alias("supp_a"))
    b = links.select(
        F.col("cust").alias("cust_b"), F.col("supp").alias("supp_b")
    )
    pairs = (
        a.join(b, (a.cust == b.cust_b) & (F.col("supp_a") < F.col("supp_b")))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )
    da = deg.select(F.col("supp").alias("supp_a"), F.col("n_cust").alias("cust_a"))
    db = deg.select(F.col("supp").alias("supp_b"), F.col("n_cust").alias("cust_b"))
    scored = pairs.join(da, "supp_a").join(db, "supp_b").select(
        "supp_a", "supp_b", "n_shared", "cust_a", "cust_b",
        (
            F.col("n_shared").cast("double")
            / F.sqrt((F.col("cust_a") * F.col("cust_b")).cast("double"))
        ).alias("cosine"),
    )
    top = scored.orderBy(F.desc("cosine"), "supp_a", "supp_b").limit(20)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("cosine"), "supp_a", "supp_b")
        ).cast("int"),
    ).select(
        "supp_a", "supp_b", "n_shared", "cust_a", "cust_b", "cosine", "rank"
    )


@query(
    "m20_activity_streaks",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), isl AS (
      SELECT user_id, day,
             CAST(day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day
             ) AS INTEGER) AS DATE) AS grp
      FROM ud
    ), streaks AS (
      SELECT user_id, grp, COUNT(*)::BIGINT AS len,
             MAX(day) AS streak_end
      FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           MAX(len) AS longest_streak,
           MAX(CASE WHEN streak_end = last_end THEN len END)
             AS current_streak
    FROM (
      SELECT s.*, MAX(streak_end) OVER (PARTITION BY user_id) AS last_end
      FROM streaks s
    ) GROUP BY user_id
    """,
)
def m20_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest and current consecutive-day activity streak per user —
    the engagement metric gamified products anchor on, and the
    gaps-and-islands classic in its purest form: island key = day minus
    row_number (consecutive days share it), streak = island size,
    current streak = the island containing the user's last active day.

    Exactness: all date arithmetic integer; counts exact. Scale: one
    user-grain exchange feeds the row_number window, the island
    aggregate and the final rollup (the e14 shared-exchange argument);
    state bounded by a user's active days."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ud.select(
        "user_id",
        "day",
        F.date_sub(
            F.col("day"), F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.max("day").alias("streak_end"),
    )
    w_all = Window.partitionBy("user_id")
    flagged = streaks.withColumn(
        "last_end", F.max("streak_end").over(w_all)
    )
    return flagged.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.max(
            F.when(F.col("streak_end") == F.col("last_end"), F.col("len"))
        ).alias("current_streak"),
    )


@query(
    "m21_interpurchase_gaps",
    sql="""
    WITH gaps AS (
      SELECT c.c_mktsegment AS segment,
             date_diff('day',
                       lag(o.o_orderdate) OVER (
                         PARTITION BY o.o_custkey
                         ORDER BY o.o_orderdate, o.o_orderkey
                       ),
                       o.o_orderdate)::BIGINT AS gap_days
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT segment,
           COUNT(gap_days)::BIGINT AS n_gaps,
           CAST(ROUND(CAST(SUM(gap_days) AS DOUBLE) / COUNT(gap_days), 6)
                AS DOUBLE) AS mean_gap_days,
           quantile_cont(gap_days, 0.5) AS median_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY segment
    """,
)
def m21_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase gap statistics per market segment: days between a
    customer's consecutive orders (lag window pinned by (date, key)),
    rolled up to segment mean and exact median — the replenishment-
    cycle input behind m11's recency scoring and any churn-risk
    horizon. Gap sums are exact integers (mean = one division, rounded
    identically); the median is the d9 interpolated percentile both
    engines share. One customer-grain exchange for the lag, one
    segment-grain aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).cast("bigint").alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("segment").agg(
        F.count("gap_days").alias("n_gaps"),
        F.round(
            F.sum("gap_days").cast("double") / F.count("gap_days"), 6
        ).alias("mean_gap_days"),
        F.expr("percentile(gap_days, 0.5)").alias("median_gap_days"),
    )


@query(
    "m22_price_volume_variance",
    sql="""
    WITH by_year AS (
      SELECT n.n_name AS nation,
             EXTRACT(year FROM l.l_shipdate)::INT AS yr,
             SUM(CAST(l.l_quantity AS BIGINT))::BIGINT AS qty,
             SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                      AS BIGINT))::BIGINT AS rev_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE EXTRACT(year FROM l.l_shipdate) IN (1997, 1998)
      GROUP BY 1, 2
    ), pivoted AS (
      SELECT nation,
             MAX(CASE WHEN yr = 1997 THEN qty END) AS q0,
             MAX(CASE WHEN yr = 1997 THEN rev_cents END) AS r0,
             MAX(CASE WHEN yr = 1998 THEN qty END) AS q1,
             MAX(CASE WHEN yr = 1998 THEN rev_cents END) AS r1
      FROM by_year GROUP BY nation
    )
    SELECT nation, q0, q1, r0, r1,
           (r1 - r0)::BIGINT AS delta_rev_cents,
           (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
            - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))
             * CAST(q1 AS DOUBLE) AS price_effect_cents,
           (CAST(q1 AS DOUBLE) - CAST(q0 AS DOUBLE))
             * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))
             AS volume_effect_cents
    FROM pivoted
    WHERE q0 IS NOT NULL AND q1 IS NOT NULL
    """,
)
def m22_price_volume_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume variance decomposition per supplier nation,
    1997 -> 1998: delta-revenue split into the price effect
    ((p1 - p0) * q1) and the volume effect ((q1 - q0) * p0) — the FP&A
    bridge-chart decomposition (the two effects sum to delta by the
    standard identity), a capability class next to m14's plain YoY.

    Exactness: the per-year reductions are exact int64 (quantities and
    revenue cents); the effects are FIXED double trees over those
    exact inputs — two divisions, multiplies, subtractions, identical
    both engines. Scale: one fact aggregate at (nation, year) grain
    with both dims broadcast; the decomposition is a 25-row projection."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    yr = F.year("l_shipdate")
    base = (
        li.where(yr.isin(1997, 1998))
        .join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"), yr.cast("int").alias("yr"))
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
                .cast("bigint")
            ).alias("rev_cents"),
        )
    )
    piv = base.groupBy("nation").agg(
        F.max(F.when(F.col("yr") == 1997, F.col("qty"))).alias("q0"),
        F.max(F.when(F.col("yr") == 1997, F.col("rev_cents"))).alias("r0"),
        F.max(F.when(F.col("yr") == 1998, F.col("qty"))).alias("q1"),
        F.max(F.when(F.col("yr") == 1998, F.col("rev_cents"))).alias("r1"),
    ).where(F.col("q0").isNotNull() & F.col("q1").isNotNull())
    q0, q1 = F.col("q0").cast("double"), F.col("q1").cast("double")
    r0, r1 = F.col("r0").cast("double"), F.col("r1").cast("double")
    return piv.select(
        "nation", "q0", "q1", "r0", "r1",
        (F.col("r1") - F.col("r0")).alias("delta_rev_cents"),
        ((r1 / q1 - r0 / q0) * q1).alias("price_effect_cents"),
        ((q1 - q0) * (r0 / q0)).alias("volume_effect_cents"),
    )


@query(
    "m23_time_to_convert",
    sql="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    ), conv AS (
      SELECT user_id,
             (epoch_us(t_buy) - epoch_us(t_view)) // 1000000 AS secs
      FROM firsts
      WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy >= t_view
    )
    SELECT COUNT(*)::BIGINT AS n_converters,
           quantile_cont(secs, 0.5) AS p50_secs,
           quantile_cont(secs, 0.9) AS p90_secs,
           MAX(secs)::BIGINT AS max_secs
    FROM conv
    """,
)
def m23_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: seconds from a user's first view
    to their first purchase (converters only, purchase not before
    view), summarized as p50/p90/max — the latency companion to e10's
    stage counts: the funnel says HOW MANY convert, this says HOW LONG
    conversion takes, which is what sets attribution windows and
    remarketing delays. Gaps in exact integer seconds (integer
    microsecond difference, integer division); percentiles are the
    shared d9 interpolation. One user-grain aggregate, one global
    summary."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_buy"),
    )
    conv = firsts.where(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select(
        (
            (
                F.unix_micros(F.col("t_buy").cast("timestamp"))
                - F.unix_micros(F.col("t_view").cast("timestamp"))
            )
        ).alias("us")
    ).select(F.expr("us div 1000000").alias("secs")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.expr("percentile(secs, 0.5)").alias("p50_secs"),
        F.expr("percentile(secs, 0.9)").alias("p90_secs"),
        F.max("secs").alias("max_secs"),
    )


@query(
    "g14_personalized_pagerank",
    sql=f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders, lineitem WHERE o_orderkey = l_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    pprseeds AS (
      SELECT s_suppkey + 1000000 AS node FROM supplier WHERE s_suppkey <= 5
    ),
    {_graph.ppr_oracle_ctes(iters=3)}
    SELECT node, rank_units FROM pprfinal WHERE rank_units > 0
    """,
)
def g14_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (3 damped iterations, restart mass on
    the five lowest-keyed suppliers — present at every SF) over the symmetric trade graph — proximity TO
    the seed set rather than g3's global importance: the related-entity
    ranking / seed-expansion primitive. Integer fixed-point units as in
    g3, oracle replays the iterations verbatim from the same constants
    (ppr_oracle_ctes). Zero-rank nodes (outside 3 hops of the seeds)
    are filtered on both sides."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 5)
        .select((F.col("s_suppkey") + 1000000).alias("node"))
    )
    out = _graph.personalized_pagerank_fixed_point(edges, seeds, iters=3)
    return out.where(F.col("rank_units") > 0)


@query(
    "m24_ltv_curve",
    sql="""
    WITH firsts AS (
      SELECT o_custkey, MIN(o_orderdate) AS first_order
      FROM orders GROUP BY o_custkey
    ), aged AS (
      SELECT date_diff('day', f.first_order, o.o_orderdate)::BIGINT
               AS days_since,
             CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ), daily AS (
      SELECT days_since, SUM(cents)::BIGINT AS rev_cents,
             COUNT(*)::BIGINT AS n_orders
      FROM aged GROUP BY days_since
    ), n AS (
      SELECT COUNT(*)::BIGINT AS n_cust FROM firsts
    )
    SELECT days_since, n_orders, rev_cents,
           SUM(rev_cents) OVER (ORDER BY days_since
                                ROWS UNBOUNDED PRECEDING)::BIGINT
             AS cum_rev_cents,
           CAST(SUM(rev_cents) OVER (ORDER BY days_since
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(n_cust * 100 AS DOUBLE) AS ltv_per_customer
    FROM daily, n
    """,
)
def m24_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value curve: cumulative revenue per customer
    as a function of days since that customer's FIRST order — the
    payback-period input CAC decisions read off (m10's retention grid
    with money instead of presence). Revenue accumulates in exact int64
    cents at tenure grain; the per-customer normalization is one double
    division by a 1-row count broadcast.

    Scale: first-order is a customer-grain aggregate whose join back
    reuses the same key partitioning (the m10 argument); the cumsum
    window runs at TENURE grain (days — bounded), not order grain."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order")
    )
    aged = orders.join(firsts, "o_custkey").select(
        F.datediff(F.col("o_orderdate"), F.col("first_order"))
        .cast("bigint")
        .alias("days_since"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    daily = aged.groupBy("days_since").agg(
        F.sum("cents").alias("rev_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    n = firsts.agg(F.count(F.lit(1)).alias("n_cust"))
    w = Window.orderBy("days_since").rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = daily.crossJoin(F.broadcast(n)).select(
        "days_since",
        "n_orders",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("bigint").alias("cum_rev_cents"),
        (
            F.sum("rev_cents").over(w).cast("double")
            / (F.col("n_cust") * 100).cast("double")
        ).alias("ltv_per_customer"),
    )
    return out


@query(
    "g15_kcore_trade_graph",
    sql=f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders, lineitem WHERE o_orderkey = l_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    {_graph.kcore_oracle_ctes(k=14, rounds=8)}
    SELECT node, core_degree FROM kcfinal
    """,
)
def g15_kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-core of the symmetric customer<->supplier trade graph
    (graph.kcore): iterative peeling to the unique fixpoint, each
    round one survivor-filtered degree count. k=14 exercises both
    regimes across the SF decade — at sf0.001 the whole graph cascades
    away within 3 rounds (every removal drops neighbors below k), at
    sf0.01/0.1 a dense core survives minus the tendrils. The oracle
    unrolls the same peeling rounds (kcore_oracle_ctes, the
    pagerank-CTE pattern); post-fixpoint rounds are no-ops on both
    engines so the bound is parity, not approximation."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return _graph.kcore(edges, k=14, max_rounds=8)


@query(
    "g16_label_propagation",
    sql=f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders, lineitem WHERE o_orderkey = l_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    {_graph.lpa_oracle_ctes(rounds=4)}
    SELECT node, community FROM lpfinal
    """,
)
def g16_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the symmetric customer<->supplier trade
    graph via synchronous label propagation (graph.label_propagation):
    4 fixed rounds of adopt-the-most-frequent-neighbor-label with a
    self-vote (which damps the bipartite two-coloring oscillation sync
    LPA is known for) and smallest-label tie-break — all-integer state,
    so the round-4 snapshot is bit-identical across engines and
    partitionings. The oracle unrolls the same rounds
    (lpa_oracle_ctes, the pagerank/kcore CTE pattern). Completes the
    graph family's community axis next to dd8's connected components
    (which LPA refines: components bound communities from above)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return _graph.label_propagation(edges, rounds=4)


@query(
    "g18_hyperball_centrality",
    sql=f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders, lineitem WHERE o_orderkey = l_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    {_graph.hyperball_oracle_ctes(rounds=3)}
    SELECT node, ball_r0, ball_r1, ball_r2, ball_r3, harmonic_micro
    FROM hbfinal
    """,
)
def g18_hyperball_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood function + harmonic centrality over the
    symmetric trade graph (graph.hyperball): per node, the HLL-
    estimated ball size at radius 0..3 and the integer harmonic score
    derived from the ball deltas. Exact all-pairs BFS is quadratic
    state; HyperBall is 2^9 registers per node and one register-MAX
    merge per radius (Boldi & Vigna 2013) — the centrality that still
    runs at web scale, here sharing the sk-family's deterministic HLL
    (60-bit shared hash, integer rho cascade, decimal register sum)
    so every estimate replays bit-for-bit in the unrolled oracle."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return _graph.hyperball(edges, rounds=3)


@query(
    "zo2_hilbert_layout",
    sql=zorder.hilbert_layout_oracle_sql(
        "events", "user_id", "(epoch_us(ts) // 1000000)"
    ),
)
def zo2_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout statistics for events clustered on
    (user_id, event second) — zo1's twin on the curve lakehouse
    engines offer as the Z-order upgrade: consecutive Hilbert keys are
    always grid-adjacent (verified against the classic xy2d walk in
    tests), so equal key ranges pin tighter per-file rectangles for
    two-filter pruning. Keys are BIGINT-exact through 8 unrolled
    integer stages; the oracle chains the identical generated stage
    expressions (operators/zorder.py)."""
    ev = load_table(spark, sf_dir, "events")
    return zorder.hilbert_layout(
        ev, "user_id", "CAST(CAST(ts AS TIMESTAMP) AS BIGINT)"
    )


# --- m26: Holt linear-trend forecast (exact fixed-point) ------------------

_HOLT_S = 1_000_000  # micro-units


def _holt_trunc2_sql(a: str) -> str:
    """Truncating halve valid in both dialects for signed BIGINT: both
    Spark `div`-style and DuckDB `//` truncate toward zero, and % takes
    the dividend's sign in both, so (a - a%2)/2 is the shared form."""
    return f"(({a}) - (({a}) % 2)) // 2"


def _holt_fold_sql() -> str:
    """DuckDB list_reduce over a LIST accumulator [level, trend, t].
    A STRUCT accumulator is unusable here: DuckDB 1.0 evaluates the
    result struct's fields sequentially and REBINDS acc's same-named
    fields as they complete (acc.l inside the 'b' expression saw the
    new level — found by a 2x-off trend in the prototype); list index
    references are evaluated against the incoming accumulator."""
    nl = _holt_trunc2_sql("e[1] + acc[1] + acc[2]")
    nb = _holt_trunc2_sql(f"({nl}) - acc[1] + acc[2]")
    return f"""list_reduce(
      list_prepend([0, 0, 0]::BIGINT[],
        list_transform(xs, x -> [x, 0, -1]::BIGINT[])),
      (acc, e) -> CASE WHEN acc[3] = 0 THEN [e[1], 0, 1]
        ELSE [{nl}, {nb}, acc[3] + 1] END
    )"""


@query(
    "m26_holt_forecast",
    sql=f"""
    WITH monthly AS (
      SELECT c_mktsegment AS segment,
             year(o_orderdate) * 100 + month(o_orderdate) AS mkey,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), series AS (
      SELECT segment, list(x * {_HOLT_S} ORDER BY mkey) AS xs
      FROM monthly GROUP BY segment
    ), folded AS (
      SELECT segment, {_holt_fold_sql()} AS st FROM series
    )
    SELECT segment, h,
           st[1] AS level_units, st[2] AS trend_units,
           st[1] + h * st[2] AS forecast_units,
           (st[1] + h * st[2])::DOUBLE / {_HOLT_S}.0 AS forecast
    FROM folded, unnest([1, 2, 3]::BIGINT[]) AS t(h)
    """,
)
def m26_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast of monthly order volume per market
    segment, 1-3 months ahead, in EXACT fixed-point: alpha = beta = 1/2
    make every smoothing step a truncating integer halve (micro-unit
    scale), so the recursive fold is bit-identical on both engines —
    the transcendental-free corner of exponential smoothing, same
    discipline as pagerank's integer rank units. Series are bounded
    (84 months), so the per-segment fold is one in-array aggregate;
    the only shuffle is the monthly count and the segment-grain
    collect. Forecast_h = level + h * trend; single final division."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "segment",
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
                "mkey"
            ),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    series = monthly.groupBy("segment").agg(
        F.array_sort(F.collect_list(F.struct("mkey", "x"))).alias("s")
    )
    xs = F.transform(F.col("s"), lambda p: p["x"] * F.lit(_HOLT_S))

    def trunc2(a):
        return ((a - (a % F.lit(2))) / F.lit(2)).cast("bigint")

    def step(acc, e):
        xv = F.element_at(e, 1)
        nl = trunc2(xv + F.element_at(acc, 1) + F.element_at(acc, 2))
        nb = trunc2(nl - F.element_at(acc, 1) + F.element_at(acc, 2))
        return F.when(
            F.element_at(acc, 3) == 0,
            F.array(xv, F.lit(0).cast("bigint"), F.lit(1).cast("bigint")),
        ).otherwise(F.array(nl, nb, F.element_at(acc, 3) + 1))

    folded = series.select(
        "segment",
        F.aggregate(
            F.transform(xs, lambda x: F.array(
                x, F.lit(0).cast("bigint"), F.lit(-1).cast("bigint")
            )),
            F.array(*[F.lit(0).cast("bigint")] * 3),
            step,
        ).alias("st"),
    )
    h = F.explode(F.array(*[F.lit(i).cast("bigint") for i in (1, 2, 3)]))
    lvl = F.element_at("st", 1)
    trd = F.element_at("st", 2)
    return folded.select("segment", h.alias("h"), lvl.alias("level_units"),
                         trd.alias("trend_units")).select(
        "segment", "h", "level_units", "trend_units",
        (F.col("level_units") + F.col("h") * F.col("trend_units")).alias(
            "forecast_units"
        ),
        (
            (F.col("level_units") + F.col("h") * F.col("trend_units"))
            .cast("double") / F.lit(float(_HOLT_S))
        ).alias("forecast"),
    )


@query(
    "g18b_effective_diameter",
    sql=f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders, lineitem WHERE o_orderkey = l_orderkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    {_graph.hyperball_oracle_ctes(rounds=3)},
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(ball_r0) AS BIGINT) AS reach_r0,
             CAST(SUM(ball_r1) AS BIGINT) AS reach_r1,
             CAST(SUM(ball_r2) AS BIGINT) AS reach_r2,
             CAST(SUM(ball_r3) AS BIGINT) AS reach_r3
      FROM hbfinal
    )
    SELECT n_nodes, reach_r0, reach_r1, reach_r2, reach_r3,
           CAST(CASE WHEN 10 * reach_r0 >= 9 * reach_r3 THEN 0
                     WHEN 10 * reach_r1 >= 9 * reach_r3 THEN 1
                     WHEN 10 * reach_r2 >= 9 * reach_r3 THEN 2
                     ELSE 3 END AS BIGINT) AS effective_diameter_90
    FROM sums
    """,
)
def g18b_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% effective diameter of the trade graph from g18's HyperBall
    neighborhood function (the HyperANF use of the same sketches,
    Boldi-Vigna): total reached pairs per radius and the smallest
    radius covering >= 90% of radius-3 reach, decided by
    cross-multiplied INTEGER comparison over the integer ball
    estimates — one node-grain rollup on top of g18's plan, no new
    state. On this dense bipartite graph the answer pins the
    everything-reaches-everything-in-2-hops structure the pagerank
    family assumes."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    hb = _graph.hyperball(edges, rounds=3)
    sums = hb.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        *[
            F.sum(f"ball_r{r}").cast("bigint").alias(f"reach_r{r}")
            for r in range(4)
        ],
    )
    eff = (
        F.when(10 * F.col("reach_r0") >= 9 * F.col("reach_r3"), 0)
        .when(10 * F.col("reach_r1") >= 9 * F.col("reach_r3"), 1)
        .when(10 * F.col("reach_r2") >= 9 * F.col("reach_r3"), 2)
        .otherwise(3)
    )
    return sums.select(
        "n_nodes", "reach_r0", "reach_r1", "reach_r2", "reach_r3",
        eff.cast("bigint").alias("effective_diameter_90"),
    )


# --- zo3: data-skipping effectiveness audit ----------------------------------
#
# The artifact that JUSTIFIES zo1/zo2 at 100 TB: lay the same rows out
# three ways (arrival order, single-column sort, Z-order), cut each
# layout into fixed-size files, collect per-file (min, max) of both
# probe dimensions — exactly the stats a parquet footer / Delta
# add-file carries — and count how many files each probe rectangle can
# SKIP. Z-order's whole value proposition is this table's bottom row.

_ZO3_ROWS_PER_FILE = 4096
_ZO3_BITS = 16
# probe rectangles as SPAN FRACTIONS (ppm of [min, max] per dimension),
# so the audit is scale-factor-independent: probe 0 is a tight square
# on both dims (Z-order territory); probe 1 is narrow on d1 and nearly
# unbounded on d2 (single-column sort territory).
_ZO3_PROBES = (
    (100000, 200000, 300000, 450000),
    (600000, 650000, 50000, 900000),
)


def _zo3_sql() -> str:
    from ..operators import zorder as _z

    n1 = _z._norm_sql("user_id", "(SELECT min(user_id) FROM ev)",
                      "(SELECT max(user_id) FROM ev)", _ZO3_BITS, "//")
    n2 = _z._norm_sql("cents", "(SELECT min(cents) FROM ev)",
                      "(SELECT max(cents) FROM ev)", _ZO3_BITS, "//")
    zkey = _z.interleave_sql(n1, n2, _ZO3_BITS)
    probes = " UNION ALL ".join(
        f"SELECT {i} AS probe_id,"
        f" mn1 + (mx1 - mn1) * {p[0]} // 1000000 AS lo1,"
        f" mn1 + (mx1 - mn1) * {p[1]} // 1000000 AS hi1,"
        f" mn2 + (mx2 - mn2) * {p[2]} // 1000000 AS lo2,"
        f" mn2 + (mx2 - mn2) * {p[3]} // 1000000 AS hi2 FROM g"
        for i, p in enumerate(_ZO3_PROBES)
    )
    return f"""
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), keyed AS (
      SELECT user_id, cents,
             row_number() OVER (ORDER BY event_id) AS r_nat,
             row_number() OVER (ORDER BY user_id, event_id) AS r_srt,
             row_number() OVER (ORDER BY {zkey}, event_id) AS r_z
      FROM ev
    ), files AS (
      SELECT layout, file_id,
             MIN(user_id) AS mn1, MAX(user_id) AS mx1,
             MIN(cents) AS mn2, MAX(cents) AS mx2
      FROM (
        SELECT 'natural' AS layout,
               (r_nat - 1) // {_ZO3_ROWS_PER_FILE} AS file_id,
               user_id, cents FROM keyed
        UNION ALL
        SELECT 'sorted_d1', (r_srt - 1) // {_ZO3_ROWS_PER_FILE},
               user_id, cents FROM keyed
        UNION ALL
        SELECT 'zorder', (r_z - 1) // {_ZO3_ROWS_PER_FILE},
               user_id, cents FROM keyed
      ) GROUP BY layout, file_id
    ), g AS (
      SELECT MIN(user_id) AS mn1, MAX(user_id) AS mx1,
             MIN(cents) AS mn2, MAX(cents) AS mx2
      FROM ev
    ), probes AS ({probes})
    SELECT layout, CAST(probe_id AS BIGINT) AS probe_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN mx1 < lo1 OR mn1 > hi1
                         OR mx2 < lo2 OR mn2 > hi2
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
           CAST(SUM(CASE WHEN mx1 < lo1 OR mn1 > hi1
                         OR mx2 < lo2 OR mn2 > hi2
                    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS skip_ppm
    FROM files, probes
    GROUP BY layout, probe_id
    """


@query("zo3_skipping_audit", sql=_zo3_sql())
def zo3_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping effectiveness audit — the number that decides
    whether a 100 TB table gets OPTIMIZE ZORDER: the same events laid
    out in arrival order, sorted by user_id, and Z-ordered on
    (user_id, cents); each layout cut into 4096-row files; per-file
    (min, max) of both dimensions — the parquet-footer/Delta-add-file
    stats — and for each probe rectangle the exact count and ppm of
    files whose stats prove they can be skipped. Arrival order skips
    ~nothing, the single-column sort skips only on its own column,
    Z-order skips on both — this query MEASURES that on real stats
    instead of asserting it.

    Scale shape (VERDICT r10 item 6): each layout's global file
    assignment comes from window_ops.global_rank_scalable — the SAME
    range-partitioned pass a production layout job pays (zorder.py
    rationale), not a single-task global sort; range boundaries don't
    matter to the answer because per-bucket ranks are re-based by the
    broadcast cumulative-count offsets, so the oracle's global
    row_number is reproduced exactly. After that it's file-grain stats
    (n/4096 rows) x a broadcast 2-row probe set. The pinned `keyed`
    frame keeps the scan + stats join at one pass across the three
    layout branches."""
    from ..operators import zorder as _z
    from ..operators.window_ops import global_rank_scalable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    stats = ev.agg(
        F.min("user_id").alias("__mn1"), F.max("user_id").alias("__mx1"),
        F.min("cents").alias("__mn2"), F.max("cents").alias("__mx2"),
    )
    j = ev.join(F.broadcast(stats))
    n1 = _z._norm_sql("user_id", "__mn1", "__mx1", _ZO3_BITS, "div")
    n2 = _z._norm_sql("cents", "__mn2", "__mx2", _ZO3_BITS, "div")
    zkey = _z.interleave_sql(n1, n2, _ZO3_BITS)
    from ..cache import pin

    keyed = pin(
        j.select("event_id", "user_id", "cents", F.expr(zkey).alias("__zk"))
    )

    def layout_files(order_by: list, name: str) -> DataFrame:
        ranked = global_rank_scalable(keyed, order_by, rank_col="__r")
        return ranked.select(
            F.lit(name).alias("layout"),
            F.expr(f"(__r - 1) div {_ZO3_ROWS_PER_FILE}").alias("file_id"),
            "user_id",
            "cents",
        )

    per_file = (
        layout_files(["event_id"], "natural")
        .unionByName(layout_files(["user_id", "event_id"], "sorted_d1"))
        .unionByName(layout_files(["__zk", "event_id"], "zorder"))
        .groupBy("layout", "file_id")
        .agg(
            F.min("user_id").alias("mn1"), F.max("user_id").alias("mx1"),
            F.min("cents").alias("mn2"), F.max("cents").alias("mx2"),
        )
    )
    fr = spark.createDataFrame(
        [(i,) + p for i, p in enumerate(_ZO3_PROBES)],
        "probe_id long, f_lo1 long, f_hi1 long, f_lo2 long, f_hi2 long",
    )
    probes = fr.crossJoin(F.broadcast(stats)).select(
        "probe_id",
        F.expr("__mn1 + (__mx1 - __mn1) * f_lo1 div 1000000").alias("lo1"),
        F.expr("__mn1 + (__mx1 - __mn1) * f_hi1 div 1000000").alias("hi1"),
        F.expr("__mn2 + (__mx2 - __mn2) * f_lo2 div 1000000").alias("lo2"),
        F.expr("__mn2 + (__mx2 - __mn2) * f_hi2 div 1000000").alias("hi2"),
    )
    skipped = F.when(
        (F.col("mx1") < F.col("lo1")) | (F.col("mn1") > F.col("hi1"))
        | (F.col("mx2") < F.col("lo2")) | (F.col("mn2") > F.col("hi2")),
        1,
    ).otherwise(0)
    return (
        per_file.crossJoin(F.broadcast(probes))
        .groupBy("layout", "probe_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(skipped).cast("bigint").alias("n_skipped"),
            F.expr(
                f"CAST(SUM(CASE WHEN mx1 < lo1 OR mn1 > hi1 OR mx2 < lo2"
                f" OR mn2 > hi2 THEN 1 ELSE 0 END) * 1000000"
                f" div COUNT(*) AS BIGINT)"
            ).alias("skip_ppm"),
        )
    )
