"""Round-6 second-wave surface: CDC changelog apply, triangle counting,
order-aware EWMA, grouped OLS regression, embedding covariance,
BPE-style pair-merge statistics, and the interval-overlap join.

Each query pairs a Spark-first operator with a portable DuckDB oracle
under the repo's exactness discipline: cross-row reductions happen in
decimal/bigint space (associative ⇒ partition-order-invariant ⇒
hash-comparable), per-row/per-list float arithmetic is IEEE-identical
sequential folds, and every computed column is aliased identically on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import graph as _graph
from ..operators.cdc import cdc_apply
from ..operators.rangejoin import binned_interval_overlap_join
from . import query

# deterministic synthetic changelog over orders: key = customer, event
# sequence = orderkey (globally unique), op mix exercises all three verbs
_CDC_OP_SQL = (
    "CASE WHEN o_orderkey % 13 = 0 THEN 'D' "
    "WHEN o_orderkey % 3 = 0 THEN 'I' ELSE 'U' END"
)


@query(
    "c6_cdc_apply",
    sql=f"""
    WITH changelog AS (
      SELECT o_custkey AS cust_id, o_orderkey AS seq, {_CDC_OP_SQL} AS op,
             o_orderstatus AS status, o_totalprice AS totalprice,
             o_orderdate AS orderdate
      FROM orders
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cust_id ORDER BY seq DESC) AS rn
      FROM changelog
    )
    SELECT cust_id, seq, status, totalprice, orderdate
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def c6_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → current state (the general form of the reference's
    per-row OLE DB UPDATE apply, SSIS ``bor_dim.dtsx`` — SURVEY §2.A11).
    The operator is ONE map-side-combinable MAX(struct) aggregate —
    no window, no per-key sort, shuffle carries one partial row per
    (key, partition) — where the oracle replays the semantics with the
    textbook row_number window. A delete with the highest sequence
    removes the key; a later upsert would resurrect it."""
    orders = load_table(spark, sf_dir, "orders")
    changelog = orders.select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderkey").alias("seq"),
        F.expr(_CDC_OP_SQL).alias("op"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderdate").alias("orderdate"),
    )
    return cdc_apply(
        changelog,
        key_cols=["cust_id"],
        seq_col="seq",
        op_col="op",
        payload_cols=["status", "totalprice", "orderdate"],
    )


@query(
    "g4_triangle_count",
    sql="""
    WITH hi AS (
      SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 45
    ),
    und AS (
      SELECT DISTINCT CAST(a.l_suppkey AS BIGINT) AS u,
                      CAST(b.l_suppkey AS BIGINT) AS v
      FROM hi a
      JOIN hi b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM und e1
      JOIN und e2 ON e2.u = e1.v
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node
    """,
)
def g4_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle counts over the co-supply graph (suppliers
    adjacent iff they ship lines of the same order). The operator
    orients edges by (degree, id) — capping wedge fan-out at
    O(sqrt(|E|)) per node on ANY degree distribution, the MR triangle
    counting of Suri-Vassilvitskii — while the oracle replays the
    orientation-invariant triangle set with the naive a<b<c
    three-way self-join. Edge derivation fan-out is bounded by
    lines-per-order (≤ 7 in TPC-H), so the pair explode never
    quadratics on a big order.

    Adjacency is restricted to HIGH-QUANTITY lines (qty > 45, ~10% of
    lines): co-occurrence graphs over an unfiltered fact DENSIFY as the
    fact outgrows the entity set (at sf0.1 the unfiltered graph is
    ~90%-complete on 1 000 suppliers — 10^8 triangles exist, so ANY
    counting algorithm is cubic there; 61s measured). The filtered graph
    keeps average degree roughly CONSTANT across the SF decade (edges
    and nodes both grow linearly), which is the regime where triangle
    counting is a scale-sane operator at all — the standard blocking
    discipline of every real co-occurrence analysis."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    a = li.select("l_orderkey", F.col("l_suppkey").alias("sa"))
    b = li.select("l_orderkey", F.col("l_suppkey").alias("sb"))
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .distinct()
    )
    return _graph.triangle_counts(und, src="src", dst="dst")


@query(
    "e11_ewma",
    sql="""
    SELECT event_id, user_id, ts, value,
           list_reduce(
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW
             ),
             (acc, x) -> acc * 0.5 + x
           ) AS ewma
    FROM events
    """,
)
def e11_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (alpha = 1/2,
    16-event horizon) as an ORDER-AWARE windowed reduce: collect the
    frame in frame order, left-fold acc*0.5 + x. Multiplication by 0.5
    is exact in binary floating point and the fold order is pinned by
    the frame on both engines, so the doubles are bit-identical with NO
    decimal detour — the idiom for any order-sensitive recurrence
    (EWMA, compound interest, Horner polynomial) that a plain SUM
    cannot express. One shuffle on user_id; the 16-row frame bounds
    per-row state. DuckDB's list_reduce seeds with the first element,
    Spark's aggregate with 0.0 — identical because f(0, x1) = x1."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    frame = F.collect_list("value").over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.aggregate(
            frame, F.lit(0.0), lambda acc, x: acc * F.lit(0.5) + x
        ).alias("ewma"),
    )


@query(
    "e13_group_regression",
    sql="""
    WITH sums AS (
      SELECT l_returnflag, l_linestatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) *
                      CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) *
                      CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept
    FROM sums
    """,
)
def e13_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit (extendedprice ~ quantity) from the five
    mergeable power sums — the closed-form regression every segmented
    model-fit pipeline ships as a single hash aggregate: partials merge
    associatively (decimal space), the closed forms evaluate driverless
    in the final projection, and adding a group key costs nothing. A
    per-group regression via mllib or applyInPandas would shuffle the
    full rows; this shuffles five numbers per (group, partition)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(8,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    sums = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
    )


# 2^20 quantization steps, 2^40 denominator for the product sums — both
# powers of two, so the scaling multiplications are EXACT in double space
_QSCALE = 1 << 20
_QDENOM = float(1 << 40)


@query(
    "f11_embedding_covariance",
    sql=f"""
    WITH q AS (
      SELECT ti.range AS i, tj.range AS j,
             CAST(FLOOR(CAST(embedding[ti.range] AS DOUBLE) * {_QSCALE}) AS BIGINT) AS qi,
             CAST(FLOOR(CAST(embedding[tj.range] AS DOUBLE) * {_QSCALE}) AS BIGINT) AS qj
      FROM embeddings
      CROSS JOIN range(1, 9) ti
      CROSS JOIN range(1, 9) tj
      WHERE ti.range <= tj.range
    )
    SELECT i, j, COUNT(*) AS n_vecs,
           ROUND(((CAST(SUM(qi * qj) AS DOUBLE)
                   - CAST(SUM(qi) AS DOUBLE) * CAST(SUM(qj) AS DOUBLE)
                     / COUNT(*))
                  / COUNT(*)) / {_QDENOM!r}, 6) AS cov
    FROM q GROUP BY i, j
    """,
)
def f11_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading 8x8 block of the embedding covariance matrix via
    fixed-point quantization: components floor-quantize to 2^-20 steps
    (float→double cast exact, power-of-two scale exact, floor exact),
    then every moment is a BIGINT sum — associative, so the distributed
    result is partition-order-invariant and replayable, where raw
    double sums would differ in the last ulps per reduction order (the
    int8_topk / fixed-point-PageRank idiom). The (i, j) pair explode is
    36 rows per vector with NO self-join; at full width it is d(d+1)/2
    — the shuffle carries three integers per (pair, partition), which
    is what makes a 100 TB covariance/PCA pass a single aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = F.expr(
        f"""
        flatten(transform(sequence(1, 8), i ->
          transform(sequence(i, 8), j -> struct(
            i AS i, j AS j,
            CAST(FLOOR(CAST(element_at(embedding, i) AS DOUBLE) * {_QSCALE}) AS BIGINT) AS qi,
            CAST(FLOOR(CAST(element_at(embedding, j) AS DOUBLE) * {_QSCALE}) AS BIGINT) AS qj
          ))))
        """
    )
    exploded = emb.select(F.explode(pairs).alias("p")).select("p.*")
    agg = exploded.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("qi") * F.col("qj")).alias("sij"),
        F.sum("qi").alias("si"),
        F.sum("qj").alias("sj"),
    )
    n = F.col("n_vecs")
    cov = (
        (
            F.col("sij").cast("double")
            - F.col("si").cast("double") * F.col("sj").cast("double") / n
        )
        / n
    ) / F.lit(_QDENOM)
    return agg.select("i", "j", "n_vecs", F.round(cov, 6).alias("cov"))


_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"


@query(
    "bpe1_pair_merges",
    sql=f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS t FROM documents),
    pairs AS (
      SELECT t[u.i] AS w1, t[u.i + 1] AS w2
      FROM toks, unnest(range(1, len(t))) u(i)
      WHERE len(t) >= 2
    )
    SELECT w1, w2, COUNT(*) AS n_pairs
    FROM pairs GROUP BY w1, w2
    ORDER BY n_pairs DESC, w1, w2 LIMIT 20
    """,
)
def bpe1_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-style merge-learning step: corpus-wide adjacent-token
    pair frequencies, top-20 merge candidates under a total order
    (count DESC, then lexicographic — deterministic at the cut line).
    The pair explode is per-row (no self-join, no shuffle before the
    count); the count is map-side-combined on the pair key; the top-20
    compiles to TakeOrderedAndProject — each partition keeps 20
    candidates, the driver merges 20·P rows — NOT a single-partition
    row_number window. Iterating this step with the winning pair
    substituted is exactly BPE vocabulary training at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    pairs = F.expr(
        "transform(sequence(1, size(t) - 1), i -> "
        "struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
    )
    return (
        docs.select(toks.alias("t"))
        .where(F.size("t") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "w1", "w2")
        .limit(20)
    )


@query(
    "j3_interval_overlap",
    sql="""
    WITH l AS (
      SELECT event_id AS l_id, epoch_ms(ts) AS l_lo,
             epoch_ms(ts) + (300 + event_id % 600) * 1000 AS l_hi
      FROM events WHERE event_type = 'view'
    ),
    r AS (
      SELECT event_id AS r_id, epoch_ms(ts) AS r_lo,
             epoch_ms(ts) + (200 + event_id % 900) * 1000 AS r_hi
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l_id, r_id, l_lo, l_hi, r_lo, r_hi
    FROM l JOIN r ON l_lo < r_hi AND r_lo < l_hi
    """,
)
def j3_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join (view-activity windows vs
    purchase-activity windows): the operator bin-expands both sides and
    meets candidates in a hash equi-join with first-shared-bin pair
    dedup, where the oracle states the declarative theta join (which
    Spark would plan as a nested loop — the exact degeneration the bin
    expansion exists to kill). Millisecond bigint bounds; 15-minute
    bins ≈ the median interval span, keeping fan-out and per-bin
    density both O(1)."""
    events = load_table(spark, sf_dir, "events")
    # unix_millis rejects TIMESTAMP_NTZ; session TZ is pinned UTC so the
    # cast is a pure type tag change (core.py e6 idiom)
    lo = F.unix_millis(F.col("ts").cast("timestamp"))
    left = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("l_id"),
        lo.alias("l_lo"),
        (lo + (F.lit(300) + F.col("event_id") % 600) * 1000).alias("l_hi"),
    )
    right = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_id"),
        lo.alias("r_lo"),
        (lo + (F.lit(200) + F.col("event_id") % 900) * 1000).alias("r_hi"),
    )
    return binned_interval_overlap_join(
        left, "l_lo", "l_hi", right, "r_lo", "r_hi", bin_width=900_000
    ).select("l_id", "r_id", "l_lo", "l_hi", "r_lo", "r_hi")


@query(
    "e12_event_transitions",
    sql="""
    SELECT event_type, next_type, COUNT(*) AS n
    FROM (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    )
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def e12_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event streams: LEAD
    pairs each event with its successor inside the per-user window (one
    user-key shuffle, no self-join), then a map-side-combined count per
    (from, to). Output is |event_types|^2 rows regardless of input size
    — the path-analysis primitive behind funnel drop-off and
    next-action models."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SK6_ORACLE = """
    WITH regs_a AS (SELECT bucket, MAX(rho) AS m_reg FROM (SELECT h % 512 AS bucket, CASE WHEN (h // 512) % 2 = 1 THEN 1 WHEN (h // 512) % 4 = 2 THEN 2 WHEN (h // 512) % 8 = 4 THEN 3 WHEN (h // 512) % 16 = 8 THEN 4 WHEN (h // 512) % 32 = 16 THEN 5 WHEN (h // 512) % 64 = 32 THEN 6 WHEN (h // 512) % 128 = 64 THEN 7 WHEN (h // 512) % 256 = 128 THEN 8 WHEN (h // 512) % 512 = 256 THEN 9 WHEN (h // 512) % 1024 = 512 THEN 10 WHEN (h // 512) % 2048 = 1024 THEN 11 WHEN (h // 512) % 4096 = 2048 THEN 12 WHEN (h // 512) % 8192 = 4096 THEN 13 WHEN (h // 512) % 16384 = 8192 THEN 14 WHEN (h // 512) % 32768 = 16384 THEN 15 WHEN (h // 512) % 65536 = 32768 THEN 16 WHEN (h // 512) % 131072 = 65536 THEN 17 WHEN (h // 512) % 262144 = 131072 THEN 18 WHEN (h // 512) % 524288 = 262144 THEN 19 ELSE 20 END AS rho FROM (SELECT CAST('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM (SELECT o_custkey AS v FROM orders WHERE o_orderstatus = 'F'))) GROUP BY bucket),
    regs_b AS (SELECT bucket, MAX(rho) AS m_reg FROM (SELECT h % 512 AS bucket, CASE WHEN (h // 512) % 2 = 1 THEN 1 WHEN (h // 512) % 4 = 2 THEN 2 WHEN (h // 512) % 8 = 4 THEN 3 WHEN (h // 512) % 16 = 8 THEN 4 WHEN (h // 512) % 32 = 16 THEN 5 WHEN (h // 512) % 64 = 32 THEN 6 WHEN (h // 512) % 128 = 64 THEN 7 WHEN (h // 512) % 256 = 128 THEN 8 WHEN (h // 512) % 512 = 256 THEN 9 WHEN (h // 512) % 1024 = 512 THEN 10 WHEN (h // 512) % 2048 = 1024 THEN 11 WHEN (h // 512) % 4096 = 2048 THEN 12 WHEN (h // 512) % 8192 = 4096 THEN 13 WHEN (h // 512) % 16384 = 8192 THEN 14 WHEN (h // 512) % 32768 = 16384 THEN 15 WHEN (h // 512) % 65536 = 32768 THEN 16 WHEN (h // 512) % 131072 = 65536 THEN 17 WHEN (h // 512) % 262144 = 131072 THEN 18 WHEN (h // 512) % 524288 = 262144 THEN 19 ELSE 20 END AS rho FROM (SELECT CAST('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM (SELECT o_custkey AS v FROM orders WHERE o_orderpriority = '1-URGENT'))) GROUP BY bucket),
    both_r AS (SELECT bucket, m_reg FROM regs_a
               UNION ALL SELECT bucket, m_reg FROM regs_b),
    regs_u AS (SELECT bucket, MAX(m_reg) AS m_reg FROM both_r GROUP BY bucket)
    SELECT est_a, est_b, est_union, est_a + est_b - est_union AS est_intersect
    FROM (SELECT CAST(ROUND(CASE WHEN (188686.82445861166 / CAST(CAST(512 - (SELECT COUNT(*) FROM regs_a) AS DECIMAL(38,21)) + (SELECT SUM(CAST(POWER(2.0, -m_reg) AS DECIMAL(38,21))) FROM regs_a) AS DOUBLE)) <= 1280.0 AND (512 - (SELECT COUNT(*) FROM regs_a)) > 0 THEN 512.0 * LN(512.0 / (512 - (SELECT COUNT(*) FROM regs_a))) ELSE 188686.82445861166 / CAST(CAST(512 - (SELECT COUNT(*) FROM regs_a) AS DECIMAL(38,21)) + (SELECT SUM(CAST(POWER(2.0, -m_reg) AS DECIMAL(38,21))) FROM regs_a) AS DOUBLE) END) AS BIGINT) AS est_a,
                 CAST(ROUND(CASE WHEN (188686.82445861166 / CAST(CAST(512 - (SELECT COUNT(*) FROM regs_b) AS DECIMAL(38,21)) + (SELECT SUM(CAST(POWER(2.0, -m_reg) AS DECIMAL(38,21))) FROM regs_b) AS DOUBLE)) <= 1280.0 AND (512 - (SELECT COUNT(*) FROM regs_b)) > 0 THEN 512.0 * LN(512.0 / (512 - (SELECT COUNT(*) FROM regs_b))) ELSE 188686.82445861166 / CAST(CAST(512 - (SELECT COUNT(*) FROM regs_b) AS DECIMAL(38,21)) + (SELECT SUM(CAST(POWER(2.0, -m_reg) AS DECIMAL(38,21))) FROM regs_b) AS DOUBLE) END) AS BIGINT) AS est_b,
                 CAST(ROUND(CASE WHEN (188686.82445861166 / CAST(CAST(512 - (SELECT COUNT(*) FROM regs_u) AS DECIMAL(38,21)) + (SELECT SUM(CAST(POWER(2.0, -m_reg) AS DECIMAL(38,21))) FROM regs_u) AS DOUBLE)) <= 1280.0 AND (512 - (SELECT COUNT(*) FROM regs_u)) > 0 THEN 512.0 * LN(512.0 / (512 - (SELECT COUNT(*) FROM regs_u))) ELSE 188686.82445861166 / CAST(CAST(512 - (SELECT COUNT(*) FROM regs_u) AS DECIMAL(38,21)) + (SELECT SUM(CAST(POWER(2.0, -m_reg) AS DECIMAL(38,21))) FROM regs_u) AS DOUBLE) END) AS BIGINT) AS est_union)
    """


@query("sk6_hll_setops", sql=_SK6_ORACLE)
def sk6_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set algebra: distinct-customer estimates for two order
    subsets, their UNION via register-wise MAX merge (associative -- the
    sketches of a 100 TB corpus's partitions merge without re-scanning
    anything), and their INTERSECTION by inclusion-exclusion in exact
    integer space. The oracle replays registers, merge, and estimator
    from the same generator constants (operators/sketches.py), so the
    estimates match to the bit. Register state is <= 512 rows per set
    regardless of input size."""
    from ..operators.sketches import hll_merge, hll_registers, hll_estimate

    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("v")
    )
    b = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("v")
    )
    ra = hll_registers(a, "v", [])
    rb = hll_registers(b, "v", [])
    ru = hll_merge(ra, rb)
    tagged = (
        ra.withColumn("set_name", F.lit("a"))
        .union(rb.withColumn("set_name", F.lit("b")))
        .union(ru.withColumn("set_name", F.lit("u")))
    )
    ests = hll_estimate(tagged, ["set_name"])
    one = ests.agg(
        F.max(F.when(F.col("set_name") == "a", F.col("est_distinct"))).alias("est_a"),
        F.max(F.when(F.col("set_name") == "b", F.col("est_distinct"))).alias("est_b"),
        F.max(F.when(F.col("set_name") == "u", F.col("est_distinct"))).alias(
            "est_union"
        ),
    )
    return one.select(
        "est_a",
        "est_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias("est_intersect"),
    )


@query(
    "e14_sessionize",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    labeled AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           MIN(ts) AS t_start, MAX(ts) AS t_end,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM labeled GROUP BY user_id, session_no
    """,
)
def e14_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: number each user's sessions
    (30-minute inactivity gap) and emit per-session start/end/duration/
    count — the session-ID-assignment twin of h3's session_window
    aggregate. Gap arithmetic in integer microseconds (no float, no tz).
    One (user_id) exchange feeds the lag window, the running-sum window,
    and the session aggregate."""
    ev = load_table(spark, sf_dir, "events")
    from ..operators.window_ops import sessionize

    return sessionize(ev, "user_id", "ts", "event_id", gap_seconds=1800)


@query(
    "e15_rolling_median",
    sql="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS n_events
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ), framed AS (
      SELECT event_type, day, n_events,
             list(n_events) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
             ) AS frame
      FROM daily
    )
    SELECT event_type, day, n_events,
           list_sort(frame)[CAST(ceil(len(frame) / 2.0) AS INTEGER)]
             AS med7
    FROM framed
    """,
)
def e15_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-point rolling EXACT median of the daily event-count series per
    type — the robust trend smoother (moving averages chase outliers;
    medians don't). Spark has no built-in windowed median, so the frame
    is collected, sorted, and indexed (lower median = sorted[ceil(n/2)])
    — pure SELECTION, no float accumulation, so the DuckDB replay is
    bit-identical. Scale: the window runs over the AGGREGATED
    (type, day) series — cardinality types x days, bounded regardless
    of event volume; the only event-sized operation is the one
    map-side-combined count. Frame state is <= 7 longs per row."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    frame = F.array_sort(F.collect_list("n_events").over(w))
    med = F.element_at(
        frame, F.ceil(F.size(frame) / F.lit(2.0)).cast("int")
    )
    return daily.select(
        "event_type", "day", "n_events", med.alias("med7")
    )


from ..operators import sketches  # noqa: E402


@query(
    "sk7_sliding_hll",
    sql=sketches.hll_sliding_oracle_sql("events", "user_id", "ts", window_days=2),
)
def sk7_sliding_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-2-day distinct users per day via sliding HLL register
    merge: events hash-reduce to per-day registers ONCE, then only
    register rows (<= 512/day) shuffle into window anchors — the
    sliding-distinct shape that never re-scans or re-shuffles raw keys.
    Oracle replays hash, registers, window explode, and estimator
    bit-for-bit (operators/sketches.py::hll_sliding_oracle_sql)."""
    ev = load_table(spark, sf_dir, "events")
    return sketches.hll_sliding_distinct(ev, "user_id", "ts", window_days=2)


# --- round-6 seventh wave: value-change islands + exact interpolation ---


@query(
    "e18_interval_compaction",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id, value,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS changed
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT *, SUM(changed) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM ordered
    )
    SELECT user_id, event_type, CAST(island AS BIGINT) AS island,
           MIN(event_id) AS first_event_id,
           MAX(event_id) AS last_event_id,
           COUNT(*)::BIGINT AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS run_value
    FROM islands
    GROUP BY user_id, event_type, island
    """,
)
def e18_interval_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-change islands (interval compaction): consecutive same-type
    events per user collapse into one run — the timeseries-compression
    twin of e14's time-gap sessionization (SCD-style interval storage
    for high-churn attribute streams). Plan shape: the lag window, the
    running island sum, and the final run aggregate all share ONE
    user_id exchange (same single-Exchange discipline as e14); nothing
    ever re-partitions. Run ids restart per user, so the island counter
    never needs a global sequence. Exactness: island boundaries are
    integer flags; run_value folds in decimal."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    run = (
        ev.withColumn("changed", changed)
        .withColumn(
            "island",
            F.sum("changed").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "event_type", "island")
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("run_value"),
        )
    )
    return run


@query(
    "e19_linear_interpolate",
    sql="""
    WITH base AS (
      SELECT event_id, user_id, epoch_us(ts) AS t,
             CASE WHEN event_id % 5 = 0
                  THEN CAST(ROUND(value * 100) AS BIGINT) END AS known_cents
      FROM events
    ), anchored AS (
      SELECT event_id, user_id, t, known_cents,
             last_value(CASE WHEN known_cents IS NOT NULL
                             THEN struct_pack(t := t, c := known_cents) END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS UNBOUNDED PRECEDING) AS prev,
             first_value(CASE WHEN known_cents IS NOT NULL
                              THEN struct_pack(t := t, c := known_cents) END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next
      FROM base
    )
    SELECT event_id, user_id,
           known_cents IS NOT NULL AS is_anchor,
           CASE
             WHEN known_cents IS NOT NULL THEN known_cents
             WHEN prev.t IS NULL OR next.t IS NULL THEN NULL
             WHEN next.t = prev.t THEN prev.c
             ELSE (prev.c * (next.t - t) + next.c * (t - prev.t))
                  // (next.t - prev.t)
           END AS interp_cents
    FROM anchored
    """,
)
def e19_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation of a sparsely-observed series:
    every 5th event is an anchor (value quantized to integer cents),
    the rest interpolate between the nearest anchors on each side.
    Exactness discipline: time is integer epoch-microseconds, values are
    integer cents, and the interpolation is one integer floor-division
    of a non-negative numerator — float-free, so both engines emit
    identical bigints (double interpolation would round differently).
    The anchor (t, value) pair forward/backward-fills as ONE struct, so
    the weight and the value always come from the same anchor row (the
    ADVICE r5 asof lesson). Plan: both fills share one user_id exchange;
    leading/trailing rows with no anchor on one side emit NULL."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.select(
        "event_id",
        "user_id",
        us.alias("t"),
        F.when(
            F.col("event_id") % 5 == 0,
            F.round(F.col("value") * 100).cast("bigint"),
        ).alias("known_cents"),
    )
    anchor = F.when(
        F.col("known_cents").isNotNull(),
        F.struct(F.col("t").alias("t"), F.col("known_cents").alias("c")),
    )
    wp = Window.partitionBy("user_id").orderBy("t", "event_id")
    prev = F.last(anchor, ignorenulls=True).over(
        wp.rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = F.first(anchor, ignorenulls=True).over(
        wp.rowsBetween(0, Window.unboundedFollowing)
    )
    filled = base.select(
        "event_id",
        "user_id",
        "t",
        "known_cents",
        prev.alias("prev"),
        nxt.alias("next"),
    )
    interp = (
        F.when(F.col("known_cents").isNotNull(), F.col("known_cents"))
        .when(
            F.col("prev.t").isNull() | F.col("next.t").isNull(), F.lit(None)
        )
        .when(F.col("next.t") == F.col("prev.t"), F.col("prev.c"))
        .otherwise(
            F.expr(
                "(prev.c * (next.t - t) + next.c * (t - prev.t))"
                " DIV (next.t - prev.t)"
            )
        )
    )
    return filled.select(
        "event_id",
        "user_id",
        F.col("known_cents").isNotNull().alias("is_anchor"),
        interp.alias("interp_cents"),
    )


@query(
    "e20_running_distinct",
    sql="""
    SELECT event_id, user_id,
           COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS n_types_seen
    FROM events
    """,
)
def e20_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count per user (how many distinct event types
    seen so far). Spark has no DISTINCT aggregate over windows, and the
    naive size(collect_set) frame carries O(frame) state per row; the
    scalable decomposition is FLAG + CUMSUM: row_number over
    (user, type) marks each type's first occurrence, a running sum of
    the flag counts them — two windows that share the user_id exchange
    (the second sorts within the same partitioning), state O(1) per
    row. The oracle runs DuckDB's native windowed COUNT(DISTINCT) over
    the same frame, proving the decomposition exact including ties
    (both windows order by (ts, event_id))."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn(
            "__is_first",
            (F.row_number().over(w_first) == 1).cast("bigint"),
        )
        .withColumn("n_types_seen", F.sum("__is_first").over(w_run))
        .select("event_id", "user_id", "n_types_seen")
    )


_KMV_K = 64
_KMV_SCALE = 1 << 40  # 40-bit domain: (k-1)*SCALE stays in int64


@query(
    "sk8_kmv_intersection",
    sql=f"""
    WITH du AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substr(md5('kmv_' || user_id), 1, 10) AS BIGINT)
               AS h
      FROM events
    ), sk AS (
      SELECT event_type,
             list_sort(list(h))[1:{_KMV_K}] AS sketch,
             COUNT(*)::BIGINT AS nd
      FROM du GROUP BY event_type
    ), est AS (
      SELECT event_type, sketch, nd,
             CASE WHEN nd < {_KMV_K} THEN nd
                  ELSE ({_KMV_K} - 1) * {_KMV_SCALE}
                       // sketch[{_KMV_K}] END AS est_distinct
      FROM sk
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.est_distinct AS est_a, b.est_distinct AS est_b,
             list_sort(list_distinct(list_concat(a.sketch, b.sketch)))
               AS merged
      FROM est a JOIN est b ON a.event_type < b.event_type
    )
    SELECT type_a, type_b, est_a, est_b,
           CASE WHEN len(merged) < {_KMV_K} THEN len(merged)::BIGINT
                ELSE ({_KMV_K} - 1) * {_KMV_SCALE}
                     // merged[{_KMV_K}] END AS est_union,
           est_a + est_b
             - CASE WHEN len(merged) < {_KMV_K} THEN len(merged)::BIGINT
                    ELSE ({_KMV_K} - 1) * {_KMV_SCALE}
                         // merged[{_KMV_K}] END AS est_intersection
    FROM pairs
    """,
)
def sk8_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct sketch with
    inclusion-exclusion set intersection — the sketch family whose
    UNION is exact sketch algebra (bottom-k of merged bottom-k's),
    complementing sk1/sk6's HLL registers: KMV supports unbiased
    intersection estimates where HLL needs inclusion-exclusion on
    biased maxima. Estimator is the textbook (k-1)/u_k in pure integer
    arithmetic (hash scale 2^60, floor division), exact-count branch
    below k — sf0.001's 15 users exercise the exact branch, sf0.01+'s
    150+ the estimator branch, so the gate proves both. The hash domain
    is 40-bit (first 10 md5 hex chars), not 60: (k-1)*scale must fit
    in int64 under ANSI overflow checking — 63*2^60 throws on both
    engines. Shuffle: one
    distinct on (type, user), then sketches are <=k-element arrays —
    mergeable bounded state, the 100 TB contract for every sketch in
    sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv_"), F.col("user_id"))), 1, 10),
        16,
        10,
    ).cast("bigint")
    du = ev.select("event_type", h.alias("h")).distinct()
    sk = du.groupBy("event_type").agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, _KMV_K).alias("sketch"),
        F.count(F.lit(1)).alias("nd"),
    )
    est = sk.select(
        "event_type",
        "sketch",
        F.when(F.col("nd") < _KMV_K, F.col("nd"))
        .otherwise(
            F.expr(
                f"({_KMV_K} - 1) * CAST({_KMV_SCALE} AS BIGINT)"
                f" DIV element_at(sketch, {_KMV_K})"
            )
        )
        .alias("est_distinct"),
    )
    a = est.select(
        F.col("event_type").alias("type_a"),
        F.col("sketch").alias("sk_a"),
        F.col("est_distinct").alias("est_a"),
    )
    b = est.select(
        F.col("event_type").alias("type_b"),
        F.col("sketch").alias("sk_b"),
        F.col("est_distinct").alias("est_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b")).withColumn(
        "merged",
        F.array_sort(F.array_distinct(F.concat("sk_a", "sk_b"))),
    )
    est_union = F.when(
        F.size("merged") < _KMV_K, F.size("merged").cast("bigint")
    ).otherwise(
        F.expr(
            f"({_KMV_K} - 1) * CAST({_KMV_SCALE} AS BIGINT)"
            f" DIV element_at(merged, {_KMV_K})"
        )
    )
    return pairs.select(
        "type_a",
        "type_b",
        "est_a",
        "est_b",
        est_union.alias("est_union"),
        (F.col("est_a") + F.col("est_b") - est_union).alias(
            "est_intersection"
        ),
    )


@query(
    "e21_theil_sen_trend",
    sql="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE))::BIGINT AS d,
             COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ), slopes AS (
      SELECT a.event_type,
             (b.n - a.n)::DOUBLE / (b.d - a.d) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ), arr AS (
      SELECT event_type, list_sort(list(slope)) AS s, COUNT(*)::BIGINT AS m
      FROM slopes GROUP BY event_type
    )
    SELECT event_type, m AS n_pairs,
           s[CAST(ceil(m / 2.0) AS INTEGER)] AS theil_sen_slope
    FROM arr
    """,
)
def e21_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimate per event type: the median of
    all pairwise slopes of the daily-count series — the
    breakdown-point-29% alternative to e13's least squares (one wild
    day moves OLS, not the pairwise-slope median). Scale argument: the
    pair space is quadratic in the NUMBER OF DAYS, not the number of
    events — the fact aggregates to (type, day) grain first (map-side
    combine), so 30 observed days make ≤435 slope pairs per type no
    matter how many billions of events feed them; time-bounded, like
    dq8. Exactness: slopes are one IEEE division on exact integers;
    the median is the LOWER median (element ceil(m/2) of the sorted
    list, e15's convention) so no averaging of middle elements — both
    engines pick the identical stored double."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("2024-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a = daily.select(
        "event_type", F.col("d").alias("da"), F.col("n").alias("na")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("d").alias("db"),
        F.col("n").alias("nb"),
    )
    slopes = a.join(
        b, (F.col("event_type") == F.col("et_b")) & (F.col("da") < F.col("db"))
    ).select(
        "event_type",
        ((F.col("nb") - F.col("na")).cast("double") / (F.col("db") - F.col("da"))).alias(
            "slope"
        ),
    )
    arr = slopes.groupBy("event_type").agg(
        F.array_sort(F.collect_list("slope")).alias("s"),
        F.count(F.lit(1)).alias("m"),
    )
    return arr.select(
        "event_type",
        F.col("m").alias("n_pairs"),
        F.element_at(
            "s", F.ceil(F.col("m") / F.lit(2.0)).cast("int")
        ).alias("theil_sen_slope"),
    )


@query(
    "e22_ohlc_resample",
    sql="""
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           (MIN(struct_pack(t := epoch_us(ts), e := event_id,
                            v := value))).v AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           (MAX(struct_pack(t := epoch_us(ts), e := event_id,
                            v := value))).v AS close,
           COUNT(*)::BIGINT AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def e22_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling (the timeseries downsampling staple): per
    (series, day) the first/last/extreme values, in ONE combinable
    aggregate — open/close are MIN/MAX over struct(ts, event_id, value)
    (lexicographic struct comparison, the c8 golden-record idiom: the
    unique event_id decides ties before value can), so no window, no
    per-group sort, and partial aggregates merge on any partitioning.
    Volume folds in decimal. Map-side combine does the heavy lifting:
    shuffle carries one row per (series, day, partition)."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("event_id").alias("e"),
        F.col("value").alias("v"),
    )
    return ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(
        F.min(key)["v"].alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(key)["v"].alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("volume"),
    )


_GEO_SPAN = 1000      # synthetic coordinate space [0, 1000)^2
_GEO_R = 50           # neighbor radius; grid cell size = radius


@query(
    "j4_grid_neighbor_join",
    sql=f"""
    WITH ca AS (
      SELECT c_custkey AS id_a,
             CAST('0x' || substr(md5('gx_' || c_custkey), 1, 15) AS BIGINT)
               % {_GEO_SPAN} AS xa,
             CAST('0x' || substr(md5('gy_' || c_custkey), 1, 15) AS BIGINT)
               % {_GEO_SPAN} AS ya
      FROM customer
    ), sb AS (
      SELECT s_suppkey AS id_b,
             CAST('0x' || substr(md5('gx_s' || s_suppkey), 1, 15) AS BIGINT)
               % {_GEO_SPAN} AS xb,
             CAST('0x' || substr(md5('gy_s' || s_suppkey), 1, 15) AS BIGINT)
               % {_GEO_SPAN} AS yb
      FROM supplier
    )
    SELECT id_a, id_b,
           (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) AS dist2
    FROM ca, sb
    WHERE (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
          <= {_GEO_R} * {_GEO_R}
    """,
)
def j4_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial neighbor join (all customer/supplier point pairs within
    radius r) via GRID-CELL BLOCKING — the 2D generalization of j2's
    binned range join: cell size = r, so any within-r pair lands in the
    same or an adjacent cell (|Δx| <= r ⇒ adjacent columns); one side
    explodes its 3x3 cell neighborhood and candidates come from a
    cell-keyed equi-join — shuffle carries the point streams keyed by
    cell, NEVER the quadratic pair space the oracle's cross join scans.
    Distance test is integer squared-Euclidean (no sqrt, no trig — libm
    differs across engines; squares don't). Synthetic integer coords
    derive from the shared md5 hash so both engines place every point
    identically. Recall is exact by the cell-size argument — the same
    theorem as j2, one dimension up. At 100 TB: densify-or-die applies
    (g4's lesson) — cell occupancy is the knob, and r-sized cells keep
    candidate fan-out proportional to true neighbor density."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")

    def hcoord(prefix: str, col: str):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), F.col(col))), 1, 15),
            16,
            10,
        ).cast("bigint") % _GEO_SPAN

    ca = cust.select(
        F.col("c_custkey").alias("id_a"),
        hcoord("gx_", "c_custkey").alias("xa"),
        hcoord("gy_", "c_custkey").alias("ya"),
    )
    sb = supp.select(
        F.col("s_suppkey").alias("id_b"),
        hcoord("gx_s", "s_suppkey").alias("xb"),
        hcoord("gy_s", "s_suppkey").alias("yb"),
    )
    # a-side explodes its 3x3 neighborhood; b-side registers its own cell
    # (so each within-r pair meets in EXACTLY one cell — no dedup needed)
    a_cells = ca.select(
        "id_a",
        "xa",
        "ya",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.floor(F.col("xa") / _GEO_R) + dx).alias("cx"),
                        (F.floor(F.col("ya") / _GEO_R) + dy).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    )
    b_cells = sb.select(
        "id_b",
        "xb",
        "yb",
        F.struct(
            F.floor(F.col("xb") / _GEO_R).alias("cx"),
            F.floor(F.col("yb") / _GEO_R).alias("cy"),
        ).alias("cell"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a_cells.join(b_cells, "cell")
        .where(d2 <= _GEO_R * _GEO_R)
        .select("id_a", "id_b", d2.alias("dist2"))
    )


_ACF_MAX_LAG = 7


@query(
    "e23_autocorrelation",
    sql=f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE))::BIGINT AS d,
             COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT x.event_type, l.lag, x.n AS xv, y.n AS yv
      FROM daily x
      CROSS JOIN (SELECT CAST(unnest(range(1, {_ACF_MAX_LAG + 1})) AS BIGINT)
                    AS lag) l
      JOIN daily y ON y.event_type = x.event_type AND y.d = x.d + l.lag
    ), mom AS (
      SELECT event_type, lag,
             COUNT(*)::BIGINT AS n_pairs,
             SUM(CAST(xv AS DECIMAL(18,0))) AS sx,
             SUM(CAST(yv AS DECIMAL(18,0))) AS sy,
             SUM(CAST(xv AS DECIMAL(18,0)) * CAST(xv AS DECIMAL(18,0))) AS sxx,
             SUM(CAST(yv AS DECIMAL(18,0)) * CAST(yv AS DECIMAL(18,0))) AS syy,
             SUM(CAST(xv AS DECIMAL(18,0)) * CAST(yv AS DECIMAL(18,0))) AS sxy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag, n_pairs,
           CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS acf
    FROM mom
    """,
)
def e23_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation (Pearson, lags 1..7) of each event type's
    daily-count series — the periodicity screen that pairs with e21's
    trend and dq8's level-shift detector.

    Exactness: the lag pairing is an equi-join on (type, d + lag); all
    five moment sums accumulate in DECIMAL space (order-free,
    overflow-safe to ~1e9-events/day in the 18,0 per-row factor caps);
    the Pearson assembly then runs in a FIXED double expression tree —
    products, subtractions, two correctly-rounded sqrts, one division —
    identical on both engines. Zero-variance series return NULL through
    the identical CASE guard (Spark's non-ANSI x/0.0 -> NULL vs DuckDB
    inf would otherwise diverge).

    Scale: like e21/dq8, everything after the first map-side-combined
    groupBy is time-bounded — (type, day) grain, so the lag join and
    moment aggregation touch #days*7 rows per type no matter how many
    billions of raw events feed the dailies."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("2024-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    lags = F.array(
        *[F.lit(i).cast("bigint") for i in range(1, _ACF_MAX_LAG + 1)]
    )
    x = daily.select(
        "event_type",
        "d",
        F.col("n").alias("xv"),
        F.explode(lags).alias("lag"),
    )
    y = daily.select(
        F.col("event_type").alias("et_y"),
        F.col("d").alias("dy"),
        F.col("n").alias("yv"),
    )
    pairs = x.join(
        y,
        (F.col("event_type") == F.col("et_y"))
        & (F.col("dy") == F.col("d") + F.col("lag")),
    )
    dec = "decimal(18,0)"
    xv, yv = F.col("xv").cast(dec), F.col("yv").cast(dec)
    mom = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(xv).alias("sx"),
        F.sum(yv).alias("sy"),
        F.sum(xv * xv).alias("sxx"),
        F.sum(yv * yv).alias("syy"),
        F.sum(xv * yv).alias("sxy"),
    )
    nd = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    acf = F.when(
        (var_x > 0) & (var_y > 0),
        (nd * sxy - sx * sy) / (F.sqrt(var_x) * F.sqrt(var_y)),
    )
    return mom.select("event_type", "lag", "n_pairs", acf.alias("acf"))


@query(
    "e24_holt_smoothing",
    sql="""
    WITH RECURSIVE counts AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::BIGINT AS n_events
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT event_type, day, n_events,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM counts
    ), rec AS (
      SELECT event_type, day, n_events, i,
             CAST(n_events AS DOUBLE) AS level,
             CAST(0.0 AS DOUBLE) AS trend
      FROM seq WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.day, s.n_events, s.i,
             0.5 * CAST(s.n_events AS DOUBLE) + 0.5 * (r.level + r.trend),
             0.25 * ((0.5 * CAST(s.n_events AS DOUBLE)
                      + 0.5 * (r.level + r.trend)) - r.level)
               + 0.75 * r.trend
      FROM seq s
      JOIN rec r ON s.event_type = r.event_type AND s.i = r.i + 1
    )
    SELECT event_type, day, n_events, level, trend,
           level + trend AS forecast_next
    FROM rec
    """,
)
def e24_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend, alpha = 1/2,
    beta = 1/4) over each event type's daily-count series, with the
    one-step-ahead forecast — completes the local-level family next to
    e11's EWMA (level only) and e21's global Theil–Sen slope.

    Exactness: a 2-state sequential recurrence, so the dq8 discipline —
    Spark folds the sorted (day, count) array per type with an
    `aggregate` whose step is a FIXED double expression tree (multiplies
    by the dyadic 1/2, 1/4, 3/4 are exact or correctly rounded; each
    add/subtract one rounding), and the oracle replays the identical
    tree in a recursive CTE, duplicating the level expression textually
    where b_t needs l_t — bit-identical on both engines. Init l_1 = x_1,
    b_1 = 0 on both sides.

    Scale: the heavy reduction is the map-side-combined daily count;
    the fold sees one array per type, bounded by observed days
    (time-bounded state, the dq8/e21/e23 argument). Missing days are
    skipped identically by both engines; e5's spine join fills them in
    a production pipeline."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    per_type = counts.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "n_events"))
        ).alias("series")
    )

    def step(acc, x):
        xn = x["n_events"].cast("double")
        is_first = F.size(acc["out"]) == 0
        l_new = F.when(is_first, xn).otherwise(
            F.lit(0.5) * xn + F.lit(0.5) * (acc["l"] + acc["b"])
        )
        b_new = F.when(is_first, F.lit(0.0)).otherwise(
            F.lit(0.25) * (l_new - acc["l"]) + F.lit(0.75) * acc["b"]
        )
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["day"].alias("day"),
                        x["n_events"].alias("n"),
                        l_new.alias("lv"),
                        b_new.alias("tr"),
                    )
                ),
            ).alias("out"),
        )

    fold = F.aggregate(
        "series",
        F.expr(
            "struct(CAST(0.0 AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b, "
            "CAST(array() AS "
            "array<struct<day:date,n:bigint,lv:double,tr:double>>) AS out)"
        ),
        step,
        lambda acc: acc["out"],
    )
    return per_type.select("event_type", F.explode(fold).alias("r")).select(
        "event_type",
        F.col("r.day").alias("day"),
        F.col("r.n").alias("n_events"),
        F.col("r.lv").alias("level"),
        F.col("r.tr").alias("trend"),
        (F.col("r.lv") + F.col("r.tr")).alias("forecast_next"),
    )


@query(
    "e25_skyline",
    sql="""
    WITH pts AS (
      SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS price_cents
      FROM part
    )
    SELECT p.p_partkey, p.size, p.price_cents
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price_cents <= p.price_cents AND q.size >= p.size
        AND (q.price_cents < p.price_cents OR q.size > p.size)
    )
    """,
)
def e25_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts — minimize retail price,
    maximize size: every part no other part dominates (<= price AND
    >= size, strict in one). The multi-objective shortlist operator
    (cheapest-per-capability curves, best-quality-per-token corpora)
    that a naive engine writes as the oracle's quadratic NOT EXISTS.

    Shape: two phases, both shuffle-light. (1) Coarse prune: bucket
    price_cents into $100 bands, take each band's max size (one
    map-side-combined aggregate on a TINY table), prefix-max it over
    bands (window over #bands rows), broadcast back — a point below its
    strictly-cheaper bands' running max is dominated (transitively by a
    skyline point, which the prune provably never drops). (2) Exact pass
    on the survivors — by construction a staircase-sized set — with two
    windows: strictly-cheaper running max (RANGE .. 1 PRECEDING, so
    equal prices never dominate through it) and the same-price max for
    the within-tie strict check. Duplicate (price, size) points all
    survive, matching NOT EXISTS semantics. All comparisons in int64
    cents — no float dominance ties."""
    part = load_table(spark, sf_dir, "part")
    pts = part.select(
        "p_partkey",
        F.col("p_size").cast("bigint").alias("size"),
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    b = pts.withColumn("bucket", F.expr("price_cents div 10000"))
    bmax = b.groupBy("bucket").agg(F.max("size").alias("bmax"))
    w_pre = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pre = bmax.select(
        "bucket", F.max("bmax").over(w_pre).alias("pre_max")
    )
    surv = b.join(F.broadcast(pre), "bucket").where(
        F.col("pre_max").isNull() | (F.col("size") > F.col("pre_max"))
    )
    w_cheaper = Window.orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_tie = Window.partitionBy("price_cents")
    ex = surv.select(
        "p_partkey",
        "size",
        "price_cents",
        F.max("size").over(w_cheaper).alias("m_cheaper"),
        F.max("size").over(w_tie).alias("m_tie"),
    )
    return ex.where(
        (F.col("m_cheaper").isNull() | (F.col("size") > F.col("m_cheaper")))
        & (F.col("size") == F.col("m_tie"))
    ).select("p_partkey", "size", "price_cents")


@query(
    "e26_seasonal_index",
    sql="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             isodow(ts) - 1 AS dow,
             COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2, 3
    ), per_dow AS (
      SELECT event_type, dow,
             SUM(n)::BIGINT AS dow_events,
             COUNT(*)::BIGINT AS dow_days
      FROM daily GROUP BY 1, 2
    ), per_type AS (
      SELECT event_type,
             SUM(n)::BIGINT AS tot_events,
             COUNT(*)::BIGINT AS tot_days
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, d.dow, d.dow_events, d.dow_days,
           CAST(d.dow_events * t.tot_days AS DOUBLE)
             / CAST(d.dow_days * t.tot_events AS DOUBLE) AS seasonal_index
    FROM per_dow d JOIN per_type t USING (event_type)
    """,
)
def e26_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type: mean daily count on
    that weekday divided by the overall mean daily count — the
    multiplicative seasonality screen that pairs with e23's lag-7
    autocorrelation. Index 1.0 = no weekday effect.

    Exactness: the ratio of two means collapses algebraically to
    (dow_events * tot_days) / (dow_days * tot_events) — both products
    exact int64 — so the index is ONE correctly-rounded double
    division, no intermediate float means. Weekday numbering pinned to
    Monday=0 on both engines (Spark `weekday`, DuckDB `isodow - 1`).

    Scale: everything past the map-side-combined daily aggregate is
    (type, day)-grain; the totals join is type-cardinality (broadcast)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.weekday("ts").cast("bigint").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.sum("n").alias("dow_events"),
        F.count(F.lit(1)).alias("dow_days"),
    )
    per_type = daily.groupBy("event_type").agg(
        F.sum("n").alias("tot_events"),
        F.count(F.lit(1)).alias("tot_days"),
    )
    j = per_dow.join(F.broadcast(per_type), "event_type")
    idx = (F.col("dow_events") * F.col("tot_days")).cast("double") / (
        F.col("dow_days") * F.col("tot_events")
    ).cast("double")
    return j.select(
        "event_type", "dow", "dow_events", "dow_days",
        idx.alias("seasonal_index"),
    )


@query(
    "dq11_changepoint",
    sql="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT event_type, day, n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
             SUM(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS s,
             COUNT(*) OVER (PARTITION BY event_type)::BIGINT AS nd,
             SUM(n) OVER (PARTITION BY event_type)::BIGINT AS tot
      FROM daily
    ), dev AS (
      SELECT event_type, day, t, nd, tot,
             abs(s * nd - t * tot)::BIGINT AS deviation
      FROM seq WHERE t < nd
    )
    , best AS (
      SELECT event_type,
             MAX({'deviation': deviation, 'negt': -t, 'day': day}) AS b,
             arbitrary(nd) AS n_days,
             arbitrary(tot) AS total_events
      FROM dev GROUP BY event_type
    )
    SELECT event_type, b.day AS change_day, b.deviation AS deviation,
           n_days, total_events
    FROM best
    """,
)
def dq11_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point locator per event type (CUSUM / binary
    segmentation first split): the day t maximizing |S_t*N - t*T| —
    the integer-scaled deviation of the prefix sum from the no-change
    diagonal. dq8 raises the ALARM that drift exists; this names WHEN
    the level shifted (ties broken earliest).

    Exactness: S_t, N, T are exact bigints, the deviation is one int64
    product difference, and the argmax is a lexicographic max over
    (deviation, -t) structs — bit-identical both engines. The last day
    (t = N) is excluded: a split there is no split.

    Scale: one key-partitioned window over the (type, day) grain series
    — day-bounded state, the dq8 argument — then a type-grain argmax."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_all = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        "day",
        F.row_number().over(w_ord).alias("t"),
        F.sum("n")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("s"),
        F.count(F.lit(1)).over(w_all).alias("nd"),
        F.sum("n").over(w_all).alias("tot"),
    )
    dev = seq.where(F.col("t") < F.col("nd")).select(
        "event_type",
        "day",
        "t",
        "nd",
        "tot",
        F.abs(F.col("s") * F.col("nd") - F.col("t") * F.col("tot")).alias(
            "deviation"
        ),
    )
    best = dev.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.col("deviation"), (-F.col("t")).alias("negt"), F.col("day")
            )
        ).alias("b"),
        F.first("nd").alias("n_days"),
        F.first("tot").alias("total_events"),
    )
    return best.select(
        "event_type",
        F.col("b.day").alias("change_day"),
        F.col("b.deviation").alias("deviation"),
        "n_days",
        "total_events",
    )


@query(
    "g11_clustering_coefficient",
    sql="""
    WITH hi AS (
      SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 45
    ),
    und AS (
      SELECT DISTINCT CAST(a.l_suppkey AS BIGINT) AS u,
                      CAST(b.l_suppkey AS BIGINT) AS v
      FROM hi a
      JOIN hi b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    deg AS (
      SELECT node, COUNT(*)::BIGINT AS degree FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM und e1
      JOIN und e2 ON e2.u = e1.v
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tcount AS (
      SELECT node, COUNT(*)::BIGINT AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT d.node, d.degree,
           COALESCE(t.n_triangles, 0)::BIGINT AS n_triangles,
           CAST(2 * COALESCE(t.n_triangles, 0) AS DOUBLE)
             / CAST(d.degree * (d.degree - 1) AS DOUBLE) AS clustering_coeff
    FROM deg d LEFT JOIN tcount t ON t.node = d.node
    WHERE d.degree >= 2
    """,
)
def g11_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per supplier over g4's high-quantity
    co-supply graph: 2*T(v) / (d(v)*(d(v)-1)) — what fraction of a
    node's neighbor pairs are themselves connected. The per-node
    refinement of g4's raw triangle counts; with g10's assortativity it
    completes the standard graph-structure battery.

    Exactness: T and d are exact bigints, so the coefficient is ONE
    correctly-rounded double division (numerator doubled in int space).
    Degree-1 nodes are excluded (undefined denominator); triangle-free
    nodes keep an explicit 0. Scale: inherits g4's degree-ordered
    orientation (wedge fan-out capped at O(sqrt(E)) per node) and the
    constant-average-degree blocking argument; the degree table is
    node-sized and its join is a key equi-join."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    a = li.select("l_orderkey", F.col("l_suppkey").alias("sa"))
    b = li.select("l_orderkey", F.col("l_suppkey").alias("sb"))
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .distinct()
    )
    deg = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = _graph.triangle_counts(und, src="src", dst="dst")
    j = deg.where(F.col("degree") >= 2).join(tri, "node", "left")
    t = F.coalesce(F.col("n_triangles"), F.lit(0).cast("bigint"))
    coeff = (F.lit(2).cast("bigint") * t).cast("double") / (
        F.col("degree") * (F.col("degree") - 1)
    ).cast("double")
    return j.select(
        "node",
        "degree",
        t.alias("n_triangles"),
        coeff.alias("clustering_coeff"),
    )


@query(
    "e27_rolling_wau",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), contrib AS (
      SELECT user_id, day + CAST(o AS INTEGER) AS end_day
      FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o)
    ), wau AS (
      SELECT end_day AS day, COUNT(DISTINCT user_id)::BIGINT AS wau
      FROM contrib GROUP BY 1
    ), dau AS (
      SELECT day, COUNT(*)::BIGINT AS dau FROM ud GROUP BY day
    )
    SELECT d.day, d.dau, w.wau,
           CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
    FROM dau d JOIN wau w ON w.day = d.day
    """,
)
def e27_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling 7-day distinct users per observed day (DAU / WAU /
    stickiness) — the product-analytics headline metric. Spark windows
    cannot express a rolling COUNT DISTINCT (frames aggregate, they
    don't dedup), so the decomposition: dedup to (user, day) grain
    first, then each user-day CONTRIBUTES to the 7 window-end days it
    falls in (a bounded 7x explode — the e5 date-spine trick inverted)
    and one distinct-count per end day. sk7 is this metric's mergeable
    HLL approximation; this is the exact twin, and stickiness is one
    double division of two exact bigints.

    Scale: the heavy dedup is one map-side-combinable distinct at
    (user, day) grain; the 7x fan-out happens AFTER dedup (bounded by
    7 x active-user-days, not raw events); the final distinct shuffles
    on day — date-bounded key space. Days with no activity report no
    row (e5's spine fills them)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    offsets = F.array(*[F.lit(i) for i in range(7)])
    contrib = ud.select(
        "user_id", "day", F.explode(offsets).alias("o")
    ).select(
        "user_id", F.date_add(F.col("day"), F.col("o")).alias("end_day")
    )
    wau = contrib.groupBy(F.col("end_day").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


@query(
    "e28_survival_curve",
    sql="""
    WITH RECURSIVE spans AS (
      SELECT user_id,
             date_diff('day',
                       MIN(CAST(date_trunc('day', ts) AS DATE)),
                       MAX(CAST(date_trunc('day', ts) AS DATE)))::BIGINT
               AS tenure,
             MAX(CAST(date_trunc('day', ts) AS DATE)) AS last_day
      FROM events GROUP BY user_id
    ), cutoff AS (
      SELECT MAX(last_day) AS maxday FROM spans
    ), per_t AS (
      SELECT tenure,
             SUM(CASE WHEN last_day < maxday THEN 1 ELSE 0 END)::BIGINT
               AS deaths,
             SUM(CASE WHEN last_day = maxday THEN 1 ELSE 0 END)::BIGINT
               AS censored
      FROM spans, cutoff GROUP BY tenure
    ), seq AS (
      SELECT tenure, deaths, censored,
             SUM(deaths + censored) OVER (
               ORDER BY tenure DESC ROWS UNBOUNDED PRECEDING
             )::BIGINT AS n_risk,
             ROW_NUMBER() OVER (ORDER BY tenure) AS i
      FROM per_t
    ), rec AS (
      SELECT tenure, deaths, censored, n_risk, i,
             1.0 * (1.0 - CAST(deaths AS DOUBLE) / CAST(n_risk AS DOUBLE))
               AS survival
      FROM seq WHERE i = 1
      UNION ALL
      SELECT s.tenure, s.deaths, s.censored, s.n_risk, s.i,
             r.survival
               * (1.0 - CAST(s.deaths AS DOUBLE) / CAST(s.n_risk AS DOUBLE))
      FROM seq s JOIN rec r ON s.i = r.i + 1
    )
    SELECT tenure, n_risk, deaths, censored, survival FROM rec
    """,
)
def e28_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve over user TENURE (days from first to
    last event): users whose last activity predates the observation
    cutoff are churn events at their tenure; users active on the cutoff
    day are right-CENSORED — the estimator m10's cohort grid cannot
    produce, because KM uses censored users' partial exposure instead
    of dropping them. S(t) = prod_{i<=t} (1 - d_i/n_i).

    Exactness: d_t and the at-risk suffix sums n_t are exact bigints;
    the survival product is a SEQUENTIAL double fold over the sorted
    tenure grain — one division, one subtraction, one multiply per
    step, identical tree both engines (the e24/dq8 recurrence
    discipline; the oracle replays it as a recursive CTE).

    Scale: one (user) aggregate for spans, a 1-row cutoff broadcast,
    then everything is TENURE-grain (day-bounded): the desc-cumsum
    window and the fold see #distinct-tenure rows no matter how many
    billions of events feed the spans."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    spans = ev.groupBy("user_id").agg(
        F.datediff(F.max(day), F.min(day)).cast("bigint").alias("tenure"),
        F.max(day).alias("last_day"),
    )
    cutoff = spans.agg(F.max("last_day").alias("maxday"))
    per_t = spans.crossJoin(F.broadcast(cutoff)).groupBy("tenure").agg(
        F.sum(
            F.when(F.col("last_day") < F.col("maxday"), 1).otherwise(0)
        ).cast("bigint").alias("deaths"),
        F.sum(
            F.when(F.col("last_day") == F.col("maxday"), 1).otherwise(0)
        ).cast("bigint").alias("censored"),
    )
    w_desc = (
        Window.orderBy(F.desc("tenure"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = per_t.select(
        "tenure",
        "deaths",
        "censored",
        F.sum(F.col("deaths") + F.col("censored"))
        .over(w_desc)
        .cast("bigint")
        .alias("n_risk"),
    )
    one_group = seq.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("tenure", "deaths", "censored", "n_risk"))
        ).alias("series")
    )

    def step(acc, x):
        s_new = acc["s"] * (
            F.lit(1.0)
            - x["deaths"].cast("double") / x["n_risk"].cast("double")
        )
        return F.struct(
            s_new.alias("s"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["tenure"].alias("tenure"),
                        x["n_risk"].alias("n_risk"),
                        x["deaths"].alias("deaths"),
                        x["censored"].alias("censored"),
                        s_new.alias("survival"),
                    )
                ),
            ).alias("out"),
        )

    fold = F.aggregate(
        "series",
        F.expr(
            "struct(CAST(1.0 AS DOUBLE) AS s, CAST(array() AS "
            "array<struct<tenure:bigint,n_risk:bigint,deaths:bigint,"
            "censored:bigint,survival:double>>) AS out)"
        ),
        step,
        lambda acc: acc["out"],
    )
    return one_group.select(F.explode(fold).alias("r")).select(
        "r.tenure", "r.n_risk", "r.deaths", "r.censored", "r.survival"
    )


_SEQ_CHAR_SQL = """CASE event_type WHEN 'view' THEN 'v'
                        WHEN 'click' THEN 'c'
                        WHEN 'purchase' THEN 'p'
                        WHEN 'error' THEN 'e'
                        ELSE 'x' END"""
_SEQ_PATTERN = "v[^e]*c[^e]*p"


@query(
    "e29_sequence_match",
    sql=f"""
    WITH ev AS (
      SELECT user_id, ts, event_id, {_SEQ_CHAR_SQL} AS ch FROM events
    ), seqs AS (
      SELECT user_id,
             string_agg(ch, '' ORDER BY ts, event_id) AS seq
      FROM ev GROUP BY user_id
    )
    SELECT user_id,
           length(seq)::BIGINT AS n_events,
           regexp_matches(seq, '{_SEQ_PATTERN}') AS matched
    FROM seqs
    """,
)
def e29_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over per-user event streams — the
    MATCH_RECOGNIZE / Flink-CEP niche: does the user's time-ordered
    event sequence contain view -> click -> purchase with NO error
    between the steps? Expressed by encoding each event as one
    character (order pinned by (ts, event_id)) and running ONE regex
    per user over the collapsed sequence string — e10's first-timestamp
    funnel cannot express the 'no intervening error' negation; a regex
    over the ordered alphabet can express any such pattern.

    Exactness: the sequence string is a deterministic ordered fold
    (array_sort on (ts, event_id, char) -> concat), and the pattern
    uses only portable regex (char classes, star) — identical on both
    engines. Scale: one shuffle to user grain; per-user state is the
    encoded sequence (one byte per event — a power user with 10^6
    events is a 1 MB string, fine; beyond that, sessionize first with
    e14 and match per session, which also bounds pattern latency)."""
    ev = load_table(spark, sf_dir, "events")
    seqs = (
        ev.select("user_id", F.struct("ts", "event_id").alias("k"),
                  F.expr(_SEQ_CHAR_SQL).alias("ch"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("k", "ch"))
                    ),
                    lambda s: s["ch"],
                ),
                "",
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.col("seq").rlike(_SEQ_PATTERN).alias("matched"),
    )


@query(
    "e30_session_sequence_match",
    sql=f"""
    WITH ev AS (
      SELECT user_id, ts, event_id, {_SEQ_CHAR_SQL} AS ch FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id, ch,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, ch,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM flagged
    ), seqs AS (
      SELECT user_id, session_id,
             string_agg(ch, '' ORDER BY ts, event_id) AS seq
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           length(seq)::BIGINT AS n_events,
           regexp_matches(seq, '{_SEQ_PATTERN}') AS matched
    FROM seqs
    """,
)
def e30_session_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e29's CEP pattern evaluated PER SESSION (e14's 30-minute-gap
    islands): did this visit convert cleanly — view -> click -> purchase
    with no error inside ONE session? This is both the semantically
    right funnel grain (cross-day matches are rarely meaningful) and
    e29's documented heavy-user cap made real: per-row state is now
    bounded by session length, not lifetime history, so a years-long
    power user costs the same as a new one.

    Exactness: session islands from the same integer-microsecond gap
    rule as e14 (lag + cumsum, (ts, event_id)-pinned), then the e29
    ordered-fold + portable regex per (user, session). One user-grain
    shuffle serves both the islands and the per-session fold."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    flagged = ev.select(
        "user_id", "ts", "event_id", F.expr(_SEQ_CHAR_SQL).alias("ch"),
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 1800000000), 1
        ).otherwise(0).alias("new_session"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("bigint"),
    )
    seqs = (
        sess.select(
            "user_id", "session_id",
            F.struct("ts", "event_id").alias("k"), "ch",
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "ch"))),
                    lambda s: s["ch"],
                ),
                "",
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        "session_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.col("seq").rlike(_SEQ_PATTERN).alias("matched"),
    )


@query(
    "e31_topk_with_ties",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk::INT AS rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             RANK() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC
             ) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def e31_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer WITH TIES (RANK, not row_number): when
    the third-largest amount repeats, every tied order qualifies — the
    semantics leaderboards and audit samples usually actually want; e2's
    row_number variant silently drops tied rows on an arbitrary
    physical order unless a tiebreak column is pinned. One key-
    partitioned window; output size is k plus tie overflow, never more
    than the group."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


# --- e33: time-weighted average (TWAP) ---------------------------------------


@query(
    "e33_time_weighted_average",
    sql="""
    WITH seg AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS t0,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts,
                                      event_id) AS t1
      FROM events
    ), held AS (
      SELECT user_id, cents, t1 - t0 AS dur_us
      FROM seg WHERE t1 IS NOT NULL AND t1 > t0
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dur_us) AS BIGINT) AS held_us,
           CAST(SUM(CAST(cents AS HUGEINT) * dur_us) * 100
                // SUM(dur_us) AS BIGINT) AS twap_centicents
    FROM held GROUP BY user_id
    """,
)
def e33_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) per user — the metric that makes
    irregularly-sampled observations comparable (a value held for an
    hour must outweigh one held a second; the plain AVG the reference's
    dashboard uses cannot say this): each event's value is HELD until
    the user's next event (lead window), weighted by the exact
    integer-microsecond duration, and the weighted mean lands as
    centi-cents via a HUGEINT/DECIMAL-widened integer division
    (cents x dur_us sums reach ~1e17 per segment — the m33 hazard
    class again). Zero-duration and final open segments drop on both
    engines identically.

    Scale shape: ONE (user_id) exchange feeds the lead window and the
    user-grain combine — the e14 sessionize plan shape; value mass
    never reshuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t0"),
        F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        .alias("t1"),
    )
    held = seg.where(
        F.col("t1").isNotNull() & (F.col("t1") > F.col("t0"))
    ).select("user_id", "cents", (F.col("t1") - F.col("t0")).alias("dur_us"))
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("dur_us").cast("bigint").alias("held_us"),
        F.expr(
            # widened AT BIRTH (ADVICE r10): each term is
            # DECIMAL(38,0) BEFORE the sum on BOTH engines (oracle sums
            # HUGEINT terms) — SUM over int64 terms would wrap silently
            # on the Spark side only once per-user cents x dur_us mass
            # passes ~9.2e18 (measured ~2.2e16 at sf0.1: two decades of
            # headroom, not a guarantee).
            "CAST(SUM(CAST(cents AS DECIMAL(38,0)) * dur_us) * 100"
            " div SUM(dur_us) AS BIGINT)"
        ).alias("twap_centicents"),
    )
