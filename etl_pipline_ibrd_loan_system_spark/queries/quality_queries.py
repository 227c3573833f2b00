"""Data-quality query catalog (operators/quality.py): an expectation
suite and a column profiler over the warehouse tables, both
oracle-paired.

dq1 unions three check families — row-level violations (one aggregate
pass), referential orphans (anti-join count), key uniqueness — into the
long (check_name, metric, passed) report a publish gate consumes.
dq2 profiles every customer column in one Expand-planned aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import quality
from . import query


@query(
    "dq1_expectation_checks",
    sql="""
    SELECT * FROM (
      SELECT 'orders_nonpositive_total' AS check_name,
             SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS metric,
             SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) <= 0 AS passed
      FROM orders
      UNION ALL
      SELECT 'orders_null_custkey',
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) <= 0
      FROM orders
      UNION ALL
      SELECT 'orders_bad_status',
             SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)::BIGINT,
             SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) <= 0
      FROM orders
      UNION ALL
      SELECT 'orders_date_out_of_range',
             SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                       OR o_orderdate >= TIMESTAMP '2010-01-01'
                      THEN 1 ELSE 0 END)::BIGINT,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                       OR o_orderdate >= TIMESTAMP '2010-01-01'
                      THEN 1 ELSE 0 END) <= 0
      FROM orders
      UNION ALL
      SELECT 'lineitem_orphan_orderkey',
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))::BIGINT,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) = 0
      UNION ALL
      SELECT 'orders_orphan_custkey',
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))::BIGINT,
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)) = 0
      UNION ALL
      SELECT 'orders_duplicate_orderkey',
             (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)::BIGINT,
             (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) = 0
    )
    """,
)
def dq1_expectation_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-gate expectation suite: the four row-level checks fold
    into ONE orders scan (violation_checks), the two FK checks are
    key-projected broadcast anti-join counts, uniqueness is one
    count-minus-distinct aggregate. The union is seven 1-row frames —
    the driver never touches row data."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    row_checks = quality.violation_checks(
        orders,
        [
            quality.Check("orders_nonpositive_total", F.col("o_totalprice") <= 0),
            quality.Check("orders_null_custkey", F.col("o_custkey").isNull()),
            quality.Check(
                "orders_bad_status", ~F.col("o_orderstatus").isin("O", "F", "P")
            ),
            quality.Check(
                "orders_date_out_of_range",
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2010-01-01").cast("timestamp")),
            ),
        ],
    )
    return (
        row_checks.unionAll(
            quality.fk_orphan_count(
                li, "l_orderkey", orders, "o_orderkey", "lineitem_orphan_orderkey"
            )
        )
        .unionAll(
            quality.fk_orphan_count(
                orders, "o_custkey", cust, "c_custkey", "orders_orphan_custkey"
            )
        )
        .unionAll(
            quality.duplicate_key_count(
                orders, "o_orderkey", "orders_duplicate_orderkey"
            )
        )
    )


@query(
    "dq2_table_profile",
    sql="""
    SELECT * FROM (
      SELECT 'c_custkey' AS "column", COUNT(*)::BIGINT AS n_rows,
             SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
             COUNT(DISTINCT c_custkey)::BIGINT AS n_distinct,
             MIN(c_custkey)::VARCHAR AS min_value,
             MAX(c_custkey)::VARCHAR AS max_value
      FROM customer
      UNION ALL
      SELECT 'c_name', COUNT(*)::BIGINT,
             SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)::BIGINT,
             COUNT(DISTINCT c_name)::BIGINT,
             MIN(c_name), MAX(c_name)
      FROM customer
      UNION ALL
      SELECT 'c_mktsegment', COUNT(*)::BIGINT,
             SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)::BIGINT,
             COUNT(DISTINCT c_mktsegment)::BIGINT,
             MIN(c_mktsegment), MAX(c_mktsegment)
      FROM customer
      UNION ALL
      SELECT 'c_nationkey', COUNT(*)::BIGINT,
             SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
             COUNT(DISTINCT c_nationkey)::BIGINT,
             MIN(c_nationkey)::VARCHAR, MAX(c_nationkey)::VARCHAR
      FROM customer
    )
    """,
)
def dq2_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: nulls / distincts / min / max for four customer
    columns in ONE Expand-planned aggregate (the oracle's four scans
    collapse to one in the Spark plan — same trade q11/q18 make
    against their SQL texts)."""
    cust = load_table(spark, sf_dir, "customer")
    return quality.profile_table(
        cust, ["c_custkey", "c_name", "c_mktsegment", "c_nationkey"]
    )


@query(
    "dq3_group_outliers",
    sql="""
    WITH q AS (
      SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS val2
      FROM events
    ),
    sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(val2 AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(val2 AS DECIMAL(12,2)) *
                      CAST(val2 AS DECIMAL(12,2))) AS DOUBLE) AS sxx
      FROM q GROUP BY event_type
    )
    SELECT event_id, event_type, val2,
           ROUND((val2 - sx / n)
                 / SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS zscore
    FROM q JOIN sums USING (event_type)
    WHERE ABS((val2 - sx / n)
              / SQRT((sxx - sx * sx / n) / (n - 1))) > 3.0
    """,
)
def dq3_group_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly detection: events whose value sits more
    than 3 sample standard deviations from their event type's mean —
    the screening pass a data-quality monitor runs before ingesting a
    batch. The metric is defined over cent-quantized values (one
    double->DECIMAL(12,2) cast, identical on both engines) so the
    mean/stddev power sums are EXACT decimal arithmetic (associative,
    mergeable — the d14 discipline; built-in stddev_samp folds raw
    doubles in partition order and would drift in the last ulp). The z
    then evaluates in double with identical association; sqrt and
    division are correctly rounded, so the >3.0 gate never disagrees
    cross-engine. Plan: one map-side-combined aggregate (one row per
    event type) broadcast back onto the scan — two narrow passes, zero
    wide shuffles."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(12,2)").cast("double").alias("val2"),
    )
    dx = F.col("val2").cast("decimal(12,2)")
    sums = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dx * dx).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    z = (F.col("val2") - sx / n) / F.sqrt((sxx - sx * sx / n) / (n - 1))
    return (
        q.join(F.broadcast(sums), "event_type")
        .where(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            "val2",
            F.round(z, 6).alias("zscore"),
        )
    )


@query(
    "dq5_benford_screen",
    sql="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS first_digit
      FROM orders WHERE o_totalprice >= 1
    ), obs AS (
      SELECT first_digit, COUNT(*) AS n FROM digits GROUP BY first_digit
    ), tot AS (
      SELECT SUM(n) AS total FROM obs
    )
    SELECT first_digit, n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS observed_p,
           CAST(floor(1000000 * (CAST(first_digit + 1 AS DOUBLE) / CAST(first_digit AS DOUBLE)))
                AS BIGINT) AS benford_ratio_ppm,
           abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
               - (CAST(first_digit + 1 AS DOUBLE) / CAST(first_digit AS DOUBLE) - 1.0)
                 / 1.0) > 0.05 AS flagged_rough
    FROM obs, tot
    """,
)
def dq5_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over order totals: observed first-digit
    distribution next to a log-free Benford reference. The canonical
    expected frequency is log10(1+1/d); to stay inside this repo's
    no-transcendentals cross-engine discipline the reference is carried
    as the exact rational ratio (d+1)/d in ppm (monotone in the Benford
    probability, so the flag threshold is a fixed affine transform away)
    and the rough flag compares observed p against (d+1)/d - 1 — a
    deliberately simple fraud-screen shape. One projection (first digit
    via integer/string ops, no pow/log), one 9-key aggregate, a one-row
    total broadcast back: nothing here grows with data volume except
    the initial scan, so the screen is free at 100 TB."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("first_digit")
    )
    obs = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    from ..cache import pin

    obs = pin(obs)
    tot = obs.agg(F.sum("n").alias("total"))
    d = F.col("first_digit").cast("double")
    observed_p = F.col("n").cast("double") / F.col("total").cast("double")
    ratio = (d + F.lit(1.0)) / d
    return obs.join(F.broadcast(tot)).select(
        "first_digit",
        "n",
        observed_p.alias("observed_p"),
        F.floor(F.lit(1000000.0) * ratio).cast("bigint").alias("benford_ratio_ppm"),
        (F.abs(observed_p - (ratio - F.lit(1.0)) / F.lit(1.0)) > 0.05).alias(
            "flagged_rough"
        ),
    )


_TOKENIZE_SALT = "etl2024"


@query(
    "b15_pii_tokenize",
    sql=f"""
    WITH tc AS (
      SELECT sha256('{_TOKENIZE_SALT}' || CAST(c_custkey AS VARCHAR))
               AS custkey_token,
             c_mktsegment
      FROM customer
    ), toj AS (
      SELECT sha256('{_TOKENIZE_SALT}' || CAST(o_custkey AS VARCHAR))
               AS custkey_token,
             o_totalprice
      FROM orders
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           MIN(custkey_token) AS min_token
    FROM toj JOIN tc USING (custkey_token)
    GROUP BY c_mktsegment
    """,
)
def b15_pii_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII tokenization (salted-hash masking) that
    PRESERVES JOINABILITY — the standard governance transform for
    shipping warehouse extracts without raw identifiers: both the fact
    and the dimension tokenize the customer key with the same salted
    SHA-256, and the join runs entirely on tokens. The oracle computes
    the identical tokens (Spark sha2(...,256) == DuckDB sha256, both
    lowercase hex over identical salted strings), joins on them, and
    must reproduce the per-segment order counts AND the minimum token
    value — proving the mask is deterministic, collision-free at this
    scale, and join-transparent. Pure projection + one token-keyed
    join: the mask adds zero shuffles over the unmasked plan (and the
    token join keys hash-distribute exactly like the raw keys did)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def token(col: str) -> F.Column:
        return F.sha2(
            F.concat(F.lit(_TOKENIZE_SALT), F.col(col).cast("string")), 256
        )

    tc = cust.select(
        token("c_custkey").alias("custkey_token"), "c_mktsegment"
    )
    toj = orders.select(token("o_custkey").alias("custkey_token"))
    return (
        toj.join(tc, "custkey_token")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("custkey_token").alias("min_token"),
        )
    )


@query(
    "dq6_k_anonymity",
    sql="""
    SELECT c_nationkey, c_mktsegment,
           COUNT(*)::BIGINT AS class_size,
           (COUNT(*) < 15) AS violates_k
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def dq6_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity screen on the customer quasi-identifier pair
    (nationkey, market segment) at k=15: every equivalence class with
    its size and violation flag. One hash aggregate at class grain —
    the governance gate that catches re-identifiable rows AFTER direct
    identifiers are scrubbed."""
    from ..operators.quality import k_anonymity

    cust = load_table(spark, sf_dir, "customer")
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment"], k=15)


@query(
    "dq7_l_diversity",
    sql="""
    SELECT c_nationkey,
           COUNT(*)::BIGINT AS class_size,
           COUNT(DISTINCT c_mktsegment)::BIGINT AS sensitive_values,
           (COUNT(DISTINCT c_mktsegment) < 3) AS violates_l
    FROM customer
    GROUP BY c_nationkey
    """,
)
def dq7_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity screen (l=3) with nationkey as the quasi
    identifier and market segment standing in for the sensitive
    attribute: a nation bucket whose members all share one segment
    discloses the segment by membership alone, however large the
    bucket (the homogeneity attack k-anonymity misses)."""
    from ..operators.quality import l_diversity

    cust = load_table(spark, sf_dir, "customer")
    return l_diversity(cust, ["c_nationkey"], "c_mktsegment", l=3)


@query(
    "dq20_t_closeness",
    sql="""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*)::BIGINT AS c_v
      FROM customer GROUP BY 1, 2
    ), sizes AS (
      SELECT c_nationkey, SUM(c_v)::BIGINT AS n_rows FROM cls GROUP BY 1
    ), gcnt AS (
      SELECT c_mktsegment, SUM(c_v)::BIGINT AS g_v FROM cls GROUP BY 1
    ), tot AS (SELECT SUM(g_v)::BIGINT AS n_total FROM gcnt),
    expanded AS (
      SELECT s.c_nationkey, s.n_rows, t.n_total,
             abs(COALESCE(c.c_v, 0) * t.n_total - g.g_v * s.n_rows) AS term
      FROM sizes s CROSS JOIN gcnt g CROSS JOIN tot t
      LEFT JOIN cls c
        ON c.c_nationkey = s.c_nationkey
       AND c.c_mktsegment = g.c_mktsegment
    )
    SELECT c_nationkey,
           MIN(n_rows) AS class_size,
           SUM(term)::BIGINT AS emd_num,
           SUM(term)::DOUBLE / (2.0 * MIN(n_rows) * MIN(n_total)) AS t_value,
           (SUM(term) * 5 > 2 * MIN(n_rows) * MIN(n_total) * 1) AS violates_t
    FROM expanded GROUP BY c_nationkey
    """,
)
def dq20_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness screen (t = 1/5) with nationkey as the quasi
    identifier and market segment as the sensitive attribute — the
    skewness-attack companion dq6/dq7 are missing: a nation bucket
    whose segment mix diverges from the table's discloses segment
    likelihood by membership even when large (k) and diverse (l). The
    equal-ground EMD is computed as an EXACT integer numerator
    (sum_v |c_v*N - g_v*n|) and the violation flag is a cross-
    multiplied integer comparison; the only float is the reported
    t_value division (operators/quality.py::t_closeness). Class x
    category expansion keeps missing segments in the sum — 125 x 5
    grain, never row grain."""
    from ..operators.quality import t_closeness

    cust = load_table(spark, sf_dir, "customer")
    return t_closeness(
        cust, ["c_nationkey"], "c_mktsegment", t_num=1, t_den=5
    )


@query(
    "dq8_cusum_drift",
    sql="""
    WITH RECURSIVE counts AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::BIGINT AS n_events
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT event_type, day, n_events,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM counts
    ), tot AS (
      SELECT event_type, COUNT(*)::BIGINT AS m, SUM(n_events)::BIGINT AS t
      FROM seq GROUP BY 1
    ), rec AS (
      SELECT s.event_type, s.day, s.n_events, s.i,
             GREATEST(0, s.n_events * tot.m - tot.t)::BIGINT AS cusum_scaled
      FROM seq s JOIN tot USING (event_type) WHERE s.i = 1
      UNION ALL
      SELECT s.event_type, s.day, s.n_events, s.i,
             GREATEST(0, r.cusum_scaled + s.n_events * tot.m - tot.t)::BIGINT
      FROM seq s
      JOIN rec r ON s.event_type = r.event_type AND s.i = r.i + 1
      JOIN tot ON tot.event_type = s.event_type
    )
    SELECT rec.event_type, day, n_events, cusum_scaled,
           (cusum_scaled * 2 > tot.t) AS alarm
    FROM rec JOIN tot ON tot.event_type = rec.event_type
    """,
)
def dq8_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM volume-drift screen over the daily event series —
    the streaming-monitoring classic (Page 1954): s_d = max(0,
    s_{d-1} + n_d - mean), alarming when cumulative excess passes h.
    Everything is scaled by the day count m so the recurrence stays in
    BIGINT (s_d' = max(0, s_{d-1}' + n_d*m - total); h = total/2) — no
    float mean, bit-exact across engines. Spark computes the recurrence
    as a per-type `aggregate` fold over the sorted (day, count) array:
    the heavy work is the map-side-combined daily count; the fold only
    ever sees one array per type, bounded by the observed-day count
    (time-bounded state, same argument as e15's rolling frame). The
    oracle replays with a recursive CTE. Days with zero events don't
    appear in the series (both engines skip them identically); a
    production spine-join fills them — e5 is that machinery."""
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
    m = F.size("series").cast("bigint")
    t = F.aggregate(
        "series", F.lit(0).cast("bigint"), lambda acc, x: acc + x["n_events"]
    )
    fold = F.aggregate(
        "series",
        F.expr(
            "struct(CAST(0 AS BIGINT) AS s, "
            "CAST(array() AS array<struct<day:date,n:bigint,c:bigint>>) "
            "AS out)"
        ),
        lambda acc, x: F.struct(
            F.greatest(
                F.lit(0).cast("bigint"),
                acc["s"] + x["n_events"] * F.col("m") - F.col("t"),
            ).alias("s"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["day"].alias("day"),
                        x["n_events"].alias("n"),
                        F.greatest(
                            F.lit(0).cast("bigint"),
                            acc["s"]
                            + x["n_events"] * F.col("m")
                            - F.col("t"),
                        ).alias("c"),
                    )
                ),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    return (
        per_type.withColumn("m", m)
        .withColumn("t", t)
        .select("event_type", "t", F.explode(fold).alias("row"))
        .select(
            "event_type",
            F.col("row.day").alias("day"),
            F.col("row.n").alias("n_events"),
            F.col("row.c").alias("cusum_scaled"),
            (F.col("row.c") * 2 > F.col("t")).alias("alarm"),
        )
    )


@query(
    "dq9_fd_discovery",
    sql="""
    SELECT * FROM (
      SELECT 'orders: o_orderkey -> o_custkey' AS fd,
             COUNT(DISTINCT o_orderkey)::BIGINT AS n_lhs,
             COUNT(DISTINCT (o_orderkey, o_custkey))::BIGINT AS n_pairs,
             COUNT(DISTINCT o_orderkey)
               = COUNT(DISTINCT (o_orderkey, o_custkey)) AS holds
      FROM orders
      UNION ALL
      SELECT 'customer: c_nationkey -> c_mktsegment',
             COUNT(DISTINCT c_nationkey)::BIGINT,
             COUNT(DISTINCT (c_nationkey, c_mktsegment))::BIGINT,
             COUNT(DISTINCT c_nationkey)
               = COUNT(DISTINCT (c_nationkey, c_mktsegment))
      FROM customer
      UNION ALL
      SELECT 'nation: n_nationkey -> n_regionkey',
             COUNT(DISTINCT n_nationkey)::BIGINT,
             COUNT(DISTINCT (n_nationkey, n_regionkey))::BIGINT,
             COUNT(DISTINCT n_nationkey)
               = COUNT(DISTINCT (n_nationkey, n_regionkey))
      FROM nation
      UNION ALL
      SELECT 'lineitem: l_partkey -> l_suppkey',
             COUNT(DISTINCT l_partkey)::BIGINT,
             COUNT(DISTINCT (l_partkey, l_suppkey))::BIGINT,
             COUNT(DISTINCT l_partkey)
               = COUNT(DISTINCT (l_partkey, l_suppkey))
      FROM lineitem
      UNION ALL
      SELECT 'orders: o_custkey -> o_orderpriority',
             COUNT(DISTINCT o_custkey)::BIGINT,
             COUNT(DISTINCT (o_custkey, o_orderpriority))::BIGINT,
             COUNT(DISTINCT o_custkey)
               = COUNT(DISTINCT (o_custkey, o_orderpriority))
      FROM orders
    )
    """,
)
def dq9_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency screen (the profiling pass behind schema
    inference, key detection, and denormalization checks): A -> B holds
    iff |distinct A| = |distinct (A, B)| — two distinct-counts per
    candidate, evaluated in ONE aggregate per table (Catalyst plans
    multi-distinct via Expand: each scan feeds both counts, nothing
    row-level survives the partial aggregate). Candidates cover a true
    key FD, a held composite FD, and deliberately-failing ones so both
    verdicts are exercised. At 100 TB each check is a combinable
    aggregate over its scan; candidate GENERATION (all column pairs) is
    the quadratic to avoid — this operator takes the curated list a
    profiler's type/cardinality prefilter produces."""

    def fd(df, name, lhs, rhs):
        return df.agg(
            F.lit(name).alias("fd"),
            F.countDistinct(lhs).alias("n_lhs"),
            F.countDistinct(lhs, rhs).alias("n_pairs"),
            (F.countDistinct(lhs) == F.countDistinct(lhs, rhs)).alias(
                "holds"
            ),
        )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        fd(orders, "orders: o_orderkey -> o_custkey", "o_orderkey", "o_custkey")
        .unionAll(
            fd(cust, "customer: c_nationkey -> c_mktsegment",
               "c_nationkey", "c_mktsegment")
        )
        .unionAll(
            fd(nation, "nation: n_nationkey -> n_regionkey",
               "n_nationkey", "n_regionkey")
        )
        .unionAll(
            fd(li, "lineitem: l_partkey -> l_suppkey",
               "l_partkey", "l_suppkey")
        )
        .unionAll(
            fd(orders, "orders: o_custkey -> o_orderpriority",
               "o_custkey", "o_orderpriority")
        )
    )


def _dq10_sql() -> str:
    from ..functions.exact import sql_dsum
    from .star_queries import _DIM1_SQL

    return f"""
    {_DIM1_SQL}
    , probes AS (
      SELECT l_suppkey
               + CASE WHEN l_orderkey % 37 = 0 THEN 2000000 ELSE 0 END
               AS probe_key,
             DATE '2023-07-01'
               + CAST((l_orderkey * 7 + l_linenumber) % 400 AS INTEGER)
               AS probe_date,
             l_quantity
      FROM lineitem
    ), m AS (
      SELECT p.probe_key, p.probe_date, p.l_quantity, d.sk
      FROM probes p
      LEFT JOIN dim1 d
        ON d.s_suppkey = p.probe_key
       AND d.start_date <= p.probe_date
       AND (d.end_date IS NULL OR d.end_date > p.probe_date)
    ), f AS (
      SELECT m.*, k.s_suppkey AS k_key
      FROM m LEFT JOIN (SELECT DISTINCT s_suppkey FROM dim1) k
        ON m.probe_key = k.s_suppkey
    )
    SELECT CASE WHEN sk IS NOT NULL THEN 'matched'
                WHEN k_key IS NOT NULL THEN 'no_version'
                ELSE 'no_key' END AS status,
           COUNT(*)::BIGINT AS n_probes,
           COUNT(DISTINCT probe_key)::BIGINT AS n_keys,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM f GROUP BY 1
    """


@query("dq10_temporal_orphans", sql=_dq10_sql())
def dq10_temporal_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal referential-integrity audit: every fact probe is routed
    to exactly one of 'matched' (an SCD2 supplier version covers its
    date), 'no_version' (the key exists but the probe predates its
    first validity window — late-arriving facts older than the initial
    load), or 'no_key' (FK orphan — the key was never loaded). The
    time-aware companion to dq1's static orphan count: a plain FK check
    passes a fact whose dimension version didn't exist yet, this one
    doesn't. Probe dates span 2023-07-01..2024-08-03 (straddling the
    2024-01-01 initial load), and 1/37 of probes get a synthetic
    never-loaded key.

    Scale: both joins broadcast the dimension (history and distinct-key
    list — dimension-sized, the g8 argument), so the fact stream never
    shuffles before the final 3-group aggregate; disjoint SCD2 validity
    windows guarantee the left join is fan-out-free."""
    from ..functions.exact import dsum
    from ..operators.scd import scd2_apply
    from .star_queries import ASOF1, scd_fixture

    dim0, staging = scd_fixture(spark, sf_dir)
    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"],
        fixed_cols=["s_nationkey"], asof=ASOF1, sk_col="sk", sk_strategy="dense",
    )
    li = load_table(spark, sf_dir, "lineitem")
    probes = li.select(
        (
            F.col("l_suppkey")
            + F.when(F.col("l_orderkey") % 37 == 0, 2000000).otherwise(0)
        ).alias("probe_key"),
        F.date_add(
            F.to_date(F.lit("2023-07-01")),
            ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 400).cast(
                "int"
            ),
        ).alias("probe_date"),
        "l_quantity",
    )
    dimv = dim1.select(
        F.col("s_suppkey").alias("d_key"), "sk", "start_date", "end_date"
    )
    matched = probes.join(
        F.broadcast(dimv),
        (F.col("probe_key") == F.col("d_key"))
        & (F.col("start_date") <= F.col("probe_date"))
        & (F.col("end_date").isNull() | (F.col("end_date") > F.col("probe_date"))),
        "left",
    )
    keys = dim1.select(F.col("s_suppkey").alias("k_key")).distinct()
    flagged = matched.join(
        F.broadcast(keys), F.col("probe_key") == F.col("k_key"), "left"
    )
    status = (
        F.when(F.col("sk").isNotNull(), "matched")
        .when(F.col("k_key").isNotNull(), "no_version")
        .otherwise("no_key")
    )
    return flagged.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.countDistinct("probe_key").alias("n_keys"),
        dsum("l_quantity", "sum_qty"),
    )


@query(
    "dq13_duplicate_payments",
    sql="""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    )
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           abs(a.cents - b.cents) AS cents_diff,
           date_diff('day', a.o_orderdate, b.o_orderdate)::BIGINT
             AS days_apart
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(a.cents - b.cents) <= 100
     AND abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 2
    """,
)
def dq13_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment audit: order pairs from the SAME customer
    within $1 and 2 days of each other — the classic accounts-payable
    double-booking screen, and the fact-table cousin of the dd family's
    document near-dup (same blocking discipline, financial payload).

    Shape: the join key is the CUSTOMER (hash equi-join); the amount
    and date windows are residual predicates on that join, so fan-out
    is bounded by orders-per-customer (degree-bounded, the cf1
    argument) — never a global band join. At extreme per-key
    cardinality the j2 binned-range pattern composes on top (bin by
    cents div 100 inside the customer block). All comparisons int64."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_a"),
        F.col("o_orderdate").alias("date_a"),
        F.col("cents").alias("cents_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck_b"),
        F.col("o_orderkey").alias("order_b"),
        F.col("o_orderdate").alias("date_b"),
        F.col("cents").alias("cents_b"),
    )
    pairs = a.join(
        b,
        (F.col("custkey") == F.col("ck_b"))
        & (F.col("order_a") < F.col("order_b"))
        & (F.abs(F.col("cents_a") - F.col("cents_b")) <= 100)
        & (F.abs(F.datediff(F.col("date_a"), F.col("date_b"))) <= 2),
    )
    return pairs.select(
        "custkey",
        "order_a",
        "order_b",
        F.abs(F.col("cents_a") - F.col("cents_b")).alias("cents_diff"),
        F.datediff(F.col("date_b"), F.col("date_a"))
        .cast("bigint")
        .alias("days_apart"),
    )


@query(
    "dq14_coverage_gaps",
    sql="""
    WITH obs AS (
      SELECT DISTINCT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), span AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM obs
    ), spine AS (
      SELECT event_type, CAST(unnest(generate_series(d0, d1,
                                     INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM obs), span
    ), missing AS (
      SELECT s.event_type, s.day
      FROM spine s LEFT JOIN obs o
        ON o.event_type = s.event_type AND o.day = s.day
      WHERE o.day IS NULL
    )
    SELECT sp.event_type,
           COUNT(*)::BIGINT AS expected_days,
           COUNT(*) - coalesce(m.n_missing, 0) AS observed_days,
           coalesce(m.n_missing, 0) AS missing_days,
           m.first_missing
    FROM spine sp
    LEFT JOIN (
      SELECT event_type, COUNT(*)::BIGINT AS n_missing,
             MIN(day) AS first_missing
      FROM missing GROUP BY event_type
    ) m ON m.event_type = sp.event_type
    GROUP BY sp.event_type, m.n_missing, m.first_missing
    """,
)
def dq14_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-coverage audit: for every event type, how many days of
    the table's global [min, max] span actually arrived, how many are
    MISSING, and the first gap — the backfill-planning ledger a
    partitioned lake pipeline consults before declaring a dataset
    queryable (dq1 checks values; this checks PRESENCE; e5's spine is
    the repair that fills the holes it finds).

    Exactness: a (type x date-spine) anti-join — all date arithmetic
    integer, counts exact. Scale: the spine is types x span-days (tiny,
    generated — never scanned); the only row-scale work is the
    map-side-combined distinct at (type, day) grain."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).distinct()
    span = obs.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    types = obs.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"))
            ).alias("day"),
        )
    )
    missing = spine.join(obs, ["event_type", "day"], "left_anti")
    m = missing.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_missing"),
        F.min("day").alias("first_missing"),
    )
    exp = spine.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("expected_days")
    )
    z = F.lit(0).cast("bigint")
    return exp.join(F.broadcast(m), "event_type", "left").select(
        "event_type",
        "expected_days",
        (F.col("expected_days") - F.coalesce("n_missing", z)).alias(
            "observed_days"
        ),
        F.coalesce("n_missing", z).alias("missing_days"),
        "first_missing",
    )


@query(
    "dq15_hash_collision_audit",
    sql="""
    WITH ids AS (
      SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS id FROM documents
      UNION ALL
      SELECT 'cust:' || CAST(c_custkey AS VARCHAR) FROM customer
      UNION ALL
      SELECT 'supp:' || CAST(s_suppkey AS VARCHAR) FROM supplier
      UNION ALL
      SELECT 'ord:' || CAST(o_orderkey AS VARCHAR) FROM orders
    ), hashed AS (
      SELECT id,
             CAST('0x' || substr(md5(id), 1, 15) AS BIGINT) AS h
      FROM ids
    )
    SELECT COUNT(*)::BIGINT AS n_ids,
           COUNT(DISTINCT id)::BIGINT AS n_distinct_ids,
           COUNT(DISTINCT h)::BIGINT AS n_distinct_hashes,
           (COUNT(DISTINCT id) - COUNT(DISTINCT h))::BIGINT AS n_collisions
    FROM hashed
    """,
)
def dq15_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision audit of the engine's OWN 60-bit md5 decision key
    (dedup.shared_hash60 — every split, sample, pack, bootstrap and
    interleave decision in this repo flows through it): hash every
    entity id in the warehouse and count distinct-id vs distinct-hash.
    Expected collisions at n ids: n²/2^61 (birthday bound) — ~0 until
    billions of ids; the audit is the standing tripwire that the
    60-bit budget still holds as the id population grows, run as a
    plain query so it can sit in a scheduled quality suite.

    Scale: two map-side-combined distinct aggregates over a union of
    key projections — no payload columns move."""
    from ..operators.dedup import shared_hash60

    parts = []
    for tbl, col, tag in [
        ("documents", "doc_id", "doc"),
        ("customer", "c_custkey", "cust"),
        ("supplier", "s_suppkey", "supp"),
        ("orders", "o_orderkey", "ord"),
    ]:
        parts.append(
            load_table(spark, sf_dir, tbl).select(
                F.concat(
                    F.lit(f"{tag}:"), F.col(col).cast("string")
                ).alias("id")
            )
        )
    ids = parts[0]
    for p in parts[1:]:
        ids = ids.unionByName(p)
    hashed = ids.select("id", shared_hash60(F.col("id")).alias("h"))
    return hashed.agg(
        F.count(F.lit(1)).alias("n_ids"),
        F.countDistinct("id").alias("n_distinct_ids"),
        F.countDistinct("h").alias("n_distinct_hashes"),
        (F.countDistinct("id") - F.countDistinct("h")).alias("n_collisions"),
    )


def _dq16_sql() -> str:
    from .star_queries import _DIM1_SQL

    return f"""
    {_DIM1_SQL}
    , corrupted AS (
      SELECT s_suppkey, start_date, end_date FROM dim1
      UNION ALL
      SELECT s_suppkey, DATE '2024-03-01', CAST(NULL AS DATE)
      FROM dim1 WHERE s_suppkey % 17 = 0 AND is_current
    ), seq AS (
      SELECT s_suppkey, start_date, end_date,
             LAG(end_date) OVER (
               PARTITION BY s_suppkey ORDER BY start_date, end_date
             ) AS prev_end,
             LAG(start_date) OVER (
               PARTITION BY s_suppkey ORDER BY start_date, end_date
             ) AS prev_start
      FROM corrupted
    )
    SELECT s_suppkey,
           COUNT(*)::BIGINT AS n_versions,
           SUM(CASE WHEN prev_start IS NOT NULL
                     AND (prev_end IS NULL OR prev_end > start_date)
                    THEN 1 ELSE 0 END)::BIGINT AS n_overlaps,
           MIN(CASE WHEN prev_start IS NOT NULL
                     AND (prev_end IS NULL OR prev_end > start_date)
                    THEN start_date END) AS first_overlap_start
    FROM seq GROUP BY s_suppkey
    HAVING SUM(CASE WHEN prev_start IS NOT NULL
                     AND (prev_end IS NULL OR prev_end > start_date)
                    THEN 1 ELSE 0 END) > 0
    """


@query("dq16_scd2_overlap_audit", sql=_dq16_sql())
def dq16_scd2_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity-overlap detector as a runnable audit REPORT (the
    non-overlap invariant lives in tests/test_scd.py for dims this
    engine builds; this query is for dims built elsewhere): a corrupted
    copy of the g1 dimension — every 17th current key gains a second
    open version — must surface exactly those keys, with overlap counts
    and the first offending start date. Overlap rule: sorted by
    (start, end) per key, a version overlaps when the previous
    version's end is NULL (open) or exceeds this start — half-open
    interval semantics matching scd2_snapshot.

    Scale: one key-partitioned lag window at version grain — dimension-
    sized, the g1 argument."""
    from ..operators.scd import scd2_apply
    from .star_queries import ASOF1, scd_fixture

    dim0, staging = scd_fixture(spark, sf_dir)
    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"],
        fixed_cols=["s_nationkey"], asof=ASOF1, sk_col="sk", sk_strategy="dense",
    )
    base = dim1.select("s_suppkey", "start_date", "end_date")
    corrupted = base.unionByName(
        dim1.where((F.col("s_suppkey") % 17 == 0) & F.col("is_current"))
        .select(
            "s_suppkey",
            F.lit("2024-03-01").cast("date").alias("start_date"),
            F.lit(None).cast("date").alias("end_date"),
        )
    )
    w = Window.partitionBy("s_suppkey").orderBy("start_date", "end_date")
    seq = corrupted.select(
        "s_suppkey",
        "start_date",
        "end_date",
        F.lag("end_date").over(w).alias("prev_end"),
        F.lag("start_date").over(w).alias("prev_start"),
    )
    is_overlap = F.col("prev_start").isNotNull() & (
        F.col("prev_end").isNull() | (F.col("prev_end") > F.col("start_date"))
    )
    out = seq.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(is_overlap.cast("int")).cast("bigint").alias("n_overlaps"),
        F.min(F.when(is_overlap, F.col("start_date"))).alias(
            "first_overlap_start"
        ),
    )
    return out.where(F.col("n_overlaps") > 0)


def _dq17_sql() -> str:
    from .text_queries import _lang_sql

    pred = _lang_sql().strip()
    return f"""
    WITH pred AS ({pred})
    SELECT d.lang AS declared, p.pred_lang AS detected,
           COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN d.lang = p.pred_lang THEN 1 ELSE 0 END)::BIGINT
             AS n_agree
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY 1, 2
    """


@query("dq17_langid_agreement", sql=_dq17_sql())
def dq17_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix: the metadata
    QUALITY check for the corpus's `lang` column, built by joining
    tx3's stopword-profile detector back onto the declarations — a
    systematic off-diagonal cell means either a mislabeled source feed
    or a detector blind spot, and EITHER invalidates per-language
    sampling (sp2) and mixing (mx3) decisions downstream. One doc-keyed
    join of two projections plus a 2-key aggregate."""
    from ..operators import textstats

    docs = load_table(spark, sf_dir, "documents")
    pred = textstats.lang_id(docs, "text", "doc_id").select(
        "doc_id", "pred_lang"
    )
    j = docs.select("doc_id", F.col("lang").alias("declared")).join(
        pred, "doc_id"
    )
    return j.groupBy("declared", F.col("pred_lang").alias("detected")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("declared") == F.col("pred_lang"), 1).otherwise(0)
        ).cast("bigint").alias("n_agree"),
    )


@query(
    "dq18_weekday_anomaly",
    sql="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             isodow(ts) - 1 AS dow,
             COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2, 3
    ), base AS (
      SELECT event_type, dow,
             SUM(n)::BIGINT AS dow_events,
             COUNT(*)::BIGINT AS dow_days
      FROM daily GROUP BY 1, 2
    )
    SELECT d.event_type, d.day, d.n,
           b.dow_events, b.dow_days,
           (d.n * b.dow_days > 2 * b.dow_events) AS spike,
           (2 * d.n * b.dow_days < b.dow_events) AS drop
    FROM daily d
    JOIN base b ON b.event_type = d.event_type AND b.dow = d.dow
    WHERE d.n * b.dow_days > 2 * b.dow_events
       OR 2 * d.n * b.dow_days < b.dow_events
    """,
)
def dq18_weekday_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-baseline anomaly days: a (type, day) whose count exceeds
    2x its own weekday's mean — or falls below half of it — flagged by
    INTEGER cross-multiplication (n * dow_days vs k * dow_events), so
    no float mean ever exists. The seasonality-aware screen dq8's
    global CUSUM misses: a normal Saturday lull isn't drift, a
    Saturday at Tuesday volume is. Composes e26's index with dq8's
    alarm discipline. Everything past the daily aggregate is (type,
    dow)-grain joined back at (type, day) grain."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.weekday("ts").cast("bigint").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = daily.groupBy("event_type", "dow").agg(
        F.sum("n").alias("dow_events"),
        F.count(F.lit(1)).alias("dow_days"),
    )
    j = daily.join(F.broadcast(base), ["event_type", "dow"])
    spike = F.col("n") * F.col("dow_days") > 2 * F.col("dow_events")
    drop = 2 * F.col("n") * F.col("dow_days") < F.col("dow_events")
    return j.where(spike | drop).select(
        "event_type", "day", "n", "dow_events", "dow_days",
        spike.alias("spike"), drop.alias("drop"),
    )


@query(
    "dq19_fixed_attr_violations",
    sql="""
    WITH staging AS (
      SELECT s_suppkey, s_name, s_acctbal,
             CASE WHEN s_suppkey % 13 = 0 THEN s_nationkey + 1
                  ELSE s_nationkey END AS s_nationkey
      FROM supplier
    )
    SELECT st.s_suppkey,
           d.s_nationkey AS dim_nationkey,
           st.s_nationkey AS staged_nationkey
    FROM staging st
    JOIN supplier d ON d.s_suppkey = st.s_suppkey
    WHERE st.s_nationkey IS DISTINCT FROM d.s_nationkey
    """,
)
def dq19_fixed_attr_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-attribute violation report: staging rows that try to
    change a column declared immutable (supplier nation; the fixture
    plants a mutation on every 13th key). The reference's SCD wizard
    has exactly this semantics tier — Fixed attributes with a
    fail-on-change option (`project SSIS::bor_dim.dtsx` FailOnFixed
    routing) — and scd2_apply honors fixed_cols by never copying them
    from staging; this query is the REPORTING half: surface the
    violations so the load can fail loudly or route them to an error
    table instead of silently keeping the dimension value. One
    broadcast probe join, null-safe comparison."""
    sup = load_table(spark, sf_dir, "supplier")
    staging = sup.select(
        "s_suppkey", "s_name", "s_acctbal",
        F.when(
            F.col("s_suppkey") % 13 == 0, F.col("s_nationkey") + 1
        ).otherwise(F.col("s_nationkey")).alias("s_nationkey"),
    )
    d = sup.select(
        F.col("s_suppkey").alias("d_key"),
        F.col("s_nationkey").alias("dim_nationkey"),
    )
    return (
        staging.join(F.broadcast(d), staging.s_suppkey == F.col("d_key"))
        .where(
            ~F.col("s_nationkey").eqNullSafe(F.col("dim_nationkey"))
        )
        .select(
            "s_suppkey",
            "dim_nationkey",
            F.col("s_nationkey").alias("staged_nationkey"),
        )
    )


# --- dq17: embedding-distribution drift -----------------------------------

_DQ17_S = 1_000_000


@query(
    "dq24_embedding_drift",
    sql=f"""
    WITH q AS (
      SELECT label, vec_id % 2 AS half,
             unnest(list_transform(embedding,
               x -> CAST(floor(x::DOUBLE * {_DQ17_S}) AS BIGINT))) AS qx,
             unnest(range(1, len(embedding) + 1)) AS dim
      FROM embeddings
    ), sums AS (
      SELECT label, half, dim, CAST(SUM(qx) AS BIGINT) AS s,
             CAST(SUM(qx * qx) AS BIGINT) AS s2
      FROM q GROUP BY label, half, dim
    ), vecs AS (
      SELECT label, half, list(s::DOUBLE ORDER BY dim) AS v,
             list(s2::DOUBLE ORDER BY dim) AS v2
      FROM sums GROUP BY label, half
    ), cnt AS (
      SELECT label, vec_id % 2 AS half, CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY label, vec_id % 2
    )
    SELECT a.label,
           ca.n AS n_baseline, cb.n AS n_current,
           list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> a.v[i] * a.v[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> b.v[i] * b.v[i]))))
             AS mean_drift_cos,
           list_sum(list_transform(range(1, 65), i -> a.v2[i] * b.v2[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> a.v2[i] * a.v2[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> b.v2[i] * b.v2[i]))))
             AS var_drift_cos
    FROM vecs a JOIN vecs b ON a.label = b.label AND a.half = 0 AND b.half = 1
    JOIN cnt ca ON ca.label = a.label AND ca.half = 0
    JOIN cnt cb ON cb.label = a.label AND cb.half = 1
    """,
)
def dq24_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift per label between two corpus
    snapshots (even vs odd vec_id — the deterministic stand-in for
    version N vs N+1), as cosines between the snapshots' FIRST- and
    SECOND-moment vectors, computed from micro-unit-quantized integer
    component sums so the reduction is order-independent and both
    engines agree exactly (cosine is scale-invariant, so unnormalized
    sums suffice). mean_drift_cos tracks centroid direction — noisy by
    construction on a zero-mean population (this corpus: halves land
    near-orthogonal, which is itself the "no mean structure" reading);
    var_drift_cos tracks the per-dimension energy profile, the robust
    stability signal (near 1 for same-population halves; a drop is the
    retrain/re-index trigger a serving pipeline monitors).

    Scale shape: one explode + (label, half, dim)-keyed integer sum
    (map-side combined, 2 x labels x dims rows total), then label-grain
    joins on the tiny aggregate — the corpus is scanned once and never
    re-shuffled at vector grain."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * F.lit(_DQ17_S)).cast(
                    "bigint"
                ),
            )
        ).alias("dim0", "qx"),
    )
    sums = q.groupBy("label", "half", (F.col("dim0") + 1).alias("dim")).agg(
        F.sum("qx").alias("s"),
        F.sum(F.col("qx") * F.col("qx")).alias("s2"),
    )
    vecs = sums.groupBy("label", "half").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "s"))),
            lambda p: p["s"].cast("double"),
        ).alias("v"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "s2"))),
            lambda p: p["s2"].cast("double"),
        ).alias("v2"),
    )
    cnt = emb.groupBy(
        "label", (F.col("vec_id") % 2).alias("half")
    ).agg(F.count(F.lit(1)).alias("n"))

    a = vecs.where(F.col("half") == 0).select(
        "label", F.col("v").alias("va"), F.col("v2").alias("va2")
    )
    b = vecs.where(F.col("half") == 1).select(
        "label", F.col("v").alias("vb"), F.col("v2").alias("vb2")
    )
    ca = cnt.where(F.col("half") == 0).select(
        "label", F.col("n").alias("n_baseline")
    )
    cb = cnt.where(F.col("half") == 1).select(
        "label", F.col("n").alias("n_current")
    )

    def dot(u, w):
        return F.aggregate(
            F.zip_with(u, w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def cos(u, w):
        return dot(u, w) / (F.sqrt(dot(u, u)) * F.sqrt(dot(w, w)))

    return (
        a.join(b, "label")
        .join(ca, "label")
        .join(cb, "label")
        .select(
            "label",
            "n_baseline",
            "n_current",
            cos(F.col("va"), F.col("vb")).alias("mean_drift_cos"),
            cos(F.col("va2"), F.col("vb2")).alias("var_drift_cos"),
        )
    )


# --- dq21: mutual information between categorical columns -----------------


@query(
    "dq21_mutual_information",
    sql="""
    WITH cells AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
             COUNT(*)::BIGINT AS n_xy
      FROM orders GROUP BY 1, 2
    ), mx AS (
      SELECT priority, SUM(n_xy)::BIGINT AS n_x FROM cells GROUP BY 1
    ), my AS (
      SELECT status, SUM(n_xy)::BIGINT AS n_y FROM cells GROUP BY 1
    ), tot AS (SELECT SUM(n_xy)::BIGINT AS n FROM cells)
    SELECT c.priority, c.status, c.n_xy,
           CAST(round(1000000 * ln((c.n_xy * t.n)::DOUBLE
             / ((x.n_x * y.n_y))::DOUBLE)) AS BIGINT) AS pmi_micro,
           (c.n_xy::DOUBLE / t.n::DOUBLE)
             * (CAST(round(1000000 * ln((c.n_xy * t.n)::DOUBLE
                  / ((x.n_x * y.n_y))::DOUBLE)) AS BIGINT)::DOUBLE
                / 1000000.0) AS mi_contrib
    FROM cells c
    JOIN mx x USING (priority)
    JOIN my y USING (status)
    CROSS JOIN tot t
    """,
)
def dq21_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise and total mutual information between order priority
    and order status — the model-free dependence screen that ranks
    candidate features / detects leaking columns (fv6's WOE is the
    binary-target special case; MI is the general one). Per observed
    joint cell: count, PMI in integer micro-nats (quantized on the
    driver from the collected <= |X|*|Y| cell counts through
    sampling.guarded_log_qround — fv6's bounded-state discipline), and
    the MI contribution (p_xy * pmi) as a pinned-order IEEE product
    over exact integers, so SUM(mi_contrib) is the table's MI. One
    aggregate scan at category-product grain."""
    import math as _math

    from ..operators import sampling

    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
    rows = cells.collect()
    n = sum(r["n_xy"] for r in rows)
    n_x: dict[str, int] = {}
    n_y: dict[str, int] = {}
    for r in rows:
        n_x[r["priority"]] = n_x.get(r["priority"], 0) + r["n_xy"]
        n_y[r["status"]] = n_y.get(r["status"], 0) + r["n_xy"]
    pmi = {
        (r["priority"], r["status"]): sampling.guarded_log_qround(
            1_000_000
            * _math.log(
                (r["n_xy"] * n) / (n_x[r["priority"]] * n_y[r["status"]])
            ),
            f"pmi[{r['priority']}|{r['status']}]",
        )
        for r in rows
    }
    pmi_map = F.create_map(
        *[
            x
            for (p, s), v in pmi.items()
            for x in (F.lit(f"{p}|{s}"), F.lit(int(v)))
        ]
    )
    pmi_micro = pmi_map[
        F.concat(F.col("priority"), F.lit("|"), F.col("status"))
    ].cast("bigint")
    return cells.select(
        "priority",
        "status",
        "n_xy",
        pmi_micro.alias("pmi_micro"),
        (
            (F.col("n_xy").cast("double") / F.lit(float(n)))
            * (pmi_micro.cast("double") / F.lit(1_000_000.0))
        ).alias("mi_contrib"),
    )


# --- dq22: missingness-pattern (nullity) profile ---------------------------


@query(
    "dq22_null_pattern_profile",
    sql="""
    WITH dirty AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 3 THEN NULL
                  ELSE o_totalprice END AS price,
             CASE WHEN o_orderkey % 11 = 5 THEN NULL
                  ELSE o_orderpriority END AS priority,
             CASE WHEN o_orderkey % 13 = 8 THEN NULL
                  ELSE o_orderdate END AS odate
      FROM orders
    ), masked AS (
      SELECT (CASE WHEN price IS NULL THEN 4 ELSE 0 END
            + CASE WHEN priority IS NULL THEN 2 ELSE 0 END
            + CASE WHEN odate IS NULL THEN 1 ELSE 0 END) AS pattern_mask
      FROM dirty
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM masked)
    SELECT CAST(pattern_mask AS BIGINT) AS pattern_mask,
           concat_ws(',',
             CASE WHEN pattern_mask // 4 % 2 = 1 THEN 'price' END,
             CASE WHEN pattern_mask // 2 % 2 = 1 THEN 'priority' END,
             CASE WHEN pattern_mask % 2 = 1 THEN 'odate' END)
             AS null_columns,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           (COUNT(*) * 1000000) // (SELECT n_total FROM tot)
             AS share_micro
    FROM masked
    GROUP BY pattern_mask
    """,
)
def dq22_null_pattern_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missingness-pattern mining (the nullity-matrix / md.pattern
    read): every row reduced to a bitmask of WHICH audited columns are
    null, patterns counted with exact integer micro shares. Joint
    patterns are what imputation strategy and upstream-bug triage
    actually need — dq1's per-column null counts can't distinguish
    'price and priority go missing together' (one broken extract)
    from independent gaps. The null injection is a deterministic dirty
    fixture (the er1 precedent); on real data the CASE wrappers drop
    away and the mask is computed from the raw columns.

    Scale shape: one projection to the mask, one combinable count at
    pattern grain (<= 2^k rows), a 1-row total broadcast back — the
    corpus is scanned once and never reshuffled."""
    orders = load_table(spark, sf_dir, "orders")
    dirty = orders.select(
        F.when(F.col("o_orderkey") % 7 == 3, None)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.when(F.col("o_orderkey") % 11 == 5, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("priority"),
        F.when(F.col("o_orderkey") % 13 == 8, None)
        .otherwise(F.col("o_orderdate"))
        .alias("odate"),
    )
    mask = (
        F.when(F.col("price").isNull(), 4).otherwise(0)
        + F.when(F.col("priority").isNull(), 2).otherwise(0)
        + F.when(F.col("odate").isNull(), 1).otherwise(0)
    )
    masked = dirty.select(mask.alias("pattern_mask"))
    counts = masked.groupBy(
        F.col("pattern_mask").cast("bigint").alias("pattern_mask")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = masked.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    names = F.concat_ws(
        ",",
        F.when(F.expr("pattern_mask div 4 % 2 = 1"), "price"),
        F.when(F.expr("pattern_mask div 2 % 2 = 1"), "priority"),
        F.when(F.expr("pattern_mask % 2 = 1"), "odate"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "pattern_mask",
        names.alias("null_columns"),
        "n_rows",
        F.expr("(n_rows * 1000000) div n_total").alias("share_micro"),
    )


# --- dq23: population stability index --------------------------------------

_DQ23_CUT = "2024-01-16"


@query(
    "dq23_population_stability",
    sql=f"""
    WITH c AS (
      SELECT event_type AS bin,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '{_DQ23_CUT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_expected,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_DQ23_CUT}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_actual
      FROM events GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(n_expected) AS BIGINT) AS e,
             CAST(SUM(n_actual) AS BIGINT) AS a
      FROM c
    )
    SELECT bin, n_expected, n_actual,
           CAST(round(1000000 * ln((GREATEST(n_actual, 1) * e)::DOUBLE
             / (GREATEST(n_expected, 1) * a)::DOUBLE)) AS BIGINT)
             AS psi_ln_micro,
           (n_actual::DOUBLE / a - n_expected::DOUBLE / e)
             * (CAST(round(1000000 * ln((GREATEST(n_actual, 1) * e)::DOUBLE
                 / (GREATEST(n_expected, 1) * a)::DOUBLE))
                 AS BIGINT)::DOUBLE / 1000000.0)
             AS psi_contrib
    FROM c, t
    """,
)
def dq23_population_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — THE credit-scoring model-monitoring
    metric (the reference's loan domain deploys scorecards; PSI is how
    their input drift is watched): the event-type distribution of a
    baseline window (before {_DQ23_CUT}) against the current window,
    per-bin contribution (a_share - e_share) * ln(a_share / e_share).
    The one transcendental is ln of a RATIO OF INTEGER PRODUCTS
    ((n_actual * E) / (n_expected * A)), quantized to integer
    micro-nats on the driver from bin-grain counts (bounded state: one
    row per bin) through sampling.guarded_log_qround — the fv6/WOE
    discipline — so psi_ln_micro is an exact integer cross-engine and
    psi_contrib is a pinned-order IEEE chain over exact integers.
    Complements dq12 (profile drift flags) and dq8 (CUSUM location):
    PSI is the industry-named magnitude with the 0.1/0.25
    watch/act thresholds. Degenerate bins (zero count in one window)
    floor to 1 inside the ln on both engines — the canonical PSI edge
    case (new/vanished category) yields a finite contribution, never
    a crash; a wholly empty window raises a named error.

    Scale shape: ONE aggregate scan (both windows counted in the same
    pass via conditional sums), bin-grain everything after."""
    import math as _math

    from ..operators import sampling

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(_DQ23_CUT).cast("timestamp")
    counts = ev.groupBy(F.col("event_type").alias("bin")).agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .cast("bigint").alias("n_expected"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
        .cast("bigint").alias("n_actual"),
    )
    rows = counts.collect()  # bin-grain: bounded driver state
    e = sum(r["n_expected"] for r in rows)
    a = sum(r["n_actual"] for r in rows)
    if e == 0 or a == 0:
        raise ValueError(
            "dq23: a comparison window is empty (expected "
            f"{e} rows, actual {a}) — PSI is undefined with no baseline "
            "or no current population; widen the windows"
        )
    ln_micro = {
        r["bin"]: sampling.guarded_log_qround(
            1_000_000
            * _math.log(
                (max(r["n_actual"], 1) * e) / (max(r["n_expected"], 1) * a)
            ),
            f"psi[{r['bin']}]",
        )
        for r in rows
    }
    lmap = F.create_map(*[F.lit(x) for kv in ln_micro.items() for x in kv])
    # degenerate bins (zero rows in one window — a brand-new or vanished
    # event_type, the exact situation PSI exists to flag) are floored to
    # a count of 1 inside the ln ratio on BOTH engines (the standard
    # epsilon-floor), so the contribution stays finite and signed right
    # instead of crashing on ln(0)/div-0; the raw shares in the linear
    # factor are untouched (a vanished bin still contributes with
    # e_share > 0, a_share = 0). ADVICE r9 (medium).
    ln_col = lmap[F.col("bin")].cast("bigint")
    return counts.select(
        "bin",
        "n_expected",
        "n_actual",
        ln_col.alias("psi_ln_micro"),
        (
            (
                F.col("n_actual").cast("double") / F.lit(float(a))
                - F.col("n_expected").cast("double") / F.lit(float(e))
            )
            * (ln_col.cast("double") / F.lit(1_000_000.0))
        ).alias("psi_contrib"),
    )
