"""Snapshot-reconciliation query catalog (operators/reconcile.py):
keyed table diff, survivorship merge, and late-arriving-dimension
inferred members — plus the winsorization quality transform.

The reference reloads dimensions from full extracts and per-row-UPDATEs
what changed (`project SSIS::bor_dim.dtsx:454,566`); at warehouse scale
that loop becomes diff-then-apply. Both snapshots here derive
deterministically from the same base table in BOTH engines, so the
oracle replays the whole derivation and the diff/merge semantics are
hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import quality
from ..operators.reconcile import golden_record, infer_members, snapshot_diff
from . import query

# --- c7: snapshot diff ----------------------------------------------------
# The "new" snapshot is a deterministic mutation of customer:
#   * removed : custkey % 11 == 0 rows are gone
#   * changed : custkey % 7 == 0 gains 10.00 acctbal; custkey % 14 == 0
#               additionally moves market segment (so changed_cols
#               exercises both the one-column and two-column cases)
#   * added   : custkey % 13 == 0 re-keyed +1_000_000 as fresh rows
_C7_NEW_SQL = """
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
                  ELSE c_acctbal END AS c_acctbal,
             CASE WHEN c_custkey % 14 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 11 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, c_name, c_nationkey, 0.0, 'NEW'
      FROM customer WHERE c_custkey % 13 = 0
"""

_C7_COMPARE = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def _c7_new_snapshot(cust: DataFrame) -> DataFrame:
    mutated = cust.where(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + F.lit(10.0))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(F.col("c_custkey") % 14 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    added = cust.where(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + F.lit(1000000)).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return mutated.unionByName(added)


@query(
    "c7_snapshot_diff",
    sql=f"""
    WITH newsnap AS ({_C7_NEW_SQL}),
    d AS (
      SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN o.c_custkey IS NULL THEN 'added'
                  WHEN n.c_custkey IS NULL THEN 'removed'
                  ELSE 'changed' END AS change_kind,
             CASE WHEN o.c_custkey IS NULL OR n.c_custkey IS NULL THEN ''
                  ELSE concat_ws(',',
                    CASE WHEN o.c_name        IS DISTINCT FROM n.c_name        THEN 'c_name' END,
                    CASE WHEN o.c_nationkey   IS DISTINCT FROM n.c_nationkey   THEN 'c_nationkey' END,
                    CASE WHEN o.c_acctbal     IS DISTINCT FROM n.c_acctbal     THEN 'c_acctbal' END,
                    CASE WHEN o.c_mktsegment  IS DISTINCT FROM n.c_mktsegment  THEN 'c_mktsegment' END)
             END AS changed_cols
      FROM customer o FULL OUTER JOIN newsnap n ON o.c_custkey = n.c_custkey
    )
    SELECT * FROM d WHERE change_kind <> 'changed' OR changed_cols <> ''
    """,
)
def c7_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed delta between the current customer table and a mutated
    snapshot: one full-outer key join, null-safe column compare,
    unchanged rows dropped inside the join projection so only the
    change mass crosses the stage boundary (operators/reconcile.py —
    the diff-then-apply replacement for the reference's full-reload
    per-row UPDATE loop, `project SSIS::bor_dim.dtsx:454,566`)."""
    cust = load_table(spark, sf_dir, "customer")
    return snapshot_diff(
        cust, _c7_new_snapshot(cust), ["c_custkey"], _C7_COMPARE
    )


# --- c8: golden record ----------------------------------------------------
# Orders replayed as conflicting CRM-style records per customer with
# deterministic null injection; survivorship = latest non-null wins.
_C8_REC_SQL = """
      SELECT o_custkey AS cust_id, o_orderkey AS seq,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS status,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS priority,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS totalprice
      FROM orders
"""


@query(
    "c8_golden_record",
    sql=f"""
    WITH rec AS ({_C8_REC_SQL})
    SELECT cust_id,
           arg_max(status, seq) FILTER (WHERE status IS NOT NULL) AS status,
           arg_max(priority, seq) FILTER (WHERE priority IS NOT NULL) AS priority,
           arg_max(totalprice, seq) FILTER (WHERE totalprice IS NOT NULL) AS totalprice,
           COUNT(*) AS n_records,
           MAX(seq) AS last_seq
    FROM rec GROUP BY cust_id
    """,
)
def c8_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge (MDM golden record): per customer, each
    attribute independently takes its most recent NON-NULL observation.
    The whole rule is one map-side-combinable MAX(struct(not-null, seq,
    value)) aggregate — no window, no per-key sort; the oracle replays
    it with filtered arg_max."""
    orders = load_table(spark, sf_dir, "orders")
    rec = orders.select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("priority"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
        .alias("totalprice"),
    )
    return golden_record(
        rec,
        key_cols=["cust_id"],
        seq_col="seq",
        value_cols=["status", "priority", "totalprice"],
    )


# --- c9: inferred members -------------------------------------------------
_C9_DIM_PRED = "c_custkey % 5 <> 0"  # simulate an incomplete dimension


@query(
    "c9_inferred_members",
    sql=f"""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           FALSE AS inferred
    FROM customer WHERE {_C9_DIM_PRED}
    UNION ALL
    SELECT DISTINCT o_custkey, 'INFERRED MEMBER', -1,
           CAST(NULL AS DOUBLE), 'UNKNOWN', TRUE
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE {_C9_DIM_PRED})
    """,
)
def c9_inferred_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension: fact keys with no dimension match gain
    placeholder rows flagged `inferred` (SSIS Lookup's third no-match
    behavior, next to the error-row diversion star.py:108 covers). The
    unmatched key set is ONE distinct left-anti join — the dim is never
    scanned per fact."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.where(F.expr(_C9_DIM_PRED))
    return infer_members(
        dim,
        orders,
        dim_key="c_custkey",
        fact_key="o_custkey",
        placeholders={
            "c_name": F.lit("INFERRED MEMBER"),
            "c_nationkey": F.lit(-1).cast("int"),
            "c_acctbal": F.lit(None).cast("double"),
            "c_mktsegment": F.lit("UNKNOWN"),
        },
    )


# --- dq4: winsorization ---------------------------------------------------


@query(
    "dq4_winsorize",
    sql="""
    WITH b AS (
      SELECT c_mktsegment,
             quantile_cont(c_acctbal, 0.05) AS lo,
             quantile_cont(c_acctbal, 0.95) AS hi
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
           GREATEST(b.lo, LEAST(b.hi, c.c_acctbal)) AS c_acctbal_w
    FROM customer c JOIN b USING (c_mktsegment)
    """,
)
def dq4_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment percentile clipping (operators/quality.py::winsorize):
    exact interpolated p05/p95 per group — Spark `percentile` == DuckDB
    `quantile_cont` (the d9 parity) — computed in ONE aggregate over the
    group keys and broadcast back onto the scan; no window touches the
    table."""
    cust = load_table(spark, sf_dir, "customer")
    out = quality.winsorize(
        cust, "c_acctbal", ["c_mktsegment"], 0.05, 0.95, out_col="c_acctbal_w"
    )
    return out.select("c_custkey", "c_mktsegment", "c_acctbal", "c_acctbal_w")


# --- c10: incremental join-view maintenance -------------------------------
# Deterministic split of both sides into (old, delta): recent orders are
# the fact delta, late-arriving customers (custkey % 10 == 0) the dim
# delta. The oracle recomputes the FULL join of the unioned sides — the
# delta algebra must reproduce it exactly.


@query(
    "c10_incremental_join_view",
    sql="""
    SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def c10_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental equi-join view maintenance (delta-join algebra):
    V_new = V_old ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, with both delta terms
    broadcasting their delta side so history never re-shuffles
    (operators/reconcile.incremental_join_view — the join half of view
    maintenance beside m7's incremental rollup). Old/delta splits are
    deterministic (orders after the 80th-percentile date; customers
    with custkey % 10 == 0 arriving late), and the oracle recomputes
    the monolithic join of the unioned inputs — hash equality IS the
    correctness of the algebra, including the ΔA⋈ΔB corner(late
    customer x new order) a naive two-term refresh silently drops."""
    from ..operators.reconcile import incremental_join_view

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cut = orders.agg(
        F.expr(
            "percentile(unix_seconds(cast(o_orderdate as timestamp)), 0.8)"
        ).alias("c")
    )
    o = orders.join(F.broadcast(cut)).withColumn(
        "__new",
        F.unix_seconds(F.col("o_orderdate").cast("timestamp")) > F.col("c"),
    )
    a_old = o.where(~F.col("__new"))
    a_delta = o.where(F.col("__new"))
    b_old = cust.where(F.col("c_custkey") % 10 != 0)
    b_delta = cust.where(F.col("c_custkey") % 10 == 0)
    view = incremental_join_view(
        a_old.withColumnRenamed("o_custkey", "k"),
        a_delta.withColumnRenamed("o_custkey", "k"),
        b_old.withColumnRenamed("c_custkey", "k"),
        b_delta.withColumnRenamed("c_custkey", "k"),
        on="k",
    )
    return view.select(
        "o_orderkey",
        F.col("k").alias("o_custkey"),
        "c_mktsegment",
        "o_totalprice",
    )


@query(
    "c11_deletion_cascade",
    sql="""
    WITH forget AS (
      SELECT c_custkey FROM customer
      WHERE CAST('0x' || substr(md5('forget_' || c_custkey), 1, 15)
                 AS BIGINT) % 100 < 3
    ), ord_del AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM forget)
    )
    SELECT * FROM (
      SELECT 'customer' AS "table",
             (SELECT COUNT(*) FROM forget)::BIGINT AS n_deleted,
             ((SELECT COUNT(*) FROM customer)
              - (SELECT COUNT(*) FROM forget))::BIGINT AS n_surviving
      UNION ALL
      SELECT 'orders',
             (SELECT COUNT(*) FROM ord_del)::BIGINT,
             ((SELECT COUNT(*) FROM orders)
              - (SELECT COUNT(*) FROM ord_del))::BIGINT
      UNION ALL
      SELECT 'lineitem',
             (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM ord_del))::BIGINT,
             ((SELECT COUNT(*) FROM lineitem)
              - (SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM ord_del)))::BIGINT
    )
    """,
)
def c11_deletion_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure deletion cascade: a forget-set of customers
    (~3%, hash-chosen so both engines agree) propagates through the FK
    graph customer -> orders -> lineitem; the report counts deleted and
    surviving rows per table — the audit artifact a compliance delete
    job must produce BEFORE rewriting files. Plan shape: the forget set
    and the cascaded order-key set are key projections that BROADCAST
    into semi-joins on each fact scan (forget sets are small by nature);
    nothing fact-sized shuffles. The actual rewrite is the snapshot
    table's copy-on-write merge (sources/snaptable.py) — bucket pruning
    means only files containing affected keys are rewritten."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    forget = cust.where(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("forget_"), F.col("c_custkey"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 100
        < 3
    ).select("c_custkey")
    ord_del = orders.join(
        F.broadcast(forget), orders.o_custkey == forget.c_custkey, "left_semi"
    ).select("o_orderkey")
    li_del = li.join(
        F.broadcast(ord_del), li.l_orderkey == ord_del.o_orderkey, "left_semi"
    )

    def row(name, deleted, total):
        return deleted.agg(F.count(F.lit(1)).alias("n_deleted")).crossJoin(
            total.agg(F.count(F.lit(1)).alias("__tot"))
        ).select(
            F.lit(name).alias("table"),
            F.col("n_deleted"),
            (F.col("__tot") - F.col("n_deleted")).alias("n_surviving"),
        )

    return (
        row("customer", forget, cust)
        .unionAll(row("orders", ord_del, orders))
        .unionAll(row("lineitem", li_del, li))
    )


# --- er1: blocked + scored record linkage ---------------------------------
# Dirty re-extract of 20% of customers (custkey % 10 in (3, 7)), each
# with exactly one deterministic defect class:
#   %20 == 3  -> name typo ('_x' suffix)
#   %20 == 13 -> segment lost ('UNKNOWN')
#   %10 == 7  -> balance drifted +7.31
# Pass A blocks on (nation, segment) and catches the balance/name
# defects; pass B blocks on (nation, $1000 balance band) and catches
# the segment defect (disjoint from the balance defect by construction)
# -> every true pair is blocked by at least one pass.
_ER1_DIRTY_SQL = """
      SELECT c_custkey AS d_custkey,
             CASE WHEN c_custkey % 20 = 3 THEN c_name || '_x'
                  ELSE c_name END AS d_name,
             c_nationkey AS d_nationkey,
             CASE WHEN c_custkey % 10 = 7 THEN c_acctbal + 7.31
                  ELSE c_acctbal END AS d_acctbal,
             CASE WHEN c_custkey % 20 = 13 THEN 'UNKNOWN'
                  ELSE c_mktsegment END AS d_mktsegment
      FROM customer WHERE c_custkey % 10 IN (3, 7)
"""

# Two blocking passes over the dirty extract (er1's recall argument);
# shared verbatim by er1's confusion matrix and er2's weight fit.
_ER1_CAND_SQL = """
      SELECT DISTINCT d_custkey, c_custkey FROM (
        SELECT d.d_custkey, c.c_custkey
        FROM dirty d JOIN customer c
          ON d.d_nationkey = c.c_nationkey
         AND d.d_mktsegment = c.c_mktsegment
        UNION ALL
        SELECT d.d_custkey, c.c_custkey
        FROM dirty d JOIN customer c
          ON d.d_nationkey = c.c_nationkey
         AND CAST(CAST(d.d_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
               // 100000
             = CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
               // 100000
      )
"""


def _er1_universe(spark: SparkSession, sf_dir: str):
    """Shared ER universe (er1/er2): the dirty 20% re-extract, the
    two-pass blocked candidate set joined back to both payloads, and
    the cent-quantization helper. Returns (cust, dirty, pairs, cents)."""
    from ..operators import linkage

    cust = load_table(spark, sf_dir, "customer")
    mod20, mod10 = F.col("c_custkey") % 20, F.col("c_custkey") % 10
    dirty = cust.where(mod10.isin(3, 7)).select(
        F.col("c_custkey").alias("d_custkey"),
        F.when(mod20 == 3, F.concat(F.col("c_name"), F.lit("_x")))
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.when(mod10 == 7, F.col("c_acctbal") + 7.31)
        .otherwise(F.col("c_acctbal"))
        .alias("d_acctbal"),
        F.when(mod20 == 13, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("d_mktsegment"),
    )

    def cents(c: F.Column) -> F.Column:
        return (c.cast("decimal(12,2)") * 100).cast("bigint")

    dirty_b = dirty.withColumn("d_band", F.expr(
        "(CAST(CAST(d_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) div 100000"
    ))
    clean_b = cust.withColumn("c_band", F.expr(
        "(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) div 100000"
    ))
    cand = linkage.multi_pass_candidates(
        dirty_b, clean_b, "d_custkey", "c_custkey",
        passes=[
            [("d_nationkey", "c_nationkey"), ("d_mktsegment", "c_mktsegment")],
            [("d_nationkey", "c_nationkey"), ("d_band", "c_band")],
        ],
    )
    pairs = cand.join(dirty, "d_custkey").join(cust, "c_custkey")
    return cust, dirty, pairs, cents


@query(
    "er1_linkage_confusion",
    sql=f"""
    WITH dirty AS ({_ER1_DIRTY_SQL}),
    cand AS ({_ER1_CAND_SQL}), scored AS (
      SELECT cand.d_custkey, cand.c_custkey,
             CAST(CASE WHEN d.d_name = c.c_name THEN 35 ELSE -10 END
                + CASE WHEN d.d_mktsegment = c.c_mktsegment
                       THEN 15 ELSE -10 END
                + CASE WHEN abs(
                         CAST(CAST(d.d_acctbal AS DECIMAL(12,2)) * 100
                              AS BIGINT)
                         - CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100
                                AS BIGINT)) <= 1000
                       THEN 20 ELSE -25 END AS BIGINT) AS score
      FROM cand
      JOIN dirty d ON d.d_custkey = cand.d_custkey
      JOIN customer c ON c.c_custkey = cand.c_custkey
    )
    SELECT CASE WHEN score >= 60 THEN 'match'
                WHEN score >= 20 THEN 'possible'
                ELSE 'non_match' END AS classification,
           (d_custkey = c_custkey) AS is_true_pair,
           COUNT(*)::BIGINT AS n_pairs,
           MIN(score) AS min_score,
           MAX(score) AS max_score
    FROM scored GROUP BY 1, 2
    """,
)
def er1_linkage_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage between a dirty 20% re-extract of customers and
    the clean table (operators/linkage.py): two blocking passes —
    (nation, segment) and (nation, $1000 balance band), together
    recall-complete for the three planted defect classes — then
    Fellegi–Sunter-shaped integer evidence weights (name +35/-10,
    segment +15/-10, balance-within-$10 +20/-25) and a three-way
    decision at thresholds 60/20. Output is the confusion matrix of
    decision x ground truth (the dirty extract keeps its source key, so
    truth is known), the evaluation artifact an ER deployment tunes
    its weights against."""
    from ..operators import linkage

    cust, dirty, pairs, cents = _er1_universe(spark, sf_dir)
    scored = linkage.score_pairs(
        pairs,
        comparisons=[
            (F.col("d_name") == F.col("c_name"), 35, -10),
            (F.col("d_mktsegment") == F.col("c_mktsegment"), 15, -10),
            (
                F.abs(cents(F.col("d_acctbal")) - cents(F.col("c_acctbal")))
                <= 1000,
                20,
                -25,
            ),
        ],
        match_threshold=60,
        possible_threshold=20,
    )
    return scored.groupBy(
        "classification",
        (F.col("d_custkey") == F.col("c_custkey")).alias("is_true_pair"),
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


# --- dq12: column-profile drift between snapshots --------------------------

_DQ12_COLS = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


@query(
    "dq12_profile_drift",
    sql=f"""
    WITH newsnap AS ({_C7_NEW_SQL}),
    old_p AS (
      SELECT 'c_name' AS col, COUNT(*)::BIGINT AS n_rows,
             SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
             COUNT(DISTINCT c_name)::BIGINT AS n_distinct FROM customer
      UNION ALL
      SELECT 'c_nationkey', COUNT(*)::BIGINT, SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)::BIGINT, COUNT(DISTINCT c_nationkey)::BIGINT FROM customer
      UNION ALL
      SELECT 'c_acctbal', COUNT(*)::BIGINT, SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)::BIGINT, COUNT(DISTINCT c_acctbal)::BIGINT FROM customer
      UNION ALL
      SELECT 'c_mktsegment', COUNT(*)::BIGINT, SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)::BIGINT, COUNT(DISTINCT c_mktsegment)::BIGINT FROM customer
    ),
    new_p AS (
      SELECT 'c_name' AS col, COUNT(*)::BIGINT AS n_rows,
             SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
             COUNT(DISTINCT c_name)::BIGINT AS n_distinct FROM newsnap
      UNION ALL
      SELECT 'c_nationkey', COUNT(*)::BIGINT, SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)::BIGINT, COUNT(DISTINCT c_nationkey)::BIGINT FROM newsnap
      UNION ALL
      SELECT 'c_acctbal', COUNT(*)::BIGINT, SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)::BIGINT, COUNT(DISTINCT c_acctbal)::BIGINT FROM newsnap
      UNION ALL
      SELECT 'c_mktsegment', COUNT(*)::BIGINT, SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)::BIGINT, COUNT(DISTINCT c_mktsegment)::BIGINT FROM newsnap
    )
    SELECT o.col AS column_name,
           o.n_rows AS rows_old, n.n_rows AS rows_new,
           o.n_nulls AS nulls_old, n.n_nulls AS nulls_new,
           o.n_distinct AS distinct_old, n.n_distinct AS distinct_new,
           (n.n_nulls <> o.n_nulls
            OR 10 * abs(n.n_distinct - o.n_distinct) > o.n_distinct)
             AS drifted
    FROM old_p o JOIN new_p n ON n.col = o.col
    """,
)
def dq12_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift report between the customer table and the
    c7 mutated snapshot: per column, row/null/distinct counts side by
    side with a drift verdict (any null-count change, or >10% relative
    distinct-cardinality change — in integer cross-multiplied form, no
    float ratio). The publish gate that catches a broken upstream feed
    (segment vocabulary collapse, null storm) BEFORE c7's row-level
    diff is even computed — profile first, diff only if profiles move.

    Scale: each profile is ONE aggregate pass per table — a single
    .agg() carrying every column's conditional null-sum and
    countDistinct (Catalyst plans the multi-distinct via Expand, the
    dq2 shape), unpivoted to per-column rows with stack() AFTER the
    aggregate. One columnar scan per table (the r8 rewrite: the
    previous agg-per-column union scanned customer 12 times — invisible
    at sf0.01, 12x the IO at 100 TB); the drift join is
    column-cardinality. No row-level shuffle at all."""
    cust = load_table(spark, sf_dir, "customer")
    newsnap = _c7_new_snapshot(cust)

    def profile(df: DataFrame, cols: list[str]) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"__nulls_{c}")
            )
            aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        one = df.agg(*aggs)
        stacked = ", ".join(
            f"'{c}', __nulls_{c}, __dist_{c}" for c in cols
        )
        return one.select(
            F.expr(
                f"stack({len(cols)}, {stacked}) AS (col, n_nulls, n_distinct)"
            ),
            "n_rows",
        ).select("col", "n_rows", "n_nulls", "n_distinct")

    old_p = profile(cust, _DQ12_COLS)
    new_p = profile(newsnap, _DQ12_COLS).select(
        F.col("col").alias("n_col"),
        F.col("n_rows").alias("rows_new"),
        F.col("n_nulls").alias("nulls_new"),
        F.col("n_distinct").alias("distinct_new"),
    )
    j = old_p.join(new_p, old_p.col == new_p.n_col)
    drift = (F.col("nulls_new") != F.col("n_nulls")) | (
        10 * F.abs(F.col("distinct_new") - F.col("n_distinct"))
        > F.col("n_distinct")
    )
    return j.select(
        F.col("col").alias("column_name"),
        F.col("n_rows").alias("rows_old"),
        "rows_new",
        F.col("n_nulls").alias("nulls_old"),
        "nulls_new",
        F.col("n_distinct").alias("distinct_old"),
        "distinct_new",
        drift.alias("drifted"),
    )


_ER_BAND = (
    "CAST(CAST({x} AS DECIMAL(12,2)) * 100 AS BIGINT) // 100000"
)


def _er1b_universe(spark: SparkSession, sf_dir: str):
    """er1b's tight-blocked ER universe (the documented block-growth
    fix: every pass keys on TWO compared fields + nation), shared with
    er2b's weight fit. Returns (cust, dirty, pairs, cents) like
    _er1_universe."""
    from ..operators import linkage

    cust = load_table(spark, sf_dir, "customer")
    mod20, mod10 = F.col("c_custkey") % 20, F.col("c_custkey") % 10
    dirty = cust.where(mod10.isin(3, 7)).select(
        F.col("c_custkey").alias("d_custkey"),
        F.when(mod20 == 3, F.concat(F.col("c_name"), F.lit("_x")))
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.when(mod10 == 7, F.col("c_acctbal") + 7.31)
        .otherwise(F.col("c_acctbal"))
        .alias("d_acctbal"),
        F.when(mod20 == 13, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("d_mktsegment"),
    )

    def cents(c: F.Column) -> F.Column:
        return (c.cast("decimal(12,2)") * 100).cast("bigint")

    dirty_b = dirty.withColumn("d_band", F.expr(
        "(CAST(CAST(d_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) div 100000"
    ))
    clean_b = cust.withColumn("c_band", F.expr(
        "(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) div 100000"
    ))
    nation = ("d_nationkey", "c_nationkey")
    name = ("d_name", "c_name")
    seg = ("d_mktsegment", "c_mktsegment")
    band = ("d_band", "c_band")
    cand = linkage.multi_pass_candidates(
        dirty_b, clean_b, "d_custkey", "c_custkey",
        passes=[[nation, name, seg], [nation, name, band],
                [nation, seg, band]],
    )
    pairs = cand.join(dirty, "d_custkey").join(cust, "c_custkey")
    return cust, dirty, pairs, cents


# er1b's three tight two-field blocking passes, shared with er2b's fit
_ER1B_CAND_SQL = f"""
      SELECT DISTINCT d_custkey, c_custkey FROM (
        SELECT d.d_custkey, c.c_custkey
        FROM dirty d JOIN customer c
          ON d.d_nationkey = c.c_nationkey
         AND d.d_name = c.c_name AND d.d_mktsegment = c.c_mktsegment
        UNION ALL
        SELECT d.d_custkey, c.c_custkey
        FROM dirty d JOIN customer c
          ON d.d_nationkey = c.c_nationkey
         AND d.d_name = c.c_name
         AND {_ER_BAND.format(x='d.d_acctbal')}
             = {_ER_BAND.format(x='c.c_acctbal')}
        UNION ALL
        SELECT d.d_custkey, c.c_custkey
        FROM dirty d JOIN customer c
          ON d.d_nationkey = c.c_nationkey
         AND d.d_mktsegment = c.c_mktsegment
         AND {_ER_BAND.format(x='d.d_acctbal')}
             = {_ER_BAND.format(x='c.c_acctbal')}
      )
"""


@query(
    "er1b_linkage_tight_blocking",
    sql=f"""
    WITH dirty AS ({_ER1_DIRTY_SQL}),
    cand AS ({_ER1B_CAND_SQL}), scored AS (
      SELECT cand.d_custkey, cand.c_custkey,
             CAST(CASE WHEN d.d_name = c.c_name THEN 35 ELSE -10 END
                + CASE WHEN d.d_mktsegment = c.c_mktsegment
                       THEN 15 ELSE -10 END
                + CASE WHEN abs(
                         CAST(CAST(d.d_acctbal AS DECIMAL(12,2)) * 100
                              AS BIGINT)
                         - CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100
                                AS BIGINT)) <= 1000
                       THEN 20 ELSE -25 END AS BIGINT) AS score
      FROM cand
      JOIN dirty d ON d.d_custkey = cand.d_custkey
      JOIN customer c ON c.c_custkey = cand.c_custkey
    )
    SELECT CASE WHEN score >= 60 THEN 'match'
                WHEN score >= 20 THEN 'possible'
                ELSE 'non_match' END AS classification,
           (d_custkey = c_custkey) AS is_true_pair,
           COUNT(*)::BIGINT AS n_pairs,
           MIN(score) AS min_score,
           MAX(score) AS max_score
    FROM scored GROUP BY 1, 2
    """,
)
def er1b_linkage_tight_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """er1's documented block-growth fix, registered: three blocking
    passes keyed on PAIRS of the compared fields — (name, segment),
    (name, band), (segment, band), all with nation. Each planted defect
    corrupts exactly one field, so at least one pair survives intact:
    recall on true pairs is still complete (the multi-pass theorem),
    but blocks now require TWO field agreements, so the near-unique
    name keys collapse passes A/B to ~1-row blocks and pass C is the
    only moderate one — the pair volume that made er1 quadratic under
    fattened blocks (SCALE.md: 10.4x at sf1) disappears. Different
    candidate set => its own oracle; the confusion-matrix output schema
    matches er1 for side-by-side reading."""
    from ..operators import linkage

    cust, dirty, pairs, cents = _er1b_universe(spark, sf_dir)
    scored = linkage.score_pairs(
        pairs,
        comparisons=[
            (F.col("d_name") == F.col("c_name"), 35, -10),
            (F.col("d_mktsegment") == F.col("c_mktsegment"), 15, -10),
            (
                F.abs(cents(F.col("d_acctbal")) - cents(F.col("c_acctbal")))
                <= 1000,
                20,
                -25,
            ),
        ],
        match_threshold=60,
        possible_threshold=20,
    )
    return scored.groupBy(
        "classification",
        (F.col("d_custkey") == F.col("c_custkey")).alias("is_true_pair"),
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


# --- er2: Fellegi–Sunter weights FITTED from labeled pairs ----------------

_ER2_MATCH_T = 2_000_000   # >= 2 nats of log-likelihood ratio
_ER2_POSSIBLE_T = 0

_ER2_CENTS_D = "CAST(CAST(d.d_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
_ER2_CENTS_C = "CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
_ER2_FIELDS = ("name", "seg", "bal")


def _er2_weight_sql() -> str:
    """One fitted-weight column pair per field — the same smoothed
    integer-product ratios linkage.fit_fs_weights quantizes driver-side
    (round-to-micro-nat agrees cross-engine thanks to the boundary
    guard; see fit_fs_weights)."""
    cols = []
    for f in _ER2_FIELDS:
        cols.append(
            f"CAST(round(1000000 * ln(((at_{f} + 1) * (nf + 2))::DOUBLE"
            f" / (((nt + 2) * (af_{f} + 1))::DOUBLE))) AS BIGINT) AS wa_{f}"
        )
        cols.append(
            f"CAST(round(1000000 * ln(((nt - at_{f} + 1) * (nf + 2))::DOUBLE"
            f" / (((nt + 2) * (nf - af_{f} + 1))::DOUBLE))) AS BIGINT) AS wd_{f}"
        )
    return ",\n             ".join(cols)


@query(
    "er2_fellegi_sunter_fit",
    sql=f"""
    WITH dirty AS ({_ER1_DIRTY_SQL}),
    cand AS ({_ER1_CAND_SQL}),
    feat AS (
      SELECT cand.d_custkey, cand.c_custkey,
             (d.d_name = c.c_name) AS ag_name,
             (d.d_mktsegment = c.c_mktsegment) AS ag_seg,
             (abs({_ER2_CENTS_D} - {_ER2_CENTS_C}) <= 1000) AS ag_bal,
             (cand.d_custkey = cand.c_custkey) AS is_true_pair
      FROM cand
      JOIN dirty d ON d.d_custkey = cand.d_custkey
      JOIN customer c ON c.c_custkey = cand.c_custkey
    ), cnt AS (
      SELECT
        CAST(SUM(CASE WHEN is_true_pair THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        CAST(SUM(CASE WHEN NOT is_true_pair THEN 1 ELSE 0 END) AS BIGINT) AS nf,
        {", ".join(
            f"CAST(SUM(CASE WHEN ag_{f} AND is_true_pair THEN 1 ELSE 0 END) AS BIGINT) AS at_{f}, "
            f"CAST(SUM(CASE WHEN ag_{f} AND NOT is_true_pair THEN 1 ELSE 0 END) AS BIGINT) AS af_{f}"
            for f in _ER2_FIELDS
        )}
      FROM feat
    ), w AS (
      SELECT {_er2_weight_sql()}
      FROM cnt
    ), scored AS (
      SELECT f.is_true_pair,
             CAST({" + ".join(f"CASE WHEN ag_{f} THEN wa_{f} ELSE wd_{f} END" for f in _ER2_FIELDS)}
               AS BIGINT) AS score
      FROM feat f, w
    )
    SELECT CASE WHEN score >= {_ER2_MATCH_T} THEN 'match'
                WHEN score >= {_ER2_POSSIBLE_T} THEN 'possible'
                ELSE 'non_match' END AS classification,
           is_true_pair,
           COUNT(*)::BIGINT AS n_pairs,
           MIN(score) AS min_score,
           MAX(score) AS max_score
    FROM scored GROUP BY 1, 2
    """,
)
def er2_fellegi_sunter_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """er1's linkage with the weights FITTED instead of hand-set: per
    field, m/u agreement probabilities are estimated from the labeled
    candidate universe (Laplace-smoothed counts — in production a
    clerical sample; here the planted-defect ground truth), converted
    to integer micro-nat log-likelihood weights on the driver
    (linkage.fit_fs_weights — 8 ints of driver state, guarded
    rounding), then every pair is scored with the fitted weights and
    cut at 2.0/0.0 nats. Output is er1's confusion-matrix shape, so
    diffing er1 vs er2 measures what fitting buys over hand-tuning.
    Plan shape: er1's blocked candidate joins + ONE extra counting
    aggregate over the pair table (the fit), then the same
    scoring projection — still never an all-pairs product."""
    from ..operators import linkage

    cust, dirty, pairs, cents = _er1_universe(spark, sf_dir)
    agree = {
        "name": F.col("d_name") == F.col("c_name"),
        "seg": F.col("d_mktsegment") == F.col("c_mktsegment"),
        "bal": F.abs(cents(F.col("d_acctbal")) - cents(F.col("c_acctbal")))
        <= 1000,
    }
    is_true = F.col("d_custkey") == F.col("c_custkey")
    aggs = [
        F.sum(F.when(is_true, 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(~is_true, 1).otherwise(0)).cast("bigint").alias("nf"),
    ]
    for f, pred in agree.items():
        aggs.append(
            F.sum(F.when(pred & is_true, 1).otherwise(0))
            .cast("bigint")
            .alias(f"at_{f}")
        )
        aggs.append(
            F.sum(F.when(pred & ~is_true, 1).otherwise(0))
            .cast("bigint")
            .alias(f"af_{f}")
        )
    c = pairs.agg(*aggs).collect()[0]
    weights = linkage.fit_fs_weights(
        {f: (c[f"at_{f}"], c[f"af_{f}"]) for f in agree},
        n_true=c["nt"],
        n_false=c["nf"],
    )
    scored = linkage.score_pairs(
        pairs,
        comparisons=[
            (agree[f], weights[f][0], weights[f][1]) for f in agree
        ],
        match_threshold=_ER2_MATCH_T,
        possible_threshold=_ER2_POSSIBLE_T,
    )
    return scored.groupBy(
        "classification", is_true.alias("is_true_pair")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


@query(
    "er2b_fs_fit_tight",
    sql=f"""
    WITH dirty AS ({_ER1_DIRTY_SQL}),
    cand AS ({_ER1B_CAND_SQL}),
    feat AS (
      SELECT cand.d_custkey, cand.c_custkey,
             (d.d_name = c.c_name) AS ag_name,
             (d.d_mktsegment = c.c_mktsegment) AS ag_seg,
             (abs({_ER2_CENTS_D} - {_ER2_CENTS_C}) <= 1000) AS ag_bal,
             (cand.d_custkey = cand.c_custkey) AS is_true_pair
      FROM cand
      JOIN dirty d ON d.d_custkey = cand.d_custkey
      JOIN customer c ON c.c_custkey = cand.c_custkey
    ), cnt AS (
      SELECT
        CAST(SUM(CASE WHEN is_true_pair THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        CAST(SUM(CASE WHEN NOT is_true_pair THEN 1 ELSE 0 END) AS BIGINT) AS nf,
        {", ".join(
            f"CAST(SUM(CASE WHEN ag_{f} AND is_true_pair THEN 1 ELSE 0 END) AS BIGINT) AS at_{f}, "
            f"CAST(SUM(CASE WHEN ag_{f} AND NOT is_true_pair THEN 1 ELSE 0 END) AS BIGINT) AS af_{f}"
            for f in _ER2_FIELDS
        )}
      FROM feat
    ), w AS (
      SELECT {_er2_weight_sql()}
      FROM cnt
    ), scored AS (
      SELECT f.is_true_pair,
             CAST({" + ".join(f"CASE WHEN ag_{f} THEN wa_{f} ELSE wd_{f} END" for f in _ER2_FIELDS)}
               AS BIGINT) AS score
      FROM feat f, w
    )
    SELECT CASE WHEN score >= {_ER2_MATCH_T} THEN 'match'
                WHEN score >= {_ER2_POSSIBLE_T} THEN 'possible'
                ELSE 'non_match' END AS classification,
           is_true_pair,
           COUNT(*)::BIGINT AS n_pairs,
           MIN(score) AS min_score,
           MAX(score) AS max_score
    FROM scored GROUP BY 1, 2
    """,
)
def er2b_fs_fit_tight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """er2's Fellegi–Sunter fit on er1b's TIGHT-blocked universe — the
    production pairing at scale (the dd3b-twin stance): er2 over the
    loose (nation, segment)/(nation, band) blocks walls at sf10
    (candidate mass ~100x under 10x replication — SCALE.md), while the
    two-field passes keep pair volume flat AND recall complete (each
    planted defect corrupts one field). The fitted weights differ from
    er2's because the u-probabilities are estimated against a cleaner
    negative population — tight blocking doesn't just cut cost, it
    changes (usually sharpens) the evidence weights; diff er2 vs er2b
    to see it. Same guarded micro-nat quantization, same thresholds,
    same confusion-matrix shape."""
    from ..operators import linkage

    cust, dirty, pairs, cents = _er1b_universe(spark, sf_dir)
    agree = {
        "name": F.col("d_name") == F.col("c_name"),
        "seg": F.col("d_mktsegment") == F.col("c_mktsegment"),
        "bal": F.abs(cents(F.col("d_acctbal")) - cents(F.col("c_acctbal")))
        <= 1000,
    }
    is_true = F.col("d_custkey") == F.col("c_custkey")
    aggs = [
        F.sum(F.when(is_true, 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(~is_true, 1).otherwise(0)).cast("bigint").alias("nf"),
    ]
    for f, pred in agree.items():
        aggs.append(
            F.sum(F.when(pred & is_true, 1).otherwise(0))
            .cast("bigint")
            .alias(f"at_{f}")
        )
        aggs.append(
            F.sum(F.when(pred & ~is_true, 1).otherwise(0))
            .cast("bigint")
            .alias(f"af_{f}")
        )
    c = pairs.agg(*aggs).collect()[0]
    weights = linkage.fit_fs_weights(
        {f: (c[f"at_{f}"], c[f"af_{f}"]) for f in agree},
        n_true=c["nt"],
        n_false=c["nf"],
    )
    scored = linkage.score_pairs(
        pairs,
        comparisons=[
            (agree[f], weights[f][0], weights[f][1]) for f in agree
        ],
        match_threshold=_ER2_MATCH_T,
        possible_threshold=_ER2_POSSIBLE_T,
    )
    return scored.groupBy(
        "classification", is_true.alias("is_true_pair")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )
