"""Additional TPC-H-shaped join/agg workloads (round 6).

q3/q5 (queries/core.py) covered the star multi-join shapes; this module
adds the remaining canonical shapes a warehouse engine must execute
well: EXISTS-style semi join (q4), returned-item customer ranking
(q10), HAVING-on-aggregate subquery join (q18), and a NOT-EXISTS anti
join (f9). The sandbox lineitem lacks commit/receipt dates
(TESTDATA.md), so q4's "late" predicate is re-expressed on l_shipdate
vs o_orderdate — the join/plan shape (the thing being exercised) is
unchanged.

Every aggregate runs through functions/exact.py decimal space so the
DuckDB oracle hash-matches bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, sql_dsum
from . import query

_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "CAST(1 - l_discount AS DECIMAL(8,4))"
)


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(8,4)")


@query(
    "q4_order_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: EXISTS decorrelated to a LEFT SEMI join. The
    semi join carries the non-equi late-shipment predicate alongside the
    key equality, so each order is counted once no matter how many late
    lines it has — the plan Catalyst produces is the same
    broadcast/shuffled semi-hash-join a RewriteCorrelatedScalarSubquery
    pass would emit for the SQL form. At 100 TB the semi join shuffles
    only (orderkey, orderdate) against (orderkey, shipdate) projections:
    no payload columns move."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q10_returned_items",
    sql=f"""
    SELECT c_custkey, c_name, {sql_dsum(_REVENUE_SQL, 'revenue', cast=False)},
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: one-quarter returned-item revenue per customer,
    top 20. lineitem is filtered to returnflag='R' AT THE SCAN (pushed
    filter), orders to the quarter; customer and nation broadcast. The
    top-20 runs as TakeOrderedAndProject — per-partition heaps, no
    global sort ever materializes. c_custkey tiebreak pins the cut."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue(), "revenue", cast_to=None))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "q18_large_volume_customer",
    sql="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: orders whose total quantity exceeds a threshold,
    with customer attribution. Instead of the SQL text's
    aggregate-subquery + re-join + re-aggregate, the plan aggregates
    lineitem ONCE (map-side partial combine on l_orderkey), filters the
    tiny surviving set (46 orders of 15k at sf0.01 — selectivity grows
    no worse at 100 TB since the threshold binds per order, not per
    dataset), and broadcasts it against orders/customer: lineitem is
    scanned exactly once and nothing re-shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("__q"))
        .where(F.col("__q") > 300)
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.round(F.col("__q"), 2).cast("double").alias("sum_qty"),
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), "o_orderkey")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@query(
    "f9_customers_without_urgent_orders",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def f9_customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a LEFT ANTI join: customers who never placed an
    urgent order. The orders side is filtered to the predicate BEFORE
    the anti join and projected to the bare key, so the join input is
    the minimal (custkey) set; at scale this is a shuffled anti
    hash-join on the key only — or a broadcast when the filtered side
    fits, which Catalyst/AQE decides from runtime stats."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(urgent, "c_custkey", "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
