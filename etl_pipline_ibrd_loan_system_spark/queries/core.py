"""Core relational queries: cleaning / filter / projection / aggregates
(SURVEY.md §2.B, §2.D) mapped onto the driver testdata per FIXTURES.md §E.

The loan-star roles: `lineitem` stands in for fact-grain staging rows,
`orders` for loan headers, `customer`/`nation`/`region` for the recodable
dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import davg, dsum, sql_davg, sql_dsum
from ..operators import cleaning
from . import query

# --- flagship: dashboard-shaped star aggregate (TPC-H Q1 form) -----------
# Mirrors the BI layer's core question — grouped SUM/AVG/COUNT measures over
# fact-grain rows with a date predicate (SURVEY.md §2.D D2-D5, §3.3).


@query(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4))', 'sum_disc_price', cast=False)},
           {sql_dsum('CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))', 'sum_charge', cast=False)},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # multiply in decimal space so Spark and the oracle are exact end-to-end
    disc_price = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(8,4)")
    charge = disc_price * (1 + F.col("l_tax")).cast("decimal(8,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", cast_to=None),
            dsum(charge, "sum_charge", cast_to=None),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- B1: IN-list snapshot filter (pyspark_dag2.py:120-126) ---------------


@query(
    "b1_isin_snapshot_filter",
    sql="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
    """,
)
def b1_isin_snapshot_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    kept = cleaning.snapshot_filter(li, "l_returnflag", ["A", "R"])
    return kept.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


# --- B2: multi-column drop (pyspark_dag2.py:123,127) ---------------------


@query(
    "b2_drop_columns",
    sql="SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders",
)
def b2_drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return cleaning.drop_columns(orders, ["o_orderstatus", "o_orderpriority"])


# --- B3: lowercase-normalize all string columns (pyspark_dag2.py:130-132) -


@query(
    "b3_lowercase_strings",
    sql="""
    SELECT c_custkey, LOWER(c_name) AS c_name, c_nationkey, c_acctbal,
           LOWER(c_mktsegment) AS c_mktsegment
    FROM customer
    """,
)
def b3_lowercase_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleaning.lowercase_strings(load_table(spark, sf_dir, "customer"))


# --- D2: COUNT measure by group (dashboard "Number of Loans") ------------


@query(
    "d2_count_by_group",
    sql="SELECT o_orderstatus, COUNT(*) AS n_loans FROM orders GROUP BY o_orderstatus",
)
def d2_count_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_loans"))
