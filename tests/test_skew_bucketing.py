"""Skew/shuffle-control proofs: salted ops preserve answers; bucketed
tables join with zero shuffle (plan-level assertion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.catalog import load_table
from etl_pipline_ibrd_loan_system_spark.operators.skew import salted_agg, salted_join
from etl_pipline_ibrd_loan_system_spark.sources.sinks import bucketed_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    salted = salted_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", salt=8
    )
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_agg_spreads_hot_key(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_linestatus"],
        aggs={"n": ("sum", F.count(F.lit(1)))},
        salt=8,
    )
    direct = dict(li.groupBy("l_linestatus").count().collect())
    got = {r.l_linestatus: r.n for r in out.collect()}
    assert got == direct


@pytest.fixture()
def warehouse(spark):
    yield
    for t in ("b_orders", "b_cust"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    bucketed_table(orders, "b_orders", "o_custkey", n_buckets=8,
                   path=str(tmp_path / "b_orders"))
    bucketed_table(cust, "b_cust", "o_custkey", n_buckets=8,
                   path=str(tmp_path / "b_cust"))
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling is the runtime escape hatch the repo's
    scale notes lean on (salting is the static one — d8): with one key
    carrying ~all rows, the sort-merge join's hot partition must be
    SPLIT at runtime (skew=true in the executed plan) while the answer
    stays exact."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # 50k rows on ONE key vs a trickle on 99 others
        left = spark.range(50_000).select(
            F.when(F.col("id") < 49_000, F.lit(7)).otherwise(F.col("id") % 99)
            .cast("long").alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        joined = left.join(right, "k")
        # execute THIS frame (count() would build its own plan and the
        # inspected one would never reach isFinalPlan=true)
        total = len(joined.collect())
        expect = left.where(F.col("k") < 100).count()
        assert total == expect
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, "AQE did not split the hot partition"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
