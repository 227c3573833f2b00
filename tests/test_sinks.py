"""Sink semantics (SURVEY §2.A A6/A7/A10): parquet fast-load,
partitioned overwrite layout, and the idempotent at-least-once append
that backs the resumable paged ingest (A2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.catalog import load_table
from etl_pipline_ibrd_loan_system_spark.sources import sinks


def test_fast_load_appends(spark, sf_dir, tmp_path):
    path = str(tmp_path / "sink")
    region = load_table(spark, sf_dir, "region")
    sinks.fast_load(region, path)
    sinks.fast_load(region, path)
    assert spark.read.parquet(path).count() == region.count() * 2


def test_partitioned_overwrite_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "part")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    sinks.partitioned_overwrite(orders, path, ["o_year"])
    one_year = spark.read.parquet(path).where(F.col("o_year") == 1995)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan must carry a partition filter, and the
    # result must match a direct filter
    assert "o_year" in plan
    direct = orders.where(F.col("o_year") == 1995).count()
    assert one_year.count() == direct


def test_idempotent_append_skips_seen_keys(spark, sf_dir, tmp_path):
    path = str(tmp_path / "idem")
    region = load_table(spark, sf_dir, "region")
    n1 = sinks.idempotent_append(spark, region, path, "r_regionkey")
    assert n1 == region.count()
    # replay the same batch: nothing new written
    n2 = sinks.idempotent_append(spark, region, path, "r_regionkey")
    assert n2 == 0
    assert spark.read.parquet(path).count() == region.count()
    # a genuinely new key goes through
    extra = region.limit(1).withColumn("r_regionkey", F.lit(9999))
    n3 = sinks.idempotent_append(spark, extra, path, "r_regionkey")
    assert n3 == 1
