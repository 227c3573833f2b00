"""Partition-layout pruning proofs: static partition-filter pruning and
dynamic partition pruning (DPP) from a dimension-side filter.

At 100 TB the difference between scanning 5 partitions and 1 is the
query, so these gates pin the two pruning paths Spark gives a
hive-partitioned parquet layout:

- static: a literal predicate on the partition column never reaches row
  scanning — it lands in the scan's PartitionFilters and the file index
  drops the directories.
- dynamic: when the selective predicate lives on a JOINED dimension (the
  star-schema norm — "filter by region name", not by the fact's region
  key), DPP turns the dim's broadcast into a runtime IN-filter on the
  fact scan's partition column (`dynamicpruningexpression` in the plan),
  so the fact side still reads only matching directories.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _partitioned_orders(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_priority")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(path)
    )
    return spark.read.parquet(path)


def test_static_partition_filter_prunes_directories(spark, sf_dir, tmp_path):
    fact = _partitioned_orders(spark, sf_dir, tmp_path)
    q = fact.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    plan = _plan(q)
    # the literal predicate must be a partition filter on the scan, not a
    # post-scan Filter over all directories
    assert "PartitionFilters" in plan and "1-URGENT" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    expected = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert q.count() == expected


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    fact = _partitioned_orders(spark, sf_dir, tmp_path)
    # dimension keyed by the partition column; the selective predicate is
    # on a NON-key attribute, so static pushdown can't see it
    dim = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderpriority")
        .distinct()
        .withColumn("is_urgent", F.col("o_orderpriority").startswith("1"))
    )
    joined = (
        fact.join(F.broadcast(dim), "o_orderpriority")
        .where(F.col("is_urgent"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), (
        "fact scan lost its runtime partition filter:\n" + plan
    )
    expected = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderpriority").startswith("1"))
        .count()
    )
    assert joined.first()["n"] == expected
