"""Synthesize an sf1.0-scale dataset from the driver's sf0.1 parquet.

The sandbox ships sf0.001/0.01/0.1 only; the 100x-scale claims in
SCALE.md deserve at least one measured decade. This replicates every
non-static table 10x with per-copy key offsets chosen so referential
integrity (lineitem->orders/part/supplier, orders->customer) and
per-key cardinalities (rows per order, events per user) are preserved
— the data grows the way a real workload grows, not by inflating hot
keys. region/nation stay fixed, as in TPC-H.

Output goes under the repo (.scale/sf1, gitignored) — /root/testdata
is read-only. Usage:

    python tools/scale_up.py [copies] [out_dir]
    SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# table -> columns shifted by k * (max(primary domain)+1) per copy k.
# Every foreign key shifts by ITS referenced table's stride, keeping
# joins consistent within a copy and disjoint across copies.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
STATIC = ["region", "nation"]

# stride source: table -> (table, column) whose max defines the offset
STRIDE_COL = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
    )
    src = os.environ.get("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table
    from etl_pipline_ibrd_loan_system_spark.session import get_session

    spark = get_session("scale_up")

    # load_table handles events' TIMESTAMP(NANOS) (nanosAsLong + rebuild);
    # the sf1 copy therefore carries micros timestamps, which load_table
    # passes through unchanged when reading the scaled dir back.
    strides = {
        name: load_table(spark, src, tbl).agg(F.max(col)).collect()[0][0] + 1
        for name, (tbl, col) in STRIDE_COL.items()
    }
    print("strides:", strides)

    for tbl in STATIC:
        df = load_table(spark, src, tbl)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{tbl}.parquet"))
        print(f"{tbl}: static copy")

    for tbl, shifts in KEYED.items():
        base = load_table(spark, src, tbl)
        parts = []
        for k in range(copies):
            c = base
            for col, stride_name in shifts.items():
                c = c.withColumn(
                    col, (F.col(col) + F.lit(k * strides[stride_name])).cast("bigint")
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        dest = os.path.join(out_dir, f"{tbl}.parquet")
        out.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{tbl}: {n} rows ({copies} copies)")


if __name__ == "__main__":
    main()
