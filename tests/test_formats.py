"""Source-format parity: the engine's tables round-trip through CSV and
JSON with values identical to the parquet truth (schema declared on
read — header/inference is never trusted for typed columns; the same
discipline as the reference's explicit per-stage StructTypes,
pyspark_dag2.py:84-116)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.catalog import load_table


def _sum_sig(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_orderkey")).alias("sk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sp"),
    ).collect()[0]


def test_csv_and_json_round_trip_match_parquet(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    want = _sum_sig(orders)

    csv_dir = str(tmp_path / "orders_csv")
    orders.write.mode("overwrite").option("header", True).csv(csv_dir)
    got_csv = _sum_sig(
        spark.read.schema(orders.schema).option("header", True).csv(csv_dir)
    )
    assert tuple(got_csv) == tuple(want)

    json_dir = str(tmp_path / "orders_json")
    orders.write.mode("overwrite").json(json_dir)
    got_json = _sum_sig(spark.read.schema(orders.schema).json(json_dir))
    assert tuple(got_json) == tuple(want)


def test_permissive_json_quarantines_corrupt_rows(spark, tmp_path):
    """Malformed records land in _corrupt_record instead of failing the
    read (the quarantine pattern for dirty feeds at scale)."""
    import json as _json

    p = tmp_path / "dirty.jsonl"
    rows = [_json.dumps({"id": i, "v": i * 1.5}) for i in range(5)]
    rows.insert(2, '{"id": 99, "v": BROKEN')
    p.write_text("\n".join(rows) + "\n")
    # cache() is required: Spark refuses plans that reference ONLY the
    # internal corrupt-record column against the raw file source
    df = (
        spark.read.schema("id long, v double, _corrupt_record string")
        .json(str(p))
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert good.count() == 5
    assert bad.count() == 1
    assert "BROKEN" in bad.collect()[0]["_corrupt_record"]
