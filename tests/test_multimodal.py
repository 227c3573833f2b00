"""Multimodal plumbing invariants: schema contract, Arrow batch path,
payload-free explode. (Value correctness vs DuckDB is in the oracle
gate — multimodal_queries.)"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipline_ibrd_loan_system_spark.catalog import load_table
from etl_pipline_ibrd_loan_system_spark.operators import multimodal


def _media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    return multimodal.with_media(docs, "text", "doc_id")


def test_media_schema_contract(spark, sf_dir):
    m = _media(spark, sf_dir)
    assert isinstance(m.schema["data"].dataType, T.BinaryType)
    meta = m.schema["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == [
        "fmt", "width", "height", "n_frames", "sample_rate",
    ]


def test_decode_media_runs_in_python_batches(spark, sf_dir):
    out = multimodal.decode_media(_media(spark, sf_dir))
    rows = out.collect()
    assert len(rows) == 40
    # byte stats computed from the real payload
    assert all(r.n_bytes > 0 and r.byte_sum > 0 for r in rows)
    assert set(out.columns) == {
        "media_id", "fmt", "n_bytes", "byte_sum", "width", "height",
    }


def test_extract_features_fixed_dim(spark, sf_dir):
    out = multimodal.extract_features(_media(spark, sf_dir), dim=16)
    rows = out.collect()
    assert all(len(r.feature) == 16 for r in rows)


def test_frame_sample_bounded_and_payload_free(spark, sf_dir):
    m = _media(spark, sf_dir)
    out = multimodal.frame_sample(m, every=5)
    assert "data" not in out.columns  # payload never rides the explode
    joined = out.groupBy("media_id").count().join(
        m.select("media_id", F.col("meta.n_frames").alias("nf")), "media_id"
    )
    bad = joined.where(
        F.col("count") != F.floor((F.col("nf") - 1) / 5) + 1
    )
    assert bad.count() == 0
