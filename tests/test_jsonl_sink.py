"""Commit protocol of the `jsonl_commit` Python DataSource writer
(sources/jsonl_sink.py): manifest-as-truth, append/overwrite, orphaned
speculative attempts, failed-job abort, and streaming epoch idempotence."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.sources import jsonl_sink


def _rows_on_disk(path: str) -> list[dict]:
    """Rows visible through the manifest — the committed view."""
    out = []
    for entry in jsonl_sink.read_manifest(path)["files"]:
        with open(os.path.join(path, entry["file"])) as fh:
            out += [json.loads(line) for line in fh]
    return out


def test_batch_write_publishes_manifest_and_rows(spark, tmp_path):
    sink = str(tmp_path / "out")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(4)
    jsonl_sink.write_jsonl(df, sink)
    man = jsonl_sink.read_manifest(sink)
    assert man["total_rows"] == 100
    assert len(man["files"]) == 4
    assert os.path.exists(os.path.join(sink, "_SUCCESS"))
    assert os.listdir(os.path.join(sink, "_staged")) == []
    got = sorted(_rows_on_disk(sink), key=lambda r: r["id"])
    assert [r["id"] for r in got] == list(range(100))
    assert got[7]["v"] == 14


def test_append_merges_manifest(spark, tmp_path):
    sink = str(tmp_path / "out")
    jsonl_sink.write_jsonl(spark.range(10).coalesce(1), sink)
    jsonl_sink.write_jsonl(spark.range(10, 15).coalesce(1), sink, mode="append")
    man = jsonl_sink.read_manifest(sink)
    assert man["total_rows"] == 15
    assert sorted(r["id"] for r in _rows_on_disk(sink)) == list(range(15))


def test_overwrite_replaces_and_sweeps_strays(spark, tmp_path):
    sink = str(tmp_path / "out")
    jsonl_sink.write_jsonl(spark.range(10).coalesce(1), sink)
    # a stray part file no manifest references (crashed previous job)
    with open(os.path.join(sink, "stray.jsonl"), "w") as fh:
        fh.write('{"id": 999}\n')
    jsonl_sink.write_jsonl(spark.range(3).coalesce(1), sink)
    assert sorted(r["id"] for r in _rows_on_disk(sink)) == [0, 1, 2]
    assert not os.path.exists(os.path.join(sink, "stray.jsonl"))


def test_orphaned_speculative_attempt_never_published(spark, tmp_path):
    sink = str(tmp_path / "out")
    os.makedirs(os.path.join(sink, "_staged"))
    # a lost attempt's staged file, present before the job commits
    with open(os.path.join(sink, "_staged", "attempt-dead.jsonl"), "w") as fh:
        fh.write('{"id": -1}\n')
    jsonl_sink.write_jsonl(spark.range(5).coalesce(1), sink)
    assert sorted(r["id"] for r in _rows_on_disk(sink)) == [0, 1, 2, 3, 4]
    assert os.listdir(os.path.join(sink, "_staged")) == []  # swept


def test_failed_job_publishes_nothing(spark, tmp_path):
    sink = str(tmp_path / "out")
    os.makedirs(sink)
    df = spark.range(10).repartition(2).select(
        F.expr("CASE WHEN id = 7 THEN raise_error('boom') ELSE CAST(id AS STRING) END").alias("x")
    )
    jsonl_sink.register(spark)
    with pytest.raises(Exception, match="boom"):
        df.write.format(jsonl_sink.FORMAT_NAME).mode("overwrite").option(
            "path", sink
        ).save()
    assert not os.path.exists(os.path.join(sink, jsonl_sink.MANIFEST))
    assert not [f for f in os.listdir(sink) if f.endswith(".jsonl")]


def test_streaming_epochs_and_redelivery_idempotence(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sink)
    spark.range(4).coalesce(1).write.parquet(src)
    jsonl_sink.register(spark)
    stream = spark.readStream.schema("id long").parquet(src)
    q = (
        stream.writeStream.format(jsonl_sink.FORMAT_NAME)
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch
        spark.range(4, 6).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    manifests = sorted(f for f in os.listdir(sink) if f.startswith("_epoch_"))
    assert len(manifests) >= 2
    ids = []
    for mf in manifests:
        with open(os.path.join(sink, mf)) as fh:
            for entry in json.load(fh)["files"]:
                with open(os.path.join(sink, entry["file"])) as data:
                    ids += [json.loads(l)["id"] for l in data]
    assert sorted(ids) == [0, 1, 2, 3, 4, 5]

    # re-delivered epoch: same batchId commits AGAIN -> must be a no-op
    factory = jsonl_sink.make_jsonl_commit_datasource()
    ds = factory(options={"path": sink})
    writer = ds.streamWriter(None, False)
    staged = os.path.join(sink, "_staged", "attempt-redeliver.jsonl")
    with open(staged, "w") as fh:
        fh.write('{"id": 0}\n')

    class Msg:
        name = "attempt-redeliver.jsonl"
        n_rows = 1

    writer.commit([Msg()], batchId=0)  # epoch 0 already has a manifest
    with open(os.path.join(sink, "_epoch_0.json")) as fh:
        epoch0 = json.load(fh)
    assert all("redeliver" not in e["file"] for e in epoch0["files"])
    assert not os.path.exists(staged)  # duplicate staged file dropped
