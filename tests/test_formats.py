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


def test_binaryfile_source_feeds_decode_pipeline(spark, tmp_path):
    """Real media ingestion path: files on disk -> spark.read.format
    ('binaryFile') (path/length/content, with pathGlobFilter pruning
    non-media files at the listing, recursiveFileLookup for nested
    stores) -> decode_media over the content column. Proves the
    file-based entry into the multimodal pipeline, not just the
    parquet-borne payload one."""
    import numpy as np

    from etl_pipline_ibrd_loan_system_spark.operators import multimodal
    from tests.test_multimodal_png import encode_png

    media = tmp_path / "store" / "nested"
    media.mkdir(parents=True)
    want = {}
    for i in range(3):
        rng = np.random.default_rng(i)
        px = rng.integers(0, 256, size=(5 + i, 4, 3), dtype=np.uint8)
        (media / f"img_{i}.png").write_bytes(encode_png(px))
        want[i] = (4, 5 + i, int(px.astype(np.int64).sum()))
    (media / "ignore.txt").write_bytes(b"not media")

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .option("recursiveFileLookup", "true")
        .load(str(tmp_path / "store"))
    )
    assert files.count() == 3
    media_df = files.select(
        F.regexp_extract("path", r"img_(\d+)\.png", 1)
        .cast("bigint")
        .alias("media_id"),
        F.col("content").alias("data"),
        F.expr(
            "named_struct('fmt', 'png', 'width', 1, 'height', 1, "
            "'n_frames', 1, 'sample_rate', 16000)"
        ).alias("meta"),
    )
    got = {
        r.media_id: (r.width, r.height, r.byte_sum)
        for r in multimodal.decode_media(media_df).collect()
    }
    assert got == want


def test_orc_round_trip_matches_parquet(spark, sf_dir, tmp_path):
    """ORC is the other columnar format a warehouse migration meets;
    values must round-trip bit-identically through it."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    want = _sum_sig(orders)
    orc_dir = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(orc_dir)
    got = _sum_sig(spark.read.orc(orc_dir))
    assert tuple(got) == tuple(want)


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Schema evolution on disk: an old batch without a column and a
    new batch with it read as ONE table under mergeSchema, the missing
    column null-filled — the file-level twin of f6's union-by-name."""
    p = str(tmp_path / "evolving")
    spark.range(3).select(F.col("id"), F.lit("x").alias("a")).write.parquet(
        p + "/b=1"
    )
    spark.range(3, 5).select(
        F.col("id"), F.lit("y").alias("a"), F.lit(7).alias("extra")
    ).write.parquet(p + "/b=2")
    df = spark.read.option("mergeSchema", True).parquet(p)
    assert set(df.columns) == {"id", "a", "extra", "b"}
    rows = {r.id: r for r in df.collect()}
    assert rows[0].extra is None and rows[4].extra == 7
    # partition column b is discovered and typed
    assert rows[0].b == 1 and rows[4].b == 2


def test_parquet_layout_tuning_roundtrip(spark, sf_dir, tmp_path):
    """Write-side layout knobs a 100 TB table lives or dies by: zstd
    codec, bounded file sizes via maxRecordsPerFile, and row-group
    sizing via parquet.block.size — all must round-trip bit-identically
    and actually shape the files (file count = ceil(rows/maxRecords))."""
    import glob

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    path = str(tmp_path / "tuned")
    (
        orders.repartition(1)
        .write.option("compression", "zstd")
        .option("maxRecordsPerFile", 1000)
        .option("parquet.block.size", 256 * 1024)
        .parquet(path)
    )
    files = glob.glob(path + "/*.parquet")
    assert len(files) == -(-n // 1000), "maxRecordsPerFile not honored"
    back = spark.read.parquet(path)
    assert back.count() == n
    # bit-identical decimal-exact checksum over a numeric column
    from pyspark.sql import functions as F

    def chk(df):
        return df.agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
        ).collect()[0].s

    assert chk(back) == chk(orders)
    # zstd actually applied (parquet footer advertises the codec)
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(files[0]).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"


def test_streaming_available_now_trigger_drains_and_stops(spark, sf_dir, tmp_path):
    """Trigger.AvailableNow — the production batch-drain mode (bounded
    backfill through the streaming engine, then auto-stop): must
    process every staged file in rate-limited batches and terminate on
    its own, unlike processingTime triggers which run forever."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "avnow_src")
    os.makedirs(src)
    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    for i in range(3):
        events.where(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
    import glob as g
    import shutil

    for i in range(3):
        part = g.glob(f"{src}/b{i}/*.parquet")[0]
        shutil.move(part, f"{src}/{i:02d}.parquet")
        shutil.rmtree(f"{src}/b{i}")
    schema = spark.read.parquet(f"{src}/00.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("avnow")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query did not self-stop"
    got = {r.event_type: r.n for r in spark.table("avnow").collect()}
    exp = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp
