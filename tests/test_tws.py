"""transformWithStateInPandas (streaming/tws.py): availability probe and
API parity with the applyInPandasWithState operator on a replayed stream."""

import pytest

from etl_pipline_ibrd_loan_system_spark.streaming.tws import tws_available


def test_tws_probe_removes_shim_dir_from_path():
    import sys

    from etl_pipline_ibrd_loan_system_spark.streaming.tws import _SHIM_DIR

    avail = tws_available()
    # The probe may legitimately leave the vendored protobuf runtime
    # importable (that's its job), but the shim DIRECTORY itself must
    # not linger on sys.path — it holds a sitecustomize.py that would
    # shadow a future interpreter's startup hooks.
    assert _SHIM_DIR not in sys.path
    # In this sandbox the vendored shim makes the API available; on a
    # machine with a real protobuf install it is trivially available.
    assert avail is True


def test_tws_first_event_matches_batch_argmin(spark, sf_dir):
    """st2's operator through a real stream equals the batch argmin —
    and therefore equals st1's applyInPandasWithState output, which the
    same oracle checks."""
    from etl_pipline_ibrd_loan_system_spark.queries.stream_queries import (
        st2_stateful_first_event_tws,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    got = st2_stateful_first_event_tws(spark, sf_dir)

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        events.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_id"),
        )
    )
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    assert len(got_rows) > 0


def test_rocksdb_scope_restores_conf(spark):
    from etl_pipline_ibrd_loan_system_spark.streaming.tws import (
        _rocksdb_state_store,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    with _rocksdb_state_store(spark):
        assert "RocksDB" in spark.conf.get(key)
    assert spark.conf.get(key, None) == prev
