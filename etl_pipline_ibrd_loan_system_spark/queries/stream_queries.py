"""Streaming-surface queries (SURVEY.md §2.H) over the `events` table.

h1 runs the tumbling-window aggregation as a batch plan; s1 runs the SAME
aggregation through Structured Streaming (file source -> memory sink) and
returns the final result — both hash-checked against one DuckDB oracle,
proving batch/streaming parity of the operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, sql_dsum
from ..streaming.microbatch import run_stream_to_memory, tumbling_window_agg
from . import query

_WINDOW_SQL = f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """


def _agg(events: DataFrame) -> DataFrame:
    out = tumbling_window_agg(
        events,
        ts_col="ts",
        window="1 hour",
        group_cols=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    )
    return out.drop("window_end")


@query("h1_tumbling_window_batch", sql=_WINDOW_SQL)
def h1_tumbling_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _agg(load_table(spark, sf_dir, "events"))


@query("s1_tumbling_window_stream", sql=_WINDOW_SQL)
def s1_tumbling_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming run of the same operator: parquet file source,
    complete-output memory sink, drained synchronously."""
    import tempfile

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema  # ts arrives as long (nanos)
    # the file-stream source wants a directory; stage a symlink
    stage_dir = tempfile.mkdtemp(prefix="s1_events_")
    os.symlink(path, os.path.join(stage_dir, "events.parquet"))
    stream = spark.readStream.schema(raw_schema).parquet(stage_dir)
    if "ts" in [f.name for f in raw_schema.fields]:
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    q = run_stream_to_memory(_agg(stream), "s1_windows", output_mode="complete")
    try:
        return spark.table("s1_windows").localCheckpoint(eager=True)
    finally:
        q.stop()
