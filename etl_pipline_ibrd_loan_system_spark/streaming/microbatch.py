"""Structured Streaming operators.

The reference's only streaming capability is the hourly offset-resumed
micro-batch (§2.H — covered by sources.paged_source). Beyond parity, the
engine exposes the Structured Streaming surface a modern pipeline needs:
event-time tumbling/sliding windows with watermarks, plus a foreachBatch
sink wrapper (the exactly-once JDBC-style sink pattern replacing the
reference's `write.jdbc` per DAG run, pyspark_dag2.py:428-440).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str,
    window: str,
    group_cols: list[str],
    aggs: list,
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Windowed aggregation, batch or streaming (same plan shape both ways:
    pass a readStream DataFrame to stream it). Emits `window_start`/
    `window_end` timestamps instead of the window struct so results are
    hash-comparable."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    out = src.groupBy(win.alias("w"), *group_cols).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("w", *group_cols)],
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> StreamingQuery:
    """Drive a streaming aggregation to completion against the in-memory
    sink (test/verification surface; production would use foreachBatch)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    return q


def foreach_batch_append(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> StreamingQuery:
    """foreachBatch sink wrapper: `batch_fn(batch_df, epoch_id)` runs once
    per micro-batch with the epoch id for idempotent writes (the streaming
    analog of the reference's per-run JDBC append)."""
    return (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
