"""Streaming-surface queries (SURVEY.md §2.H) over the `events` table.

h1 runs the tumbling-window aggregation as a batch plan; s1 runs the SAME
aggregation through Structured Streaming (file source -> memory sink) and
returns the final result — both hash-checked against one DuckDB oracle,
proving batch/streaming parity of the operator.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions.exact import dsum, sql_dsum
from ..operators import sketches
from ..streaming.microbatch import run_stream_to_memory, tumbling_window_agg
from .star_queries import _DIM1_SQL
from . import query

_WINDOW_SQL = f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """


@contextlib.contextmanager
def _stream_partitions(spark: SparkSession, n: int = 4):
    """Pin a small shuffle-partition count for the duration of a verification
    stream: every stateful streaming operator materializes one state store
    PER shuffle partition per micro-batch, so 32 partitions over a
    few-thousand-row replay is pure overhead. Production streams size this
    to throughput; the stream's partitioning is fixed at first start."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _events_stream_factory(spark: SparkSession, sf_dir: str, prefix: str):
    """Stage the events parquet behind a file-stream source directory and
    return a zero-arg factory producing fresh streaming DataFrames.

    Mirrors catalog.load_table's ts normalization exactly: older testdata
    stores `ts` as TIMESTAMP(NANOS) parquet (read as long via
    `nanosAsLong`, rebuilt with integer division); current testdata stores
    micros TIMESTAMP_NTZ, which the streaming surface additionally casts
    to TIMESTAMP: watermarks/event-time reject TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and the session timezone is
    pinned UTC (session.py:40) so the cast preserves wall-clock values
    bit-exactly vs the DuckDB oracle."""
    import tempfile

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    stage_dir = tempfile.mkdtemp(prefix=prefix)
    os.symlink(path, os.path.join(stage_dir, "events.parquet"))

    def stream() -> DataFrame:
        s = spark.readStream.schema(raw_schema).parquet(stage_dir)
        if isinstance(raw_schema["ts"].dataType, T.LongType):
            s = s.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(raw_schema["ts"].dataType, T.TimestampNTZType):
            s = s.withColumn("ts", F.col("ts").cast("timestamp"))
        return s

    return stream


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
    stream = _events_stream_factory(spark, sf_dir, "s1_events_")()
    with _stream_partitions(spark):
        q = run_stream_to_memory(_agg(stream), "s1_windows", output_mode="complete")
        try:
            return spark.table("s1_windows").localCheckpoint(eager=True)
        finally:
            q.stop()


@query(
    "h2_sliding_window_batch",
    sql=f"""
    WITH cand AS (
      SELECT event_type, value,
             unnest([
               make_timestamp((floor(epoch(ts) / 1800) * 1800)::BIGINT * 1000000),
               make_timestamp(((floor(epoch(ts) / 1800) - 1) * 1800)::BIGINT * 1000000)
             ]) AS window_start
      FROM events
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM cand GROUP BY window_start, event_type
    """,
)
def h2_sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h window sliding every 30min: each event lands in exactly two
    windows; the oracle materializes both candidate starts per event."""
    events = load_table(spark, sf_dir, "events")
    out = tumbling_window_agg(
        events,
        ts_col="ts",
        window="1 hour",
        slide="30 minutes",
        group_cols=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    )
    return out.drop("window_end")


@query(
    "h3_session_window_batch",
    sql=f"""
    WITH m AS (
      SELECT user_id, ts, event_id, value,
             -- >= : Spark session windows are [start, last+gap) half-open,
             -- so an event exactly `gap` after its predecessor opens a NEW
             -- session
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT *, SUM(new_s) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS sid
      FROM m
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM g GROUP BY user_id, sid
    """,
)
def h3_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (5 min): Spark session_window vs the
    classic gaps-and-islands SQL replay (session end = last event +
    gap, per Spark semantics)."""
    from ..streaming.microbatch import session_window_agg

    events = load_table(spark, sf_dir, "events")
    return session_window_agg(
        events,
        ts_col="ts",
        gap="5 minutes",
        group_cols=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    )


_H3_SQL = f"""
    WITH m AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT *, SUM(new_s) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS sid
      FROM m
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM g GROUP BY user_id, sid
    """


@query("s3_session_window_stream", sql=_H3_SQL)
def s3_session_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming run of the h3 session-window aggregate
    (5-minute gap, per-user), parquet file source -> complete-output
    memory sink: open sessions live in the state store and MERGE when a
    later micro-batch extends them — the semantics that distinguish
    streaming session windows from a batch groupBy. Hash-checked
    against the identical gaps-and-islands oracle as h3 (batch/stream
    parity). State scale note: complete mode is the finite-replay
    verification harness; a production stream uses a watermark +
    append so closed sessions leave the store."""
    from ..streaming.microbatch import run_stream_to_memory, session_window_agg

    stream = _events_stream_factory(spark, sf_dir, "s3_events_")()
    agg = session_window_agg(
        stream,
        ts_col="ts",
        gap="5 minutes",
        group_cols=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    )
    with _stream_partitions(spark):
        q = run_stream_to_memory(agg, "s3_sessions", output_mode="complete")
        try:
            return spark.table("s3_sessions").localCheckpoint(eager=True)
        finally:
            q.stop()


@query(
    "st1_stateful_first_event",
    sql="""
    SELECT user_id, ts AS first_ts, event_id AS first_id FROM (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def st1_stateful_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) through a real
    stream: first event per user across micro-batches; oracle is the
    equivalent argmin SQL."""
    from ..streaming.microbatch import stateful_first_event

    stream = _events_stream_factory(spark, sf_dir, "st1_events_")()
    out = stateful_first_event(stream, "user_id", "ts", "event_id")
    with _stream_partitions(spark):
        q = run_stream_to_memory(out, "st1_first", output_mode="append")
        try:
            return spark.table("st1_first").localCheckpoint(eager=True)
        finally:
            q.stop()


@query(
    "st2_stateful_first_event_tws",
    sql="""
    SELECT user_id, ts AS first_ts, event_id AS first_id FROM (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def st2_stateful_first_event_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME first-event operator through Spark 4's
    transformWithStateInPandas (typed ValueState on RocksDB) — the
    stateful-streaming successor API, unblocked in round 6 by
    root-causing the round-5 "pre-init crash" to a missing
    google.protobuf runtime (streaming/tws.py, vendor/pbshim). Checked
    against the identical argmin oracle as st1, proving API parity. On
    an environment where neither the protobuf runtime nor the shim can
    import, falls back to the applyInPandasWithState operator — same
    semantics, same oracle — and says so on stderr."""
    from ..streaming.tws import (
        _rocksdb_state_store,
        stateful_first_event_tws,
        tws_available,
    )

    if not tws_available():  # pragma: no cover - sandbox has the shim
        import sys

        print(
            "st2: transformWithState unavailable (no protobuf runtime); "
            "falling back to applyInPandasWithState",
            file=sys.stderr,
        )
        return st1_stateful_first_event(spark, sf_dir)

    stream = _events_stream_factory(spark, sf_dir, "st2_events_")()
    out = stateful_first_event_tws(stream, "user_id", "ts", "event_id")
    with _stream_partitions(spark), _rocksdb_state_store(spark):
        q = run_stream_to_memory(out, "st2_first", output_mode="append")
        try:
            return spark.table("st2_first").localCheckpoint(eager=True)
        finally:
            q.stop()


@query(
    "sd1_streaming_dedup",
    sql="SELECT DISTINCT user_id, event_type FROM events",
)
def sd1_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (dropDuplicatesWithinWatermark)
    through a real stream. The watermark spans the whole replayed range,
    so the emitted key set equals batch DISTINCT — which is the oracle;
    only the key columns are projected because WHICH physical row wins
    per key is arrival-order-dependent, the key set is not."""
    from ..streaming.microbatch import run_stream_to_memory, streaming_dedup

    stream = _events_stream_factory(spark, sf_dir, "sd1_events_")()
    out = streaming_dedup(
        stream, ["user_id", "event_type"], "ts", watermark="365 days"
    ).select("user_id", "event_type")
    with _stream_partitions(spark):
        q = run_stream_to_memory(out, "sd1_dedup", output_mode="append")
        try:
            return spark.table("sd1_dedup").localCheckpoint(eager=True)
        finally:
            q.stop()


@query(
    "ss1_stream_stream_interval_join",
    sql="""
    SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
           c.ts AS click_ts, e.ts AS error_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def ss1_stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join through two real streams: errors within
    10 minutes after a click by the same user. The full-range watermark
    makes the emitted set equal the batch interval join — the oracle; in
    production the watermark bounds both sides' join state instead."""
    from ..streaming.microbatch import interval_join, run_stream_to_memory

    stream = _events_stream_factory(spark, sf_dir, "ss1_events_")
    clicks = stream().where(F.col("event_type") == "click")
    errors = stream().where(F.col("event_type") == "error")
    joined = interval_join(
        clicks, errors, "user_id", "ts", "ts", "10 MINUTES", "365 days"
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("error_id"),
        F.col("l.ts").alias("click_ts"),
        F.col("r.ts").alias("error_ts"),
    )
    with _stream_partitions(spark):
        q = run_stream_to_memory(joined, "ss1_join", output_mode="append")
        try:
            return spark.table("ss1_join").localCheckpoint(eager=True)
        finally:
            q.stop()


_S2_SQL = f"""
    SELECT date_trunc('hour', ts) AS window_start, c_mktsegment,
           COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY date_trunc('hour', ts), c_mktsegment
    """


def _s2_agg(events: DataFrame, cust: DataFrame) -> DataFrame:
    enriched = events.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        events.user_id == F.col("c_custkey"),
    )
    out = tumbling_window_agg(
        enriched,
        ts_col="ts",
        window="1 hour",
        group_cols=["c_mktsegment"],
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    )
    return out.drop("window_end")


@query("s2_stream_static_enrich", sql=_S2_SQL)
def s2_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins a BROADCAST
    static dimension (customer) per micro-batch before the windowed
    aggregate — the canonical Structured Streaming enrichment shape.
    The static side is planned once and broadcast into every batch;
    no stream-side shuffle happens for the join (only the stateful
    window aggregation keys a shuffle). The oracle runs the identical
    join+window as one batch SQL statement, proving stream/batch
    parity of the enrichment."""
    stream = _events_stream_factory(spark, sf_dir, "s2_events_")()
    cust = load_table(spark, sf_dir, "customer")
    with _stream_partitions(spark):
        q = run_stream_to_memory(
            _s2_agg(stream, cust), "s2_enriched", output_mode="complete"
        )
        try:
            return spark.table("s2_enriched").localCheckpoint(eager=True)
        finally:
            q.stop()


# --- s4: watermark late-data drop ----------------------------------------

_S4_SQL = f"""
    WITH wm AS (
      SELECT make_timestamp(epoch_ms(MAX(ts)) * 1000 - 3600000000::BIGINT) AS w
      FROM events WHERE event_id % 4 = 1
    ), kept AS (
      SELECT * FROM events
      WHERE event_id % 4 IN (1, 2)
         OR date_trunc('hour', ts) + INTERVAL 1 HOUR > (SELECT w FROM wm)
    )
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM kept
    GROUP BY date_trunc('hour', ts), event_type
    """


@query("s4_watermark_late_drop", sql=_S4_SQL)
def s4_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-enforced late-data DROP through a real three-batch
    stream — the one streaming semantics every other stream query here
    deliberately avoids by spanning the whole range with its watermark.

    Spark's micro-batch watermark protocol (statefulOperators.scala:
    late-events filter vs eviction watermark) is lenient by one batch:
    rows in batch N are filtered against the watermark computed from
    batches 0..N-2 (the "previous" watermark), while state eviction
    uses batches 0..N-1. So the replay stages three deterministic
    batches by event_id ring class:

      batch0 (%4 == 1)      advances the watermark to max(ts)-1h
      batch1 (%4 == 2)      filtered vs the initial 1970 watermark: all kept
      batch2 (%4 in {{0,3}})  filtered vs wm1 = ms-floor(max ts of batch0)-1h:
                            a row survives iff its window END > wm1

    The oracle replays exactly that — including the millisecond floor
    Spark applies to tracked event time — so the gate proves the drop
    rule, not just "a stream ran". Update-mode emissions are folded to
    final state per key via max_by on the monotone count (each
    re-emission of a key strictly increases n_events). Verified
    boundary: window_end > wm kept, <= dropped (watermarkPredicateForKeys
    is LessThanOrEqual)."""
    import glob
    import shutil
    import tempfile

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    stage = tempfile.mkdtemp(prefix="s4_events_")
    ring = F.col("event_id") % 4
    batches = [raw.where(ring == 1), raw.where(ring == 2),
               raw.where((ring == 3) | (ring == 0))]
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(f"{stage}/b{i}")
        part = glob.glob(f"{stage}/b{i}/*.parquet")[0]
        shutil.move(part, f"{stage}/{i:02d}.parquet")
        shutil.rmtree(f"{stage}/b{i}")
        # file order IS batch order: FileStreamSource picks files by
        # modification time, so pin mtimes far apart
        os.utime(f"{stage}/{i:02d}.parquet", (1_000_000 + i * 1000,) * 2)
    schema = spark.read.parquet(f"{stage}/00.parquet").schema
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    agg = tumbling_window_agg(
        s,
        ts_col="ts",
        window="1 hour",
        group_cols=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
        watermark="1 hour",
    ).drop("window_end")
    with _stream_partitions(spark):
        q = run_stream_to_memory(agg, "s4_windows", output_mode="update")
        try:
            emitted = spark.table("s4_windows").localCheckpoint(eager=True)
        finally:
            q.stop()
    final = (
        emitted.groupBy("window_start", "event_type")
        .agg(
            F.max_by(
                F.struct("n_events", "sum_value"), "n_events"
            ).alias("st")
        )
        .select(
            "window_start",
            "event_type",
            F.col("st.n_events").alias("n_events"),
            F.col("st.sum_value").alias("sum_value"),
        )
    )
    return final


# --- ss2: stream-stream LEFT OUTER interval join -------------------------


@query(
    "ss2_stream_stream_left_outer",
    sql="""
    SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
           c.ts AS click_ts, epoch_us(e.ts) AS error_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def ss2_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the hard half of ss1:
    unmatched clicks must emit null-padded, and Spark only does that
    when the watermark PROVES no future error can still match (left
    state evicted+emitted in the batch whose eviction watermark passes
    click_ts + interval).

    Protocol proven here (and why each piece is needed):
      * the join's watermark is the MIN over both inputs — a sentinel
        advancing only the click side never flushes anything, so the
        sentinel event type passes BOTH side filters;
      * eviction in batch N uses the watermark from batches 0..N-1, so
        TWO far-future sentinel batches follow the data batch: the
        first advances the watermark, the second triggers the eviction
        pass that emits the 'left_outer' nulls (Spark's trailing
        no-data batch then finalizes state only);
      * sentinel rows (event_id >= 999_999_990, matching each other
        within their own window) are filtered from the result.

    Emitted set == the batch LEFT OUTER interval join — the oracle. In
    production the sentinel role is played by ordinary stream progress;
    this replay makes the flush deterministic and gate-checkable."""
    import glob
    import shutil
    import tempfile

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    stage = tempfile.mkdtemp(prefix="ss2_events_")
    raw.coalesce(1).write.parquet(f"{stage}/b0")
    for i, day in ((1, "2030-01-01"), (2, "2030-01-02")):
        spark.createDataFrame(
            [(999_999_990 + i, f"{day} 00:00:00", -1, "sentinel", 0.0, "{}")],
            "event_id bigint, ts string, user_id bigint, "
            "event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{stage}/b{i}")
    for i in range(3):
        part = glob.glob(f"{stage}/b{i}/*.parquet")[0]
        shutil.move(part, f"{stage}/{i:02d}.parquet")
        shutil.rmtree(f"{stage}/b{i}")
        os.utime(f"{stage}/{i:02d}.parquet", (1_000_000 + i * 1000,) * 2)
    schema = spark.read.parquet(f"{stage}/00.parquet").schema

    def side(types: list[str]) -> DataFrame:
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        return s.where(F.col("event_type").isin(*types))

    from ..streaming.microbatch import interval_join

    joined = interval_join(
        side(["click", "sentinel"]),
        side(["error", "sentinel"]),
        "user_id",
        "ts",
        "ts",
        "10 MINUTES",
        "365 days",
        how="left_outer",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("error_id"),
        F.col("l.ts").alias("click_ts"),
        # nullable micros, not a nullable TIMESTAMP: pandas compares NaT
        # slots of mixed-resolution datetime columns as unequal, so the
        # canonicalizer must see int/NaN here (click_ts is never null)
        F.unix_micros(F.col("r.ts")).alias("error_ts_us"),
    )
    with _stream_partitions(spark):
        q = run_stream_to_memory(joined, "ss2_join", output_mode="append")
        try:
            emitted = spark.table("ss2_join").localCheckpoint(eager=True)
        finally:
            q.stop()
    return emitted.where(F.col("click_id") < 999_999_990)


# --- s5: streaming point-in-time SCD2 enrichment --------------------------


_S5_SQL = f"""
    {_DIM1_SQL}
    SELECT d.sk, d.s_suppkey, d.s_name, d.is_current,
           COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM (SELECT user_id % 100 + 1 AS k,
                 DATE '2024-01-01' + CAST(event_id % 400 AS INTEGER)
                   AS probe_date,
                 value
          FROM events) e
    JOIN dim1 d
      ON d.s_suppkey = e.k
     AND d.start_date <= e.probe_date
     AND (d.end_date IS NULL OR d.end_date > e.probe_date)
    GROUP BY d.sk, d.s_suppkey, d.s_name, d.is_current
    """


@query("s5_stream_scd2_enrich", sql=_S5_SQL)
def s5_stream_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g8's point-in-time SCD2 join running INSIDE Structured Streaming:
    each streamed event is enriched with the supplier version in effect
    on its own (derived) probe date, then aggregated statefully. The
    broadcast PIT shape is stateless per micro-batch — the dimension is
    planned once and broadcast into every batch, the stream side never
    shuffles for the join (only the aggregate keys a shuffle) — so the
    operator composes with streaming for free, which is the point of
    expressing it as one join rather than procedural lookups. The
    oracle replays the identical join+aggregate as batch SQL: stream /
    batch parity, the s1/h1 discipline."""
    from ..operators.scd import scd2_pointintime_join
    from .star_queries import ASOF1, scd_fixture

    dim0, staging = scd_fixture(spark, sf_dir)
    from ..operators.scd import scd2_apply

    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"], fixed_cols=["s_nationkey"],
        asof=ASOF1, sk_col="sk", sk_strategy="dense",
    )
    stream = _events_stream_factory(spark, sf_dir, "s5_events_")()
    probes = stream.select(
        (F.col("user_id") % 100 + 1).alias("s_suppkey"),
        F.date_add(
            F.to_date(F.lit("2024-01-01")),
            (F.col("event_id") % 400).cast("int"),
        ).alias("probe_date"),
        "value",
    )
    enriched = scd2_pointintime_join(
        probes, dim1, key="s_suppkey", fact_date_col="probe_date",
    )
    agg = enriched.groupBy("sk", "s_suppkey", "s_name", "is_current").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )
    with _stream_partitions(spark):
        q = run_stream_to_memory(agg, "s5_enriched", output_mode="complete")
        try:
            return spark.table("s5_enriched").localCheckpoint(eager=True)
        finally:
            q.stop()


# --- s6: streaming corpus intake (stateless gate + split, one agg) --------

_S6_SQL = """
    WITH base AS (
      SELECT doc_id, n_chars,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             t -> t != ''))::BIGINT AS n_tokens,
             CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                 1, 15) AS BIGINT) % 100 AS bkt
      FROM documents
    )
    SELECT CASE WHEN bkt < 80 THEN 'train'
                WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split,
           (n_tokens >= 5) AS keep,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_chars)::BIGINT AS sum_chars
    FROM base GROUP BY 1, 2
    """


def _s6_intake(docs: DataFrame) -> DataFrame:
    from ..operators.dedup import shared_hash60

    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    bkt = (
        shared_hash60(
            F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
        )
        % 100
    )
    base = docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        bkt.alias("bkt"),
    )
    split = (
        F.when(F.col("bkt") < 80, "train")
        .when(F.col("bkt") < 90, "val")
        .otherwise("test")
    )
    return base.groupBy(
        split.alias("split"), (F.col("n_tokens") >= 5).alias("keep")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@query("s6_stream_corpus_intake", sql=_S6_SQL)
def s6_stream_corpus_intake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus intake: documents arrive through a parquet file
    stream and flow through the STATELESS prep projections — token
    count, minimum-length keep gate, sp1's deterministic hash split —
    into one complete-mode accounting aggregate (docs and chars per
    split x verdict). The streaming half of the corpus story: because
    every per-row decision is a pure hash/count function (the sampling
    module's design center), the same intake code runs identically in
    batch backfill and continuous ingestion, and the oracle proves the
    stream drains to the exact batch answer (the s1/h1 discipline,
    applied to documents instead of events)."""
    import tempfile

    path = os.path.join(sf_dir, "documents.parquet")
    raw_schema = spark.read.parquet(path).schema
    stage_dir = tempfile.mkdtemp(prefix="s6_docs_")
    os.symlink(path, os.path.join(stage_dir, "documents.parquet"))
    stream = spark.readStream.schema(raw_schema).parquet(stage_dir)
    with _stream_partitions(spark):
        q = run_stream_to_memory(
            _s6_intake(stream), "s6_intake", output_mode="complete"
        )
        try:
            return spark.table("s6_intake").localCheckpoint(eager=True)
        finally:
            q.stop()


@query(
    "s7_streaming_hll_distinct",
    sql=sketches.hll_oracle_sql("events", "user_id", ["event_type"]),
)
def s7_streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type maintained THROUGH a
    real stream (streaming/microbatch.py::streaming_hll_registers):
    per micro-batch HLL registers max-merge into epoch-versioned
    committed state — 2^9 register rows per key forever, where exact
    streaming distinct state grows with user cardinality (the reason
    unbounded-stream distinct counting is sketch-or-nothing at
    100 TB). Register MAX makes the merge idempotent even without the
    epoch skip (sum needs it load-bearing — the contrast is the
    point). The replayed stream covers the whole table, so the final
    estimate equals the batch sk1-family HLL, which is the oracle —
    stream/batch parity, the s1/h1 discipline."""
    import shutil
    import tempfile

    from ..operators.sketches import hll_estimate
    from ..streaming.microbatch import (
        read_rollup_state,
        streaming_hll_registers,
    )

    stream = _events_stream_factory(spark, sf_dir, "s7_events_")()
    state = tempfile.mkdtemp(prefix="s7_state_")
    ckpt = tempfile.mkdtemp(prefix="s7_ckpt_")
    try:
        with _stream_partitions(spark):
            q = streaming_hll_registers(
                stream.select("event_type", "user_id"),
                ["event_type"],
                "user_id",
                state,
                ckpt,
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        regs = read_rollup_state(spark, state)
        return hll_estimate(regs, ["event_type"]).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(state, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


# --- h4: watermark-loss audit -------------------------------------------------


@query(
    "h4_watermark_loss_audit",
    sql="""
    WITH arrivals AS (
      SELECT event_id, ts,
             epoch_us(ts) AS ev_us,
             epoch_us(ts) + ((event_id % 37) * 97 % 1800) * 1000000
               AS arr_us,
             (epoch_us(ts) // 600000000) * 600000000 + 600000000
               AS win_end_us
      FROM events
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM arrivals)
    SELECT delay_s, n_dropped,
           CAST(n_dropped * 1000000 // (SELECT n FROM tot) AS BIGINT)
             AS dropped_ppm
    FROM (
      SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
             CAST(SUM(CASE WHEN arr_us > win_end_us + d.delay_s * 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      FROM arrivals, (VALUES (300), (900), (1800)) AS d(delay_s)
      GROUP BY d.delay_s
    )
    """,
)
def h4_watermark_loss_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-loss audit — the design artifact behind every
    `withWatermark` delay choice in the streaming surface (h1/h3/s1-s4
    all take one): for candidate delays {5, 15, 30} min, how many
    events would a 10-minute tumbling-window aggregate DROP because
    they arrive after their window closes plus the delay. Arrival
    times are the event time plus a deterministic jitter (up to 30
    min, the planted late-data fixture); the drop rule
    (arrival > window_end + delay) is the UPPER-BOUND proxy for
    Spark's actual watermark (which trails max-seen-event-time and so
    drops at most this set — documented, not hidden). Output: per
    candidate delay, dropped count and exact ppm — read the table,
    pick the delay whose loss you can afford, and that becomes the
    withWatermark argument.

    Scale shape: one projection (jitter + window-end arithmetic in
    codegen), a 3-constant cross product (VALUES side broadcasts),
    delay-grain combine, 1-row total broadcast — the corpus is
    scanned once."""
    ev = load_table(spark, sf_dir, "events")
    arrivals = ev.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ev_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + ((F.col("event_id") % 37) * 97 % 1800) * 1_000_000
        ).alias("arr_us"),
        (
            F.expr("(unix_micros(CAST(ts AS TIMESTAMP)) div 600000000)")
            * 600_000_000
            + 600_000_000
        ).alias("win_end_us"),
    )
    delays = spark.createDataFrame([(300,), (900,), (1800,)], "delay_s long")
    tot = arrivals.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dropped = (
        arrivals.crossJoin(F.broadcast(delays))
        .groupBy("delay_s")
        .agg(
            F.sum(
                F.when(
                    F.col("arr_us")
                    > F.col("win_end_us") + F.col("delay_s") * 1_000_000,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dropped")
        )
    )
    return dropped.crossJoin(F.broadcast(tot)).select(
        "delay_s",
        "n_dropped",
        F.expr("CAST(n_dropped * 1000000 div n AS BIGINT)")
        .alias("dropped_ppm"),
    )
