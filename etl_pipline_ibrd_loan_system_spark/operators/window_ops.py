"""Window operators (SURVEY.md §2.E).

The reference's one window op is a global-order forward-fill
(pyspark_dag2.py:371-379): `last(col, ignorenulls=True)` over
`Window.orderBy(key).rowsBetween(-inf, 0)` with NO partitionBy — a
single-task global sort. We keep that exact semantic for parity and add the
scalable two-pass variant a 100 TB run needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    order_by: Sequence[str],
    target: str,
    partition_by: Sequence[str] | None = None,
    single_task: bool = False,
) -> DataFrame:
    """E1 — forward-fill nulls in `target` in `order_by` order.

    The reference computes the global fill as ONE unpartitioned window
    (pyspark_dag2.py:375-379) — a single-task sort. With
    `partition_by=None` this keeps those exact semantics but executes
    them through the distributed two-pass range-bucket algorithm
    (forward_fill_scalable): for a TOTAL order key the two are
    equivalent row-for-row (the oracle checks it), and the fill stage
    runs as many tasks as buckets instead of one (VERDICT r5 item 6).
    `single_task=True` forces the literal reference plan for parity
    demos. Pass `partition_by` to shard the window when the fill key is
    contained within a partition key (e.g. fill project_name within
    project_id).

    Under a NON-total order key ties make `last(ignorenulls)` order-
    dependent in both shapes — the single-task plan is just as
    nondeterministic there, so the delegation loses nothing.
    """
    if partition_by is None and not single_task:
        return forward_fill_scalable(df, order_by, target)
    w = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    ).orderBy(*order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(target, F.last(target, ignorenulls=True).over(w))


def forward_fill_scalable(
    df: DataFrame,
    order_by: Sequence[str],
    target: str,
    num_buckets: int | None = None,
    bucketer: str = "range",
) -> DataFrame:
    """E1 at scale — distributed global forward-fill without a single-task sort.

    Two-pass algorithm over ordered buckets of the order key:
    1. partition rows into `num_buckets` ordered buckets (default:
       2x the session's shuffle parallelism — a fixed large constant
       wastes range-sampling time on small clusters, measured 4x at
       sf0.1 with 256 buckets on 32 cores);
    2. per bucket, compute the bucket-local fill plus the bucket's last
       non-null value; broadcast the tiny per-bucket "carry" table and fill
       each bucket's leading nulls from the nearest preceding bucket's carry.

    Equivalent to the global window for a total order key; shuffle cost is
    one ordered partitioning instead of a 1-task sort.

    `bucketer` picks how the ordered buckets are formed:

    - "range" (default, any key type / any distribution):
      `repartitionByRange` — percentile split points from the range
      partitioner's sampling pass, so bucket sizes are balanced under
      ANY key distribution. Costs one extra execution of the input
      (the sampler) and a persist barrier: the sampled partition id is
      nondeterministic across executions, so the filled frame must be
      pinned before the carry aggregate reads it.
    - "affine" (leading order key integral AND roughly uniform — a
      data contract the caller owns): bucket = floor((v - min(v)) *
      B / span), a deterministic column expression, monotone in v
      (IEEE double divide + floor are monotone; ANY monotone map
      yields the same fill because bucket-local fill + nearest
      preceding carry replays the global scan order). The bounds come
      from one MIN/MAX aggregate over the single key column — columnar
      and footer-friendly, instead of the sampler's full pass over the
      projected input — and because the bucket id is a pure function
      of the data, no pin is needed: the fill branch and the carry
      branch plan the IDENTICAL scan->project->exchange subtree, so the
      planner reuses one exchange (ReusedExchange with AQE off; the AQE
      stage cache at runtime) and the carry re-reads that shuffle
      output instead of a persisted copy of the filled frame. Under a
      skewed key the
      buckets go unbalanced (worst case: the global window's own
      1-task shape) — that is why "range" stays the default and the
      affine form is opt-in per call site.
    """
    if num_buckets is None:
        num_buckets = 2 * int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    okey = F.struct(*[F.col(c) for c in order_by])
    if bucketer == "affine":
        key = order_by[0]
        bounds = df.select(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
        lo, hi = bounds["lo"], bounds["hi"]
        if lo is None:
            # empty input or all-null leading key: one bucket
            bucket_expr = F.lit(0)
        else:
            span = float(hi) - float(lo) + 1.0
            bucket_expr = F.floor(
                (F.col(key).cast("double") - float(lo))
                * float(num_buckets)
                / span
            ).cast("int")
        # nulls sort first under the default ASC ordering
        bucketed = df.withColumn(
            "__bucket",
            F.when(F.col(key).isNull(), F.lit(-1)).otherwise(bucket_expr),
        )
        local_w = (
            Window.partitionBy("__bucket")
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # __rn shares local_w's partition+sort (one Sort, one Window
        # node) and gives the carry a TOTAL tie-break: under duplicate
        # order keys the carry must be the filled value at the bucket's
        # last row IN THE ORDER THE FILL USED (the oracle's stable scan
        # order) — a max_by on the raw key would pick an arbitrary row
        # of the tied group and diverge on mixed-value ties at bucket
        # boundaries (caught by the sf0.01 oracle at a duplicated
        # (orderkey, linenumber)).
        rank_w = Window.partitionBy("__bucket").orderBy(*order_by)
        filled_local = bucketed.withColumn(
            target, F.last(target, ignorenulls=True).over(local_w)
        ).withColumn("__rn", F.row_number().over(rank_w))
        # No pin: the bucket id is a pure function of the row, so both
        # consumers hash-shuffle the identical subtree (one reusable
        # exchange) and any re-execution reproduces the same buckets —
        # unlike the sampled range split, which is why the range branch
        # must persist.
        carries = filled_local.groupBy("__bucket").agg(
            F.max_by(F.col(target), F.col("__rn")).alias("__carry")
        )
        filled_local = filled_local.drop("__rn")
    else:
        bucketed = df.repartitionByRange(num_buckets, *order_by).withColumn(
            "__bucket", F.spark_partition_id()
        )
        local_w = (
            Window.partitionBy("__bucket")
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # Diamond DAG: filled_local feeds BOTH the output branch and the
        # carry aggregation — pin it or the source is scanned and
        # range-shuffled twice (visible as two parallel Scan->Exchange->
        # Window subtrees in the un-pinned plan), and the two executions
        # may draw DIFFERENT sampled range splits.
        from ..cache import pin

        filled_local = pin(bucketed.withColumn(
            target, F.last(target, ignorenulls=True).over(local_w)
        ))
        # Bucket carry = the filled value on the bucket's last row (null
        # only if the whole bucket saw no non-null). num_buckets rows —
        # trivially small.
        carries = filled_local.groupBy("__bucket").agg(
            F.max_by(F.col(target), okey).alias("__carry")
        )
    prev_w = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = carries.withColumn(
        "__carry_prev", F.last("__carry", ignorenulls=True).over(prev_w)
    ).select("__bucket", "__carry_prev")
    return (
        filled_local.join(F.broadcast(carries), "__bucket", "left")
        .withColumn(target, F.coalesce(F.col(target), F.col("__carry_prev")))
        .drop("__bucket", "__carry_prev")
    )


def global_rank_scalable(
    df: DataFrame,
    order_by: Sequence[str],
    rank_col: str = "global_rank",
    num_buckets: int | None = None,
) -> DataFrame:
    """Distributed global row_number over a TOTAL UNIQUE order — the
    scalable form of `row_number() OVER (ORDER BY ...)` (which Spark
    executes as a single-task sort, the e1 caveat). Same two-pass
    range-bucket scheme as forward_fill_scalable:

    1. range-partition by the order key (one range shuffle — the same
       cost a production layout job pays, zorder.py rationale);
    2. bucket-local row_number, plus a broadcast num_buckets-row
       offsets table (cumulative bucket counts) added back in.

    `order_by` MUST be a unique total order (append a tiebreak id) —
    with duplicate keys the bucket-local ordering is a valid but not
    oracle-reproducible row_number assignment. The bucketed frame is
    pinned: it feeds BOTH the local-rank branch and the counts branch,
    and the two must see identical range boundaries (the range
    partitioner samples; an unpinned recompute may draw different
    splits and corrupt every offset).
    """
    if num_buckets is None:
        num_buckets = 2 * int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    from ..cache import pin

    bucketed = pin(
        df.repartitionByRange(num_buckets, *order_by).withColumn(
            "__bucket", F.spark_partition_id()
        )
    )
    local_w = Window.partitionBy("__bucket").orderBy(*order_by)
    local = bucketed.withColumn("__lr", F.row_number().over(local_w))
    counts = bucketed.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    off_w = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "__off",
        F.coalesce(F.sum("__c").over(off_w), F.lit(0)).cast("bigint"),
    ).select("__bucket", "__off")
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(rank_col, (F.col("__lr") + F.col("__off")).cast("bigint"))
        .drop("__bucket", "__lr", "__off")
    )


def rolling_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value: str,
    preceding: int = 3,
    dec: str = "decimal(18,4)",
) -> DataFrame:
    """Rolling-frame analytics per key: lag/lead neighbors and a trailing
    rows-frame SUM over `value` (`preceding` rows back through current).

    The frame sum runs in fixed-point decimal so it is reduction-order
    exact (functions/exact.py rationale) — a rolling double sum would
    drift in the last bit between engines and partitionings. Partitioned
    window => fully distributed; one shuffle on the partition keys.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    frame = w.rowsBetween(-preceding, Window.currentRow)
    return (
        df.withColumn("prev_value", F.lag(value).over(w))
        .withColumn("next_value", F.lead(value).over(w))
        .withColumn(
            "trailing_sum",
            F.round(F.sum(F.col(value).cast(dec)).over(frame), 2).cast("double"),
        )
    )


def time_range_rolling(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    value: str,
    trailing_seconds: int = 3600,
    dec: str = "decimal(18,4)",
) -> DataFrame:
    """Time-RANGE rolling frame: per key, count and decimal-exact sum of
    every row whose event time falls in the trailing `trailing_seconds`
    window ending at the current row — the frame is defined by TIME
    distance, not row count, so bursts widen the frame and quiet periods
    shrink it (what `rolling_agg`'s ROWS frame cannot express).

    The order key is integer epoch seconds (rangeBetween needs a numeric
    order), and ties — rows at the same second — are PEERS: RANGE frames
    include all of them on both engines, which is also why the result is
    deterministic without an id tie-break. Same scale shape as any
    partitioned window: one shuffle on the keys, frames never leave
    their partition."""
    # TIMESTAMP_NTZ has no direct long cast; via TIMESTAMP it is exact
    # because the session timezone is pinned UTC (session.py)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(epoch)
        .rangeBetween(-trailing_seconds, Window.currentRow)
    )
    return df.withColumn("trailing_n", F.count(F.lit(1)).over(w)).withColumn(
        "trailing_sum",
        F.round(F.sum(F.col(value).cast(dec)).over(w), 2).cast("double"),
    )


def ranking_family(
    df: DataFrame,
    partition_by: Sequence[str],
    order_cols: Sequence,
    tiles: int = 4,
) -> DataFrame:
    """The full SQL ranking surface over one window: rank, dense_rank,
    percent_rank, cume_dist, ntile. percent_rank/cume_dist are exact
    rational values ((rank-1)/(n-1), frac of rows <= current) — identical
    across engines given a deterministic order, so callers must include a
    unique tiebreak in `order_cols`."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return (
        df.withColumn("rnk", F.rank().over(w))
        .withColumn("dense_rnk", F.dense_rank().over(w))
        .withColumn("pct_rank", F.percent_rank().over(w))
        .withColumn("cume", F.cume_dist().over(w))
        .withColumn("tile", F.ntile(tiles).over(w))
    )


def date_spine_fill(
    df: DataFrame,
    key: str,
    ts_col: str,
    aggs: Sequence,
    fill: dict[str, object],
) -> DataFrame:
    """Gap-free per-key daily series: build a date spine spanning the
    data's [min, max] day, cross-join it with the distinct keys, and left
    join the per-(key, day) aggregates, filling absent days with `fill`
    literals. A training-data pipeline needs this shape for per-source
    ingest monitoring and time-series featurization (no silent gaps).

    Scale: the spine is days x keys — broadcast (days is small, the
    cross join replicates it per key partition-locally); the only shuffle
    is the groupBy on (key, day), which AQE coalesces."""
    day = F.to_date(F.col(ts_col)).alias("day")
    bounds = df.select(
        F.min(F.to_date(F.col(ts_col))).alias("d0"),
        F.max(F.to_date(F.col(ts_col))).alias("d1"),
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    keys = df.select(F.col(key)).distinct()
    daily = df.groupBy(F.col(key), day).agg(*aggs)
    out = keys.crossJoin(F.broadcast(spine)).join(daily, [key, "day"], "left")
    return out.fillna(fill)


def top_n_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_cols: Sequence,
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """E2/F4 — dashboard-style top-N: rank within group by a measure and
    keep the first `n`. (The BI layer only sorts; rank is the top-N
    generalization the dashboard parity needs.) `order_cols` are Column
    expressions — include a tiebreak key for determinism."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_tiebreak: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session numbers per user and aggregate one row
    per session (start/end/duration/event count).

    The id-assignment twin of the session_window aggregate (h3): where
    session_window only yields per-window aggregates, this labels the
    SESSIONS (1-based, in time order per user) so events can be joined
    back to their session — the shape attribution/replay pipelines
    need.

    A session break is a gap > gap_seconds between consecutive events
    of the same user; the session number is the running count of breaks
    (classic gaps-and-islands). Gap arithmetic is integer microseconds
    (unix_micros) — no float, no timezone, bit-identical cross-engine.

    Scale: both windows and the final aggregate partition on user_id —
    high-cardinality and hash-uniform, so parallelism is user count;
    per-task memory is one user's event run. The two windows and the
    groupBy share one (user) exchange.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # parquet timestamps load as TIMESTAMP_NTZ; the session TZ is pinned
    # UTC (session.py) so the cast is a pure reinterpretation, and
    # unix_micros then gives exact integer microseconds.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = F.lit(gap_seconds * 1_000_000)
    # two projections: a window expression can't nest inside another
    # window aggregate; both windows share the same (user) sort, so
    # Catalyst plans them in ONE WindowExec pipeline after one exchange.
    flagged = df.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(order_tiebreak),
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("__is_new"),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    labeled = flagged.select(
        F.col(user_col),
        F.col(ts_col),
        F.sum("__is_new").over(wsum).alias("session_no"),
    )
    return labeled.groupBy(user_col, "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).alias("duration_us"),
    )
