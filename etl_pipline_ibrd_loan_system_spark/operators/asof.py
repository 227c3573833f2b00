"""As-of (point-in-time) join — the canonical operator vanilla Spark
lacks, expressed scalably as union + window instead of a range join.

`asof_join(left, right, key, ts)`: for every left row, attach the most
recent right row with the same key and right.ts <= left.ts.

Implementation (no range explosion, no per-key collect):
  1. tag both inputs and union them on (key, ts) — one dataset, one
     schema, right-side payload columns null on left rows;
  2. window partitioned by key, ordered by (ts, side) with side
     ordering putting the right row FIRST on ties (<= semantics):
     `last(right_payload, ignorenulls=True)` over unbounded-preceding
     forward-fills each left row with the latest right payload;
  3. keep the left rows.

Cost: ONE shuffle on the key (the window sort) — same order as the
equi-join the naive approach would need anyway, with none of the
O(|left| x |right-per-key|) intermediate a range-condition join
produces. Skewed keys: the window partitions by key, so a single
pathological key serializes — salt by time-bucket if that ever
matters (same trick as skew.salted_agg, carry across bucket borders
like window_ops.forward_fill_scalable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join; right payload columns arrive as `<col><suffix>`
    (null when no right row precedes the left row).

    `tolerance_seconds` bounds match staleness: a matched right row
    older than the tolerance yields nulls, exactly as if it did not
    exist (the sensor-join semantics: a reading too stale is no
    reading). Implemented by forward-filling the matched right TS
    alongside the payload and null-gating on the exact integer-
    microsecond difference — no extra shuffle, same single window."""
    from pyspark.sql import types as T

    right_cols = right_cols or [c for c in right.columns if c not in (key, ts)]
    l_tag = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (key, ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (key, ts)
        ],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts => <= semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fills = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in right_cols
    ]
    if tolerance_seconds is None:
        filled = unioned.select("*", *fills)
        return filled.filter(F.col("__side") == 1).drop(
            "__side", *[f"__r_{c}" for c in right_cols]
        )
    # carry the matched right row's ts through the same window and gate
    # every payload column on the staleness bound
    unioned = unioned.withColumn(
        "__r___ts", F.when(F.col("__side") == 0, F.col(ts))
    )
    filled = unioned.select(
        "*",
        F.last("__r___ts", ignorenulls=True).over(w).alias("__m_ts"),
        *fills,
    )
    if isinstance(left.schema[ts].dataType, (T.TimestampType, T.TimestampNTZType)):
        age = F.unix_micros(F.col(ts).cast("timestamp")) - F.unix_micros(
            F.col("__m_ts").cast("timestamp")
        )
        bound = F.lit(int(tolerance_seconds * 1_000_000))
    else:  # numeric event time: tolerance in the same unit
        age = F.col(ts) - F.col("__m_ts")
        bound = F.lit(tolerance_seconds)
    fresh = age <= bound
    fill_names = [f"{c}{suffix}" for c in right_cols]
    gated = filled.select(
        # exclude by exact fill-alias name: an endswith(suffix) test would
        # match EVERY column when suffix is empty
        *[c for c in filled.columns if c not in set(fill_names)],
        *[F.when(fresh, F.col(n)).alias(n) for n in fill_names],
    )
    return gated.filter(F.col("__side") == 1).drop(
        "__side", "__r___ts", "__m_ts", *[f"__r_{c}" for c in right_cols]
    )
