"""Incremental rollup maintenance: mergeable partial aggregates.

The warehouse pattern behind every incrementally-maintained dashboard
table: never re-scan history to refresh an aggregate — keep PARTIAL
state per group (count / decimal sum / min / max), fold each new batch
into its own partial, and MERGE partials associatively:

    merge(partial(A), partial(B)) == partial(A ∪ B)

count merges by +, sum by + (in DECIMAL space — double addition is not
associative, so double partials would make the merged result depend on
batch boundaries; decimal makes the identity exact, which is also what
lets the oracle hash-match a full-table recompute), min by min, max by
max; avg is derived at finalize (sum/count), never stored.

This is the same mergeable-state discipline as operators/sketches.py
(HLL registers, count-min counters) applied to plain aggregates, and
it is what a 100 TB deployment does hourly: partial-up the new
partition (its size only), merge with the stored rollup (group-
cardinality-sized), overwrite the rollup. History is never re-read.

Not reference-derived; the reference recomputes its BI aggregates from
the full star on every refresh (`Loans Dashboard.pbix` model refresh) —
this operator is the scale path for that refresh.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import DEC


def partial_rollup(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Fold a batch into per-group partial state (cnt, sum_dec, min_v,
    max_v). One map-side-combined hash aggregation — the shuffle carries
    one partial row per (group × map task)."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(v.cast(DEC)).alias("sum_dec"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_rollups(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Associatively merge partial rollups (any number, any batching).
    Input sizes are group-cardinality-sized, not data-sized — at 100 TB
    this is the cheap step no matter how much history the partials
    summarize."""
    u = reduce(DataFrame.unionByName, parts)
    return u.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_rollup(merged: DataFrame, keys: list[str]) -> DataFrame:
    """Present the stored state as the user-facing aggregate row:
    count / exact double sum / min / max / derived avg (functions.exact
    rounding contract, bit-identical to a full recompute)."""
    return merged.select(
        *keys,
        F.col("cnt").alias("n_events"),
        F.round(F.col("sum_dec"), 2).cast("double").alias("sum_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
        F.round(F.col("sum_dec").cast("double") / F.col("cnt"), 6).alias(
            "avg_value"
        ),
    )
