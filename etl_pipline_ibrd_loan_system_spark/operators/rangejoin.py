"""Binned range join: point-in-interval joins without the cartesian.

Spark has no native range-join optimization (Databricks' range-join hint
is proprietary); the naive `p.value BETWEEN i.lo AND i.hi` theta join
degenerates to BroadcastNestedLoopJoin (every point probes every
interval) or, worse, a cartesian shuffle when neither side is small. The
classic fix — used by every large-scale spatial/temporal joiner — is bin
expansion:

  1. pick a bin width W;
  2. explode each interval into the bins it overlaps
     (floor(lo/W) .. floor(hi/W)) — fan-out = interval_len/W + 1;
  3. map each point to its single bin floor(value/W);
  4. equi-join on the bin key (hash join, shuffle or broadcast);
  5. re-apply the exact predicate to discard same-bin near-misses.

Cost model: bin width trades interval fan-out against per-bin candidate
density. W ≈ median interval length keeps both ~O(1). The join becomes a
plain equi-join that Catalyst/AQE handle like any other — broadcastable,
skew-splittable, co-partitionable.

Not reference-derived (the reference has only equi lookups — SURVEY.md
§2.C); this is the range-predicate capability a training pipeline needs
for windowed joins against score bands, time bands, or bucketed features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with lo <= point < hi,
    via bin expansion (see module doc). Returns all columns of both
    inputs. `bin_width` must be > 0; intervals are half-open [lo, hi).

    Inner join only: the exact-predicate re-filter after the bin join
    would silently drop the NULL-extended rows of any outer variant
    (an outer range join needs the filter folded into the join condition
    instead — not implemented until something needs it).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if how != "inner":
        raise ValueError("binned_range_join supports how='inner' only")
    w = F.lit(float(bin_width))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("bigint"),
                # hi is exclusive, but a point in hi's bin can still be < hi
                F.floor(F.col(hi_col) / w).cast("bigint"),
            )
        ),
    )
    pt = points.withColumn("__bin", F.floor(F.col(point_col) / w).cast("bigint"))
    joined = pt.join(iv, "__bin", how).where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bin")


def binned_interval_overlap_join(
    left: DataFrame,
    left_lo: str,
    left_hi: str,
    right: DataFrame,
    right_lo: str,
    right_hi: str,
    bin_width: float,
) -> DataFrame:
    """Interval × interval overlap join (half-open [lo, hi) on both
    sides, overlap iff a.lo < b.hi AND b.lo < a.hi), via the same bin
    expansion as `binned_range_join` — the shape temporal databases call
    an overlap join (session-vs-session, downtime-vs-campaign,
    annotation-vs-annotation).

    Both sides explode into the bins they touch; candidates meet in a
    hash equi-join on the bin key. A pair overlapping k shared bins
    would surface k times, so each pair is emitted ONLY in the first bin
    both intervals occupy — `bin == max(floor(a.lo/W), floor(b.lo/W))` —
    the standard dedup-free trick (no distinct, no shuffle to dedupe):
    every qualifying pair matches in exactly one bin. The exact overlap
    predicate then prunes same-bin near-misses.

    Inner only, for `binned_range_join`'s reason. Fan-out per row =
    span/W + 1, so W near the median span keeps the explode O(1) per
    interval; AQE handles residual bin skew like any hash-join skew.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(float(bin_width))

    def binned(df: DataFrame, lo: str, hi: str, tag: str) -> DataFrame:
        return df.withColumn(
            f"__bin_{tag}",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / w).cast("bigint"),
                    F.floor(F.col(hi) / w).cast("bigint"),
                )
            ),
        ).withColumn(f"__lobin_{tag}", F.floor(F.col(lo) / w).cast("bigint"))

    lb = binned(left, left_lo, left_hi, "l")
    rb = binned(right, right_lo, right_hi, "r")
    joined = (
        lb.join(rb, F.col("__bin_l") == F.col("__bin_r"))
        .where(
            (F.col("__bin_l") == F.greatest(F.col("__lobin_l"), F.col("__lobin_r")))
            & (F.col(left_lo) < F.col(right_hi))
            & (F.col(right_lo) < F.col(left_hi))
        )
    )
    return joined.drop("__bin_l", "__bin_r", "__lobin_l", "__lobin_r")
