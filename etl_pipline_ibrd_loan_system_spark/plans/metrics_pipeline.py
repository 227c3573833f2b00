"""Composed product-metrics mart: one (user, day) activity grain feeds
DAU/WAU/stickiness, growth accounting, activity streaks, and the
survival curve in a single lineage.

Why a plan and not four queries: every one of these metrics starts from
the SAME expensive reduction — the deduplicated (user_id, day) activity
table. Registered individually (e27/m19/m20/e28) each query rebuilds it
from raw events, which is correct but re-scans the fact four times; the
mart pins the grain ONCE (spill-capable persist, the cache.py registry)
and derives all four families from it, which is how a production
metrics job actually ships. The mutual-consistency laws the shared
grain guarantees (DAU decomposes exactly into growth-accounting
classes; WAU >= DAU; streak day-mass equals the grain's row count;
survival's at-risk total equals the user count) are asserted in
tests/test_metrics_pipeline.py — cross-metric identities that four
independent pipelines can silently violate when one drifts.

Scale: the grain dedup is one map-side-combined distinct; everything
downstream is user-grain windows or day-grain aggregates over it (the
shapes proven individually by e27/m19/m20/e28 and their oracle rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import pin
from ..catalog import load_table


def activity_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared (user_id, day) grain, pinned."""
    ev = load_table(spark, sf_dir, "events")
    return pin(
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        ).distinct()
    )


def build_metrics_mart(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """All four metric families from one pinned grain. Returns
    {'engagement', 'growth', 'streaks', 'survival'} DataFrames."""
    ud = activity_grain(spark, sf_dir)

    # --- engagement: DAU / rolling-7 WAU / stickiness (e27 shape) ---
    offsets = F.array(*[F.lit(i) for i in range(7)])
    contrib = ud.select(
        "user_id", "day", F.explode(offsets).alias("o")
    ).select("user_id", F.date_add(F.col("day"), F.col("o")).alias("end_day"))
    wau = contrib.groupBy(F.col("end_day").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    engagement = dau.join(wau, "day").select(
        "day", "dau", "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )

    # --- growth accounting (m19 shape) ---
    w = Window.partitionBy("user_id").orderBy("day")
    seq = ud.select(
        "user_id", "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    active = seq.groupBy("day").agg(
        F.sum(F.when(F.col("prev_day").isNull(), 1).otherwise(0))
        .cast("bigint").alias("new_users"),
        F.sum(
            F.when(F.col("prev_day") == F.date_sub(F.col("day"), 1), 1)
            .otherwise(0)
        ).cast("bigint").alias("retained"),
        F.sum(
            F.when(
                F.col("prev_day").isNotNull()
                & (F.col("prev_day") < F.date_sub(F.col("day"), 1)),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("resurrected"),
    )
    churn = (
        seq.where(
            F.col("next_day").isNull()
            | (F.col("next_day") > F.date_add(F.col("day"), 1))
        )
        .groupBy(F.date_add(F.col("day"), 1).alias("day"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    z = F.lit(0).cast("bigint")
    growth = active.join(churn, "day", "full_outer").select(
        "day",
        F.coalesce("new_users", z).alias("new_users"),
        F.coalesce("retained", z).alias("retained"),
        F.coalesce("resurrected", z).alias("resurrected"),
        F.coalesce("churned", z).alias("churned"),
    )

    # --- streaks (m20 shape) ---
    isl = ud.select(
        "user_id", "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("grp"),
    )
    streaks_raw = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.max("day").alias("streak_end")
    )
    w_all = Window.partitionBy("user_id")
    streaks = (
        streaks_raw.withColumn("last_end", F.max("streak_end").over(w_all))
        .groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.max(
                F.when(F.col("streak_end") == F.col("last_end"), F.col("len"))
            ).alias("current_streak"),
        )
    )

    # --- survival inputs (e28's span/censor table; the fold stays in
    #     the registered query — the mart ships the reusable grain) ---
    spans = ud.groupBy("user_id").agg(
        F.datediff(F.max("day"), F.min("day")).cast("bigint").alias("tenure"),
        F.max("day").alias("last_day"),
    )
    cutoff = spans.agg(F.max("last_day").alias("maxday"))
    survival_base = spans.crossJoin(F.broadcast(cutoff)).select(
        "user_id", "tenure",
        (F.col("last_day") < F.col("maxday")).alias("churned_observed"),
    )

    return {
        "engagement": engagement,
        "growth": growth,
        "streaks": streaks,
        "survival_base": survival_base,
    }
