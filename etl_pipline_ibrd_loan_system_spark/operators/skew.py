"""Skew- and shuffle-control utilities (100 TB hygiene; SCALE.md).

AQE's skew-join splitting handles most runtime skew; these are the
explicit tools for the cases AQE can't see in advance:

- salted_agg       two-phase aggregation: salt the hot key, partial-agg
                   (key, salt), merge partials — the classic fix when
                   one group holds a large fraction of all rows. Only
                   algebraic aggregates (sum/count/min/max) qualify.
- salted_join      replicate the SMALL side `salt` times, salt the big
                   side uniformly: a skewed-key shuffle join becomes
                   uniform at the cost of small-side duplication.
- bucketed_write / bucketed co-located joins live in sources/sinks.py
  (`bucketBy` needs the table catalog).

Results are IDENTICAL to the unsalted plans (oracle-checked by
d8_salted_agg) — salting changes the shuffle distribution, never the
answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGEABLE = {"sum": F.sum, "count_rows": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase agg: phase 1 groups by (keys..., salt) — the hot key's
    rows spread over `salt` reducers; phase 2 merges the (tiny) partials
    by the real keys. `aggs` maps output name -> (merge_kind, phase-1
    aggregate expression); merge_kind in MERGEABLE."""
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            MERGEABLE[kind](f"__p_{name}").alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof shuffle join: big side gets a uniform random salt,
    small side is exploded once per salt value, join key becomes
    (on, salt). Use when the big side's key distribution is skewed AND
    the small side is too big to broadcast outright."""
    big_s = big.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, [on, "__salt"], how).drop("__salt")
