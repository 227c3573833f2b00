"""Data-quality operators: declarative expectation checks and table
profiling (the Deequ / Great-Expectations surface a warehouse pipeline
runs before publishing a table).

Not reference-derived — the reference pipeline trusts its CSV inputs;
a 100 TB ingest cannot. Design rules:

- ALL row-level checks over one table compile into ONE aggregate pass
  (map-side-combined conditional sums) — never a job per check. A
  suite of 50 checks costs the same scan as one.
- Referential checks are key-projected anti-join COUNTS: only the key
  column moves, and the dimension side broadcasts when small.
- Output is LONG format (check_name, metric, passed) so a suite is a
  table you can alert on, not a wall of booleans.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: `metric_expr` is a row-level predicate counted
    across the table; `passed` compares the count against `max_bad`."""

    name: str
    predicate: Column  # True where the ROW VIOLATES the expectation
    max_bad: int = 0


def violation_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check in ONE aggregate pass: each check contributes a
    conditional sum (violations) to a single hash aggregate, then the
    wide row unpivots to (check_name, metric, passed). Zero shuffles of
    row data — only the 1-row aggregate moves."""
    wide = df.agg(
        *[
            F.sum(F.when(c.predicate, 1).otherwise(0)).alias(c.name)
            for c in checks
        ]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(c.name).cast("bigint").alias("metric"),
                (F.col(c.name) <= c.max_bad).alias("passed"),
            )
            for c in checks
        ]
    )
    return wide.select(F.explode(structs).alias("s")).select("s.*")


def fk_orphan_count(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """Referential-integrity check as a key-projected LEFT ANTI count:
    fact rows whose key has no match in the dimension. Both sides are
    projected to the bare key before the join; at scale this is a
    broadcast anti join when the dim fits, a key-only shuffle
    otherwise."""
    orphans = (
        fact.select(F.col(fact_key).alias("__k"))
        .join(
            F.broadcast(dim.select(F.col(dim_key).alias("__k")).distinct()),
            "__k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("metric"))
    )
    return orphans.select(
        F.lit(name).alias("check_name"),
        F.col("metric").cast("bigint"),
        (F.col("metric") == 0).alias("passed"),
    )


def duplicate_key_count(df: DataFrame, key: str, name: str) -> DataFrame:
    """Uniqueness check: number of EXTRA rows beyond one per key
    (total - distinct) — one map-side-combined aggregate over the key
    projection."""
    agg = df.select(key).agg(
        (F.count(F.lit(1)) - F.countDistinct(key)).alias("metric")
    )
    return agg.select(
        F.lit(name).alias("check_name"),
        F.col("metric").cast("bigint"),
        (F.col("metric") == 0).alias("passed"),
    )


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column profile in long format: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) with values stringified for a
    uniform schema.

    One aggregate computes every column's metrics; the multiple
    COUNT(DISTINCT) terms plan through Spark's Expand (one scan,
    |columns| row multiplication before the partial aggregate) — the
    standard profiling trade; for approximate-tolerant profiling swap
    countDistinct for HLL (operators/sketches.py) and the Expand
    disappears."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(structs).alias("s")).select("s.*")


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group percentile clipping (winsorization): values below the
    group's `lower` quantile or above its `upper` quantile are clamped
    to the quantile, a standard outlier-robust feature/label transform
    before model training.

    Scale shape: exact interpolated percentiles are ONE aggregate over
    the group keys (a handful of rows out of a 100 TB scan), broadcast
    back onto the table — same stats-broadcast pattern as
    dq3_group_outliers; no window ever touches the full data. At
    extreme group cardinality swap `percentile` for the mergeable
    `percentile_approx` t-digest — documented trade, not oracle-able.
    """
    out_col = out_col or f"{value_col}_w"
    bounds = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {lower})").alias("__lo"),
        F.expr(f"percentile({value_col}, {upper})").alias("__hi"),
    )
    joined = df.join(F.broadcast(bounds), group_cols, "left")
    clamped = F.greatest(
        F.col("__lo"), F.least(F.col("__hi"), F.col(value_col).cast("double"))
    )
    return joined.withColumn(out_col, clamped).drop("__lo", "__hi")


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    generalize: dict[str, Column] | None = None,
) -> DataFrame:
    """k-anonymity screen over a quasi-identifier combination: report
    every equivalence class (distinct quasi-value tuple) with its size
    and whether it violates the k floor — the data-governance gate a
    training corpus needs BEYOND per-row PII scrubbing (textprep
    pii_scrub): a row whose quasi-identifiers isolate it in a group of
    fewer than k records is re-identifiable even with direct
    identifiers removed (Sweeney 2002, public recipe).

    `generalize` optionally coarsens columns before grouping (e.g.
    truncate zip codes, bucket ages) — the standard fix loop: screen,
    generalize the offending column, re-screen.

    One hash aggregate over the quasi key; the row set never moves
    anywhere else, and the report size is the number of equivalence
    classes, not rows. Suppression/generalization decisions then join
    back by the same key (broadcast at realistic class counts).
    """
    sel = [
        (generalize[c] if generalize and c in generalize else F.col(c)).alias(c)
        for c in quasi_cols
    ]
    return (
        df.select(*sel)
        .groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("class_size"))
        .withColumn("violates_k", F.col("class_size") < k)
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,  # noqa: E741 — the literature's name
) -> DataFrame:
    """l-diversity screen: k-anonymity's required companion. A class can
    satisfy the k size floor and still leak — if all its rows share one
    sensitive value, membership alone discloses it (homogeneity attack,
    Machanavajjhala et al. 2007, public recipe). Reports each
    equivalence class with its count of DISTINCT sensitive values and
    the violation flag (distinct-l-diversity).

    Same single hash aggregate shape as k_anonymity, with a
    count_distinct partial — both screens usually run in one pass over
    the same grouping in practice; kept separate here so each oracle
    checks one property.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.count_distinct(F.col(sensitive_col)).cast("bigint")
            .alias("sensitive_values"),
        )
        .withColumn("violates_l", F.col("sensitive_values") < l)
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_num: int = 1,
    t_den: int = 5,
) -> DataFrame:
    """t-closeness screen (Li, Li & Venkatasubramanian 2007) — the
    privacy triad's third leg after k_anonymity / l_diversity: a class
    can be large AND diverse yet still leak if its sensitive-value
    DISTRIBUTION differs sharply from the table's (skewness attack).
    For a nominal sensitive attribute the prescribed distance is the
    equal-ground EMD, i.e. total variation distance
    (1/2) * sum_v |p_class(v) - p_table(v)|.

    EXACT integer form: with class counts c_v (n = class size) and
    global counts g_v (N = table size),
        TVD = sum_v |c_v * N - g_v * n| / (2 * n * N)
    so `emd_num` = the integer numerator sum, and the violation flag
    compares t_num/t_den in cross-multiplied INTEGER arithmetic
    (t > 1/5  <=>  5 * emd_num > 2 * n * N) — no float ever decides.
    The reported `t_value` double is one pinned-order division for
    human eyes only.

    Scale shape: one (quasi, sensitive)-grain count, one
    sensitive-grain global count (category-sized, broadcast), one
    quasi-grain recombine; classes MISSING a sensitive value still
    contribute |0 - g_v * n| via the class x category expansion —
    bounded by |classes| * |categories|, never the row count.
    """
    cls = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("c_v")
    )
    sizes = cls.groupBy(*quasi_cols).agg(F.sum("c_v").alias("n_rows"))
    glob = cls.groupBy(sensitive_col).agg(F.sum("c_v").alias("g_v"))
    tot = glob.agg(F.sum("g_v").alias("n_total"))
    expanded = (
        sizes.crossJoin(F.broadcast(glob.crossJoin(tot)))
        .join(cls, [*quasi_cols, sensitive_col], "left")
        .select(
            *quasi_cols,
            "n_rows",
            "n_total",
            (
                F.abs(
                    F.coalesce(F.col("c_v"), F.lit(0)) * F.col("n_total")
                    - F.col("g_v") * F.col("n_rows")
                )
            ).alias("term"),
        )
    )
    return expanded.groupBy(*quasi_cols).agg(
        F.min("n_rows").cast("bigint").alias("class_size"),
        F.sum("term").cast("bigint").alias("emd_num"),
        (
            F.sum("term").cast("double")
            / (F.lit(2.0) * F.min("n_rows") * F.min("n_total"))
        ).alias("t_value"),
        (
            F.sum("term") * t_den
            > F.lit(2) * F.min("n_rows") * F.min("n_total") * t_num
        ).alias("violates_t"),
    )
