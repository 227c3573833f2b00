"""Deterministic dataset-assembly operators: splits, stratified sampling,
and sequence packing for training-data pipelines.

Not reference-derived — this is the split/sample/pack family a 100 TB
training corpus needs. Determinism is the design center: every decision
is a pure function of a 60-bit md5-derived key (dedup.shared_hash60), so
reruns, backfills and the DuckDB oracle all agree bit-for-bit — no RNG
state, no row order dependence.

- hash_split           stable train/val/test assignment from id hash
- stratified_sample    per-stratum deterministic Bernoulli via hash
                       threshold — shuffle-FREE (the scale path; an
                       exact-rank variant would need a per-stratum window)
- pack_sequences       greedy token-budget packing into training
                       sequences, parallelized by hash bucket so the
                       cumulative-sum window never sees a global sort

Scale notes: hash_split and stratified_sample are per-row projections
(scan-speed, no shuffle). pack_sequences shuffles once on the bucket key;
buckets are hash-uniform so there is no skew, and each bucket's running
sum is an independent window — 1000 buckets = 1000 parallel packers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shared_hash60


def _bucket(key: Column, salt: str, mod: int) -> Column:
    """Uniform [0, mod) bucket from the shared 60-bit hash; `salt` decouples
    independent uses (split vs sample vs pack) of the same key column."""
    return shared_hash60(F.concat(F.lit(salt), key.cast("string"))) % mod


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int] | None = None,
    salt: str = "split:",
) -> DataFrame:
    """Assign each row a stable split label from its id hash.

    `splits` maps label -> percent (must sum to 100); default 80/10/10
    train/val/test. Adding rows later never moves an existing row between
    splits (assignment depends only on the id), which is the property that
    matters for contamination control across dataset versions.
    """
    splits = splits or {"train": 80, "val": 10, "test": 10}
    if sum(splits.values()) != 100:
        raise ValueError("split percents must sum to 100")
    bucket = _bucket(F.col(id_col), salt, 100)
    expr, lo = None, 0
    for label, pct in splits.items():
        cond = bucket < lo + pct
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += pct
    return df.withColumn("split_bucket", bucket.cast("bigint")).withColumn(
        "split", expr
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_frac: float = 0.0,
    salt: str = "sample:",
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    hash(id) mod `precision` < frac[stratum] * precision.

    Shuffle-free — each row decides for itself from its hash, so this is
    the 100 TB path (an exact per-stratum rank would shuffle every row to
    its stratum and funnel low-cardinality strata through few tasks).
    Realized fractions concentrate around the targets by LLN; the sampled
    SET is stable under reruns and row reordering.
    """
    bucket = _bucket(F.col(id_col), salt, precision)
    thresh = None
    for stratum, frac in sorted(fractions.items()):
        t = F.lit(int(frac * precision))
        cond = F.col(stratum_col) == stratum
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = thresh.otherwise(F.lit(int(default_frac * precision)))
    return df.withColumn("sample_bucket", bucket.cast("bigint")).where(
        F.col("sample_bucket") < thresh
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int = 2048,
    n_buckets: int = 8,
    salt: str = "pack:",
) -> DataFrame:
    """Pack documents into token-budget training sequences, in parallel.

    Documents are hash-partitioned into `n_buckets` independent packers;
    within a bucket, documents are laid out in id order and a document
    starts a new sequence when the tokens before it fill the current
    budget: seq = floor(tokens_before / budget). Sequences can overhang
    the budget by at most one document (standard greedy concat-and-cut
    packing); the assignment is a pure function of (id, n_tokens) so it
    replays exactly in SQL.

    The ONLY shuffle is on the bucket key — hash-uniform, skew-free — and
    each bucket's cumulative sum is an independent window. At 100 TB you
    raise n_buckets to the cluster's parallelism; no global sort ever
    happens (a single global cumsum window would be one task).
    """
    bucket = _bucket(F.col(id_col), salt, n_buckets)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("bigint").alias("n_tokens"),
        bucket.cast("bigint").alias("pack_bucket"),
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        F.col(id_col),
        "pack_bucket",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).cast("bigint").alias("seq_id"),
    )
