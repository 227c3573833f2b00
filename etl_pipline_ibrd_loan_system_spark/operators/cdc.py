"""CDC changelog application: materialize current state from an
insert/update/delete event stream.

The reference applies changes row-at-a-time over JDBC (SSIS OLE DB
Command per-row UPDATE, ``bor_dim.dtsx`` — the same per-row anchor
SURVEY §2.A11 replaces with the SCD2 rebuild). This module is the
general changelog form of that capability: given a table of change
events ``(key, seq, op, payload...)`` where op ∈ {I, U, D}, produce the
table's current state — last-writer-wins per key, with a trailing
delete tombstone removing the key entirely.

Spark-first shape: ONE combinable aggregate, no window function. The
winner per key is ``MAX(struct(seq, op, payload...))`` — struct
comparison is lexicographic, so with a unique ``seq`` per key the max
is exactly the highest-sequence event, and the aggregate is
map-side-combinable (partial maxes merge associatively; Spark plans
max-of-struct as a SortAggregate with a partial_max before the
exchange — the shuffle-volume property is identical to a hash agg).
At 100 TB that matters twice over: the shuffle carries one partially
reduced row per (key, map partition) instead of the full changelog, and
there is no per-key sort — a window row_number() plan would shuffle
every event and sort within every key group to keep only row 1.

Delete semantics: the filter on the surviving op happens AFTER the
max — a delete beats earlier upserts (key vanishes) and an upsert
after a delete resurrects the key, i.e. true changelog replay order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_apply(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Current-state materialization of a changelog.

    ``seq_col`` must totally order events within a key (duplicate
    sequence numbers within one key make the winner ambiguous; callers
    with non-unique timestamps should compose a (ts, source_offset)
    struct or monotonic id into ``seq_col`` first). Returns one row per
    live key: key columns + ``seq_col`` (the winning sequence) +
    payload columns of the winning event. Keys whose latest event is a
    delete are absent.
    """
    key_cols = list(key_cols)
    payload_cols = list(payload_cols)
    winner = F.max(
        F.struct(
            F.col(seq_col).alias("__seq"),
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(c) for c in payload_cols],
        )
    ).alias("__w")
    latest = changelog.groupBy(*key_cols).agg(winner)
    return (
        latest.where(F.col("__w.__op") != F.lit("D"))
        .select(
            *key_cols,
            F.col("__w.__seq").alias(seq_col),
            *[F.col(f"__w.{c}").alias(c) for c in payload_cols],
        )
    )
