"""Cross-engine-exact aggregate helpers.

Floating-point SUM/AVG are order-dependent, and the correctness gate
hash-compares our results against DuckDB. Summing through fixed-point
decimals makes the aggregate exact (associative), so both engines produce
bit-identical doubles after the final cast:

    spark:  CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE)
    duckdb: the same SQL

Per-row double arithmetic (e.g. price * (1-disc)) is IEEE-deterministic and
identical across engines; only the reduction order varies — which the
decimal sum removes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dsum(col: Column | str, alias: str, round_to: int = 2, cast_to: str | None = DEC) -> Column:
    """Exact SUM over doubles -> stable double.

    Pass ``cast_to=None`` when the expression is already decimal (e.g. a
    decimal product — multi-factor expressions must multiply in decimal
    space, otherwise the per-row double->decimal cast can land on a rounding
    tie that Spark (HALF_UP) and DuckDB (half-even) break differently).
    """
    c = F.col(col) if isinstance(col, str) else col
    if cast_to:
        c = c.cast(cast_to)
    return F.round(F.sum(c), round_to).cast("double").alias(alias)


def davg(col: Column | str, alias: str, round_to: int = 6) -> Column:
    """Exact AVG: decimal sum / count, rounded in double space."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1)), round_to
    ).alias(alias)


def sql_dsum(expr: str, alias: str, round_to: int = 2, cast: bool = True) -> str:
    """DuckDB side of dsum()."""
    inner = f"CAST(({expr}) AS DECIMAL(18,4))" if cast else f"({expr})"
    return f"CAST(ROUND(SUM({inner}), {round_to}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, round_to: int = 6) -> str:
    """DuckDB side of davg()."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE)"
        f" / COUNT(*), {round_to}) AS {alias}"
    )
