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


# --- unscaled-long exact sums (optimization r11, guide §1.2 step 2 / §2.3) --
#
# A decimal SUM whose result precision exceeds 18 digits abandons Spark's
# compact-long Decimal representation: every row's accumulation becomes a
# java.math.BigDecimal add inside the aggregate buffer, and every decimal
# multiply (e.g. price * (1-disc)) is BigDecimal regardless of precision.
# Measured at sf0.1 (600k rows, /tmp/q1_variants): SUM(DECIMAL(18,4)) 0.56s
# vs the same sum over unscaled longs 0.40s; a decimal-product sum 0.95s vs
# 0.57s in long space. The helpers below keep the decimal CAST (its HALF_UP
# rounding is the cross-engine contract) but move the multiply and the SUM
# into int64 space, which whole-stage codegen turns into primitive long ops,
# and which also halves the bytes entering the partial-agg shuffle (§2.3
# "narrower types").
#
# Exactness argument (every step is value-preserving, so the final doubles
# are bit-identical to the dsum()/davg() forms):
#   1. v = CAST(d * 10^s AS BIGINT) is the exact unscaled integer of the
#      decimal d (the product d * 10^s is integral by construction).
#   2. v is split into base-10^6 limbs: v = Σ limb_i · 10^(6i), each
#      |limb_i| < 10^6 (and the top limb bounded by the declared per-row
#      value bound). long SUM per limb is exact while
#      n_rows_per_group · 10^6 < 2^63, i.e. up to ~9.2e12 rows per group
#      (≈ PB-scale fact partitions); beyond that, fall back to dsum().
#      Limb signs follow v (Spark's div/% truncate toward zero), so the
#      reconstruction identity holds for negatives too.
#   3. U = Σ SUM(limb_i) · 10^(6i), reassembled in DECIMAL(38,0) at GROUP
#      grain (a handful of rows), is the exact unscaled total.
#   4. HALF_UP rounding to `round_to` happens in integer space:
#      U2 = (U ± half) div 10^(s - round_to) — identical to Spark's and
#      DuckDB's ROUND(decimal) (both round half away from zero).
#   5. U2 / 10^round_to as an exact small-scale decimal, CAST to DOUBLE,
#      is BigDecimal.doubleValue of the same value dsum() produces.

_LIMB = 10**6


def unscaled_sql(expr: str, scale: int) -> str:
    """SQL for the exact unscaled int64 of a decimal expression: its value
    times 10^scale (integral by construction, so the BIGINT cast is exact)."""
    return f"CAST(({expr}) * {10 ** scale} AS BIGINT)"


def _limb_sql(v: str, i: int) -> str:
    """i-th base-10^6 limb of unscaled value `v` (long SQL, truncating
    div/% keep limb signs aligned with v, so Σ limb_i·10^(6i) == v)."""
    shifted = v if i == 0 else f"(({v}) div {_LIMB ** i})"
    return f"({shifted} % {_LIMB})"


def lsum_unscaled(
    v_sql: str,
    scale: int,
    alias: str,
    round_to: int = 2,
    limbs: int = 3,
) -> Column:
    """Exact SUM of unscaled-long rows -> the same stable double as
    dsum(decimal); see the module-level exactness argument. `v_sql` must
    be SQL for the exact unscaled int64 (see `unscaled_sql`); `scale` its
    decimal scale; `limbs`*6 decimal digits must cover the per-row value
    bound (the top limb is NOT masked, so a bound overflowing the last
    limb would surface as a wrong total, caught by the oracle gate).

    Exactness preconditions are the CALLER's (ADVICE r11): the per-row
    |value| must fit the declared limbs and rows-per-group must stay
    under ~9.2e12 (10^6 per limb-row * 2^63 headroom). Sessions run
    ANSI mode (pinned in session.configure), so an int64 SUM or
    unscaled-multiply overflow RAISES instead of wrapping; if a caller
    disables ANSI, a violated bound wraps silently and only the oracle
    gate would catch it. The final /10^round_to quotient keeps scale >=
    round_to only while round_to <= 6 (Spark caps the adjusted result
    scale at 6 under allowPrecisionLoss) — asserted below."""
    assert 0 <= round_to <= 6, (
        f"lsum_unscaled: round_to={round_to} > 6 would pre-round the "
        "DECIMAL(38,0)/10^round_to quotient at 6dp (allowPrecisionLoss "
        "scale cap) and diverge from dsum in the last ulp"
    )
    top = limbs - 1
    parts = []
    for i in range(limbs):
        limb = _limb_sql(v_sql, i) if i < top else f"(({v_sql}) div {_LIMB ** top})"
        parts.append(f"CAST(SUM({limb}) AS DECIMAL(38,0)) * {_LIMB ** i}")
    u = " + ".join(parts)  # exact unscaled total, DECIMAL(38,0) group grain
    d = scale - round_to
    if d > 0:
        half = (10**d) // 2
        u2 = (
            f"(CASE WHEN ({u}) >= 0 THEN ({u}) + {half} "
            f"ELSE ({u}) - {half} END) div {10 ** d}"
        )
    else:
        u2 = f"({u}) * {10 ** -d}" if d < 0 else f"({u})"
    # U2 div yields DECIMAL(38,0); /10^round_to is exact (result scale >=
    # round_to after Spark's precision adjustment), then the DOUBLE cast is
    # BigDecimal.doubleValue of the same value ROUND(SUM(...), r) produces.
    return F.expr(
        f"CAST(CAST(({u2}) AS DECIMAL(38,0)) / {10 ** round_to} AS DOUBLE)"
    ).alias(alias)


def lavg_unscaled(
    v_sql: str,
    scale: int,
    alias: str,
    round_to: int = 6,
    limbs: int = 3,
) -> Column:
    """Exact AVG twin of davg() over unscaled-long rows: the exact decimal
    sum (reassembled from limb sums) cast to DOUBLE, divided by COUNT(*)
    in double space, rounded — step for step what davg() computes.

    `scale` <= 6 is asserted (ADVICE r11): the U/10^scale quotient's
    result scale is capped at 6 under allowPrecisionLoss, so a larger
    scale would pre-round at 6dp and diverge from davg in the last ulp
    (latent today — every call site uses scale <= 4)."""
    assert 0 <= scale <= 6, (
        f"lavg_unscaled: scale={scale} > 6 would pre-round the "
        "DECIMAL(38,0)/10^scale quotient at 6dp (allowPrecisionLoss "
        "scale cap); divide via the integer path or fall back to davg"
    )
    top = limbs - 1
    parts = []
    for i in range(limbs):
        limb = _limb_sql(v_sql, i) if i < top else f"(({v_sql}) div {_LIMB ** top})"
        parts.append(f"CAST(SUM({limb}) AS DECIMAL(38,0)) * {_LIMB ** i}")
    u = " + ".join(parts)
    # U / 10^scale as an exact decimal (scale >= `scale` post-adjustment),
    # cast DOUBLE == CAST(SUM(decimal) AS DOUBLE) of davg's numerator.
    return F.expr(
        f"ROUND(CAST(CAST(({u}) AS DECIMAL(38,0)) / {10 ** scale} AS DOUBLE)"
        f" / COUNT(*), {round_to})"
    ).alias(alias)
