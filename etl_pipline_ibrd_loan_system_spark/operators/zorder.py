"""Z-order (Morton) multi-dimensional clustering keys.

The 100 TB layout tool the 1-D range clustering in
`sources/maintenance.py::compact_small_files(sort_cols=...)` cannot
provide: sorting by ONE column gives tight file-level min/max for that
column only, so scans filtered on a second dimension prune nothing.
Interleaving the bits of two (rank-normalized) dimensions into one
Morton key and range-clustering by it bounds EVERY file to a small
rectangle in (d1, d2) space — both filters prune, which is the point of
Z-ordering in lakehouse table formats.

All arithmetic is integer-exact and engine-portable: min/max
normalization uses integer division (`div`/`//` per dialect), the bit
interleave is a generated `(x >> i & 1) << j` sum identical in Spark SQL
and ANSI SQL, so the DuckDB oracle replays keys bit-for-bit.

Scale shape: one combinable min/max aggregate (1 row, broadcast back —
the dq3 stats pattern), then a pure per-row projection; clustering
itself is `repartitionByRange(zkey)` or compact_small_files with
sort_cols=["zkey"], i.e. one range shuffle — the same cost as any sort,
paid once at layout time to make every later scan cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interleave_sql(d1: str, d2: str, bits: int = 16) -> str:
    """Bit-interleave expression string valid in BOTH Spark SQL and
    DuckDB: d1's bit i lands at position 2i, d2's at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"((({d1}) >> {i} & 1) << {2 * i})")
        terms.append(f"((({d2}) >> {i} & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _norm_sql(col: str, mn: str, mx: str, bits: int, div: str) -> str:
    """Integer min/max normalization of `col` onto [0, 2^bits): exact
    BIGINT arithmetic, `div` is the dialect's integer-division operator
    ('div' for Spark, '//' for DuckDB)."""
    top = (1 << bits) - 1
    return (
        f"(CASE WHEN ({mx}) > ({mn}) THEN "
        f"((({col}) - ({mn})) * {top}) {div} (({mx}) - ({mn})) "
        f"ELSE 0 END)"
    )


def zorder_layout(
    df: DataFrame,
    d1: str,
    d2: str,
    bits: int = 16,
    bucket_bits: int = 8,
) -> DataFrame:
    """Per-Z-bucket layout statistics: bucket id (top `bucket_bits` of
    the interleaved key — what range clustering would put in one file
    group), row count, and the min/max of both dimensions inside it.
    The tightness of those rectangles IS the scan-pruning guarantee.

    `d1`/`d2` are integer-valued SQL expressions over df's columns.
    """
    stats = df.agg(
        F.expr(f"min({d1})").alias("__mn1"),
        F.expr(f"max({d1})").alias("__mx1"),
        F.expr(f"min({d2})").alias("__mn2"),
        F.expr(f"max({d2})").alias("__mx2"),
    )
    j = df.join(F.broadcast(stats))
    n1 = _norm_sql(d1, "__mn1", "__mx1", bits, "div")
    n2 = _norm_sql(d2, "__mn2", "__mx2", bits, "div")
    zkey = interleave_sql(n1, n2, bits)
    shift = 2 * bits - bucket_bits
    return (
        j.withColumn("zbucket", F.expr(f"{zkey} >> {shift}"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(f"min({d1})").alias("min_d1"),
            F.expr(f"max({d1})").alias("max_d1"),
            F.expr(f"min({d2})").alias("min_d2"),
            F.expr(f"max({d2})").alias("max_d2"),
        )
    )


def zorder_layout_oracle_sql(
    table: str, d1: str, d2: str, bits: int = 16, bucket_bits: int = 8
) -> str:
    """DuckDB replay of zorder_layout — same normalization and
    interleave, `//` integer division."""
    n1 = _norm_sql(d1, "(SELECT min(" + d1 + ") FROM " + table + ")",
                   "(SELECT max(" + d1 + ") FROM " + table + ")", bits, "//")
    n2 = _norm_sql(d2, "(SELECT min(" + d2 + ") FROM " + table + ")",
                   "(SELECT max(" + d2 + ") FROM " + table + ")", bits, "//")
    zkey = interleave_sql(n1, n2, bits)
    shift = 2 * bits - bucket_bits
    return f"""
    SELECT ({zkey} >> {shift}) AS zbucket,
           COUNT(*) AS n_rows,
           MIN({d1}) AS min_d1, MAX({d1}) AS max_d1,
           MIN({d2}) AS min_d2, MAX({d2}) AS max_d2
    FROM {table}
    GROUP BY 1
    """


# --- Hilbert curve layout (zo2) -------------------------------------------


def _hilbert_stage_exprs(s: int) -> tuple[str, str, str]:
    """One unrolled stage of the classic iterative Hilbert xy->d walk
    (Warren, Hacker's Delight §16; the Wikipedia `xy2d` form) over
    working columns hx/hy/hd, as THREE expression strings valid in both
    Spark SQL and DuckDB (CASE / & / * / - only; no dialect-specific
    XOR — (3*rx) XOR ry for rx,ry in {0,1} is 3*rx + ry - 2*rx*ry):

        rx = (hx & s) > 0;  ry = (hy & s) > 0
        hd += s*s * ((3*rx) ^ ry)
        if ry == 0:  (reflect when rx == 1, then transpose)
    """
    rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
    d_e = f"hd + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    x_e = (
        f"CASE WHEN {ry} = 1 THEN hx "
        f"WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END"
    )
    y_e = (
        f"CASE WHEN {ry} = 1 THEN hy "
        f"WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END"
    )
    return x_e, y_e, d_e


def hilbert_layout(
    df: DataFrame,
    d1: str,
    d2: str,
    bits: int = 8,
    bucket_bits: int = 8,
) -> DataFrame:
    """Per-Hilbert-bucket layout statistics — zorder_layout's twin on
    the Hilbert curve. Unlike Morton order, consecutive Hilbert keys
    are always grid-adjacent (no quadrant jumps), so equal key ranges
    pin tighter rectangles: the reason lakehouse engines offer Hilbert
    clustering as the upgrade over Z-order for multi-filter pruning.

    Same contract as zorder_layout: `d1`/`d2` integer SQL expressions,
    min/max-normalized onto a 2^bits grid (one broadcast stats row),
    then `bits` unrolled integer stages per row — pure projection
    inside whole-stage codegen, no UDF, no shuffle before the final
    bucket aggregate. Key arithmetic is BIGINT-exact and the oracle
    replays the identical stage expressions.
    """
    stats = df.agg(
        F.expr(f"min({d1})").alias("__mn1"),
        F.expr(f"max({d1})").alias("__mx1"),
        F.expr(f"min({d2})").alias("__mn2"),
        F.expr(f"max({d2})").alias("__mx2"),
    )
    j = df.join(F.broadcast(stats))
    n1 = _norm_sql(d1, "__mn1", "__mx1", bits, "div")
    n2 = _norm_sql(d2, "__mn2", "__mx2", bits, "div")
    cur = j.withColumn("hx", F.expr(f"CAST({n1} AS BIGINT)")).withColumn(
        "hy", F.expr(f"CAST({n2} AS BIGINT)")
    ).withColumn("hd", F.expr("CAST(0 AS BIGINT)"))
    keep = [c for c in cur.columns if c not in ("hx", "hy", "hd")]
    for p in range(bits - 1, -1, -1):
        x_e, y_e, d_e = _hilbert_stage_exprs(1 << p)
        cur = cur.select(
            *keep,
            F.expr(x_e).alias("hx"),
            F.expr(y_e).alias("hy"),
            F.expr(d_e).alias("hd"),
        )
    shift = 2 * bits - bucket_bits
    return (
        cur.withColumn("hbucket", F.expr(f"hd >> {shift}"))
        .groupBy("hbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(f"min({d1})").alias("min_d1"),
            F.expr(f"max({d1})").alias("max_d1"),
            F.expr(f"min({d2})").alias("min_d2"),
            F.expr(f"max({d2})").alias("max_d2"),
        )
    )


def hilbert_layout_oracle_sql(
    table: str, d1: str, d2: str, bits: int = 8, bucket_bits: int = 8
) -> str:
    """DuckDB replay of hilbert_layout: identical normalization and the
    same generated stage expressions, chained through one CTE per
    stage."""
    n1 = _norm_sql(d1, "(SELECT min(" + d1 + ") FROM " + table + ")",
                   "(SELECT max(" + d1 + ") FROM " + table + ")", bits, "//")
    n2 = _norm_sql(d2, "(SELECT min(" + d2 + ") FROM " + table + ")",
                   "(SELECT max(" + d2 + ") FROM " + table + ")", bits, "//")
    ctes = [
        f"h{bits} AS (SELECT {d1} AS __d1, {d2} AS __d2,"
        f" CAST({n1} AS BIGINT) AS hx, CAST({n2} AS BIGINT) AS hy,"
        f" CAST(0 AS BIGINT) AS hd FROM {table})"
    ]
    prev = f"h{bits}"
    for p in range(bits - 1, -1, -1):
        x_e, y_e, d_e = _hilbert_stage_exprs(1 << p)
        ctes.append(
            f"h{p} AS (SELECT __d1, __d2, ({x_e}) AS hx, ({y_e}) AS hy,"
            f" ({d_e}) AS hd FROM {prev})"
        )
        prev = f"h{p}"
    shift = 2 * bits - bucket_bits
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block}
    SELECT (hd >> {shift}) AS hbucket,
           COUNT(*) AS n_rows,
           MIN(__d1) AS min_d1, MAX(__d1) AS max_d1,
           MIN(__d2) AS min_d2, MAX(__d2) AS max_d2
    FROM {prev}
    GROUP BY 1
    """
