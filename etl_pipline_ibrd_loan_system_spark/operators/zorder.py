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
