"""Warehouse sinks — the reference's write surface, Spark-first.

Reference parity:
- JDBC overwrite (`spark_airflow.ipynb:389 (cell 8)`, SURVEY §2.A A6)
- JDBC append   (`pyspark_dag2.py:428-440`, A7)
- fast-load insert destinations (`project SSIS::bor_dim.dtsx:283-297`, A10)
- per-row UPDATE commands (A11) — replaced by the SCD overwrite-rebuild
  (operators.scd) / optional Delta MERGE; vanilla Spark has no row UPDATE
  and per-row JDBC UPDATE is precisely the anti-pattern that caps the
  reference at single-node throughput.

The JDBC wrappers are thin passes over `DataFrameWriter.jdbc`. No SQL
Server exists in the test container, but the suite round-trips them
against EMBEDDED Derby (on Spark's own classpath, `jdbc:derby:<dir>`),
so overwrite/append/idempotent-append semantics are proven against a
real database, not import-only.

Scale notes: `partitioned_overwrite` writes with explicit partition
columns so downstream scans prune; `idempotent_append` makes micro-batch
re-runs safe (the at-least-once paged source, A2) by anti-joining on the
batch key before the append — dedup happens on the key column only, no
full-row compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Database-specific "relation does not exist" markers. Only these make
#: a failed existing-keys read mean "first run, everything is fresh";
#: any other failure (connection, auth, timeout) must re-raise, or the
#: idempotent append silently degrades to plain append — duplicating
#: rows on exactly the retry path it exists to protect.
_MISSING_TABLE_MARKERS = (
    "does not exist",          # Derby / Postgres message text
    "42x05",                   # Derby SQLState: table/view not found
    "42p01",                   # Postgres SQLState: undefined_table
    "invalid object name",     # SQL Server
    "table or view not found", # Spark catalog phrasing
    "1146",                    # MySQL ER_NO_SUCH_TABLE
)


def _is_missing_table(exc: Exception) -> bool:
    return any(m in str(exc).lower() for m in _MISSING_TABLE_MARKERS)


def jdbc_overwrite(df: DataFrame, url: str, table: str, properties: dict | None = None) -> None:
    """A6: full-table overwrite over JDBC (reference staging-table load)."""
    df.write.jdbc(url=url, table=table, mode="overwrite", properties=properties or {})


def jdbc_append(df: DataFrame, url: str, table: str, properties: dict | None = None) -> None:
    """A7: append over JDBC (reference hourly micro-batch commit)."""
    df.write.jdbc(url=url, table=table, mode="append", properties=properties or {})


def jdbc_idempotent_append(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    key_col: str,
    properties: dict | None = None,
) -> int:
    """A7 at-least-once-safe variant: anti-join the batch against the
    keys already in the JDBC table, append only the fresh rows. Returns
    rows written. The existing-side read projects ONLY the key column —
    with a pushed-down projection that becomes `SELECT key FROM table`
    at the database, not a full-table transfer. A missing table means a
    first run: everything is fresh."""
    props = properties or {}
    try:
        existing = spark.read.jdbc(url=url, table=table, properties=props).select(
            key_col
        )
    except Exception as exc:
        if not _is_missing_table(exc):
            raise
        existing = None
    fresh = df if existing is None else df.join(existing, key_col, "left_anti")
    # persist so count and write see ONE evaluation of the anti-join —
    # re-reading the JDBC keys between the two actions could both skew
    # the returned count and let a concurrently-inserted key through.
    fresh = fresh.persist()
    try:
        n = fresh.count()
        if n:
            fresh.write.jdbc(url=url, table=table, mode="append", properties=props)
    finally:
        fresh.unpersist()
    return n


def fast_load(df: DataFrame, path: str) -> None:
    """A10: bulk insert destination — Parquet append, the columnar
    equivalent of SSIS fast-load."""
    df.write.mode("append").parquet(path)


def partitioned_overwrite(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Partition-pruned warehouse layout: one directory per key so the
    BI-layer queries (year/region slicers) scan only their slice."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def idempotent_append(
    spark: SparkSession, df: DataFrame, path: str, key_col: str
) -> int:
    """At-least-once-safe append: drop rows whose key already exists in
    the sink (left_anti on key), then append. Returns rows written.
    The anti-join reads only the key column from the sink (column
    pruning reaches the parquet scan)."""
    try:
        existing = spark.read.parquet(path).select(key_col)
    except Exception as exc:
        msg = str(exc).lower()
        if "path does not exist" not in msg and "unable to infer schema" not in msg:
            raise
        existing = None
    fresh = df if existing is None else df.join(existing, key_col, "left_anti")
    fresh = fresh.persist()  # one evaluation for both count and write
    try:
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(path)
    finally:
        fresh.unpersist()
    return n


def bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Bucketed warehouse table (`bucketBy` + saveAsTable): two tables
    bucketed on the same key with the same bucket count join with ZERO
    shuffle — the co-located-star-join layout SCALE.md prescribes when
    a dimension outgrows the broadcast threshold. `path` makes it an
    external table (warehouse dir is a static conf)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
