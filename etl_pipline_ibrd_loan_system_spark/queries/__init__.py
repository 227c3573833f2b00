"""Oracle-checked query catalog — the driver contract surface.

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline operators) registers here as a named query `(spark, sf_dir) ->
DataFrame`, optionally with the ANSI-SQL oracle DuckDB runs on the same
parquet tables. `__spark_entry__.py` re-exports this registry.

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver sorts columns by name before
hashing). Float aggregates go through functions.exact so both engines
produce bit-identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}
REGISTRY_ERRORS: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    """Register a query; `sql=None` -> rows-only check (non-SQL-expressible)."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def load_registry():
    """Import every query module (side-effect registration).

    A failing module must not silently shrink the registry — the driver
    would then under-report coverage with no error anywhere. Import
    failures are recorded in REGISTRY_ERRORS and printed to stderr; only
    a missing OPTIONAL third-party dependency is tolerated silently
    (none of the query modules currently has one)."""
    import sys
    import traceback

    from . import core  # noqa: F401

    for mod in ("star_queries", "measure_queries", "dedup_queries",
                "text_queries", "similarity_queries", "multimodal_queries",
                "stream_queries"):
        try:
            __import__(f"{__name__}.{mod}", fromlist=[mod])
        except Exception:  # noqa: BLE001 — recorded and surfaced, not dropped
            REGISTRY_ERRORS[mod] = traceback.format_exc()
            print(
                f"[queries.load_registry] FAILED to import {mod}:\n"
                f"{REGISTRY_ERRORS[mod]}",
                file=sys.stderr,
            )
    return QUERIES, ORACLE
