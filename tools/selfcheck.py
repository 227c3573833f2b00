"""Local replica of the driver's correctness gate.

Runs every `queries()` entry at a given sf dir, runs the matching
`oracle_sql()` in DuckDB over the same parquet, and compares row count,
column names (sorted), and exact values (rows sorted by all columns).

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_pipline_ibrd_loan_system_spark.catalog import TABLES  # noqa: E402
from etl_pipline_ibrd_loan_system_spark.session import get_session  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """NB: datetime columns keep their native resolution (Spark toPandas
    -> ns, DuckDB fetchdf -> us). pandas' assert_frame_equal compares
    NaT slots of MIXED-resolution datetime columns as unequal, so a
    NULLABLE timestamp result column fails here even when values agree
    (ss2's original shape). That is deliberate — the driver's
    canonicalizer is not known to unify resolutions either; registered
    queries must emit nullable instants as epoch micros (unix_micros /
    epoch_us), never as a nullable TIMESTAMP column."""
    import datetime

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
            lambda v: v is None or isinstance(v, datetime.date)
        ).all() and df[c].notna().any():
            df[c] = pd.to_datetime(df[c])
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _array_cols(df: pd.DataFrame) -> list[str]:
    """Columns holding list-like cells. The driver's canonicalizer sorts
    rows with pandas over every column and raises `unhashable type: list`
    on these — selfcheck must fail them too, not coerce them (the r3
    tx5/mm4 failures were invisible locally because the old normalize()
    silently tuple-ized lists)."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            nonnull = df[c].dropna()
            if len(nonnull) and nonnull.map(
                lambda v: isinstance(v, (list, tuple, dict))
                or (hasattr(v, "tolist") and not isinstance(v, (str, bytes)))
            ).any():
                bad.append(c)
    return bad


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    bad = sorted(set(_array_cols(sdf)) | set(_array_cols(odf)))
    if bad:
        problems.append(
            f"array/map-typed result columns {bad}: the driver's canonicalizer "
            "cannot sort list cells - reshape to scalar rows (posexplode / "
            "unnest WITH ORDINALITY) in the registered query wrapper"
        )
        return problems
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    s, o = normalize(sdf), normalize(odf)
    # Integer-vs-float dtype divergence check (VERDICT r7 "What's wrong" #2):
    # the driver hashes canonicalized value STRINGS, so a DuckDB HUGEINT that
    # fetchdf() materializes as float64 ("389.0") hash-mismatches Spark's
    # bigint ("389") even though assert_frame_equal(check_dtype=False) passes.
    # Replicate the driver's sensitivity: any column where one side is integer
    # dtype and the other floating is a failure (cast the oracle SUM to BIGINT).
    for c in s.columns:
        skind = getattr(s[c].dtype, "kind", None)
        okind = getattr(o[c].dtype, "kind", None)
        if {skind, okind} == {"i", "f"} or {skind, okind} == {"u", "f"}:
            problems.append(
                f"dtype divergence on '{c}': spark={s[c].dtype} vs "
                f"oracle={o[c].dtype} - the driver's value hash treats "
                "389 != 389.0; CAST the oracle expression to BIGINT"
            )
    if len(s) == len(o):
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
        except AssertionError as exc:
            msg = str(exc).split("\n")
            problems.append("values differ: " + " | ".join(msg[:6]))
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else (
        set(sys.argv[1:]) if len(sys.argv) > 1 and not os.path.isdir(sys.argv[1]) else None
    )
    spark = get_session("selfcheck")
    # bounded-window WARN suppression (VERDICT r8 item 5): same
    # structural silencer bench.py uses, so a full sweep log is
    # warning-clean and a NEW unpartitioned-window regression is caught
    # by the plan gates, not buried under the audited bounded ones
    from etl_pipline_ibrd_loan_system_spark.session import (
        silence_bounded_window_warn,
    )

    silence_bounded_window_warn(spark)
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark directory layout (.scale/sf1)
            path = os.path.join(path, "*.parquet")
        if os.path.isdir(os.path.dirname(path)) and (
            os.path.exists(path) or path.endswith("*.parquet")
        ):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    from etl_pipline_ibrd_loan_system_spark.queries import (
        REGISTRY_ERRORS,
        ROWS_ONLY,
        rotation_lint,
    )
    failed = []
    # driver-window staleness lint (VERDICT r6 item 8): the registry can't
    # outgrow its driver-verification schedule — fail fast, before anything runs
    for problem in rotation_lint():
        print(f"FAIL  rotation: {problem}")
        failed.append("lint:rotation")
    # registry lint (VERDICT r4 item 7): every query needs an oracle or an
    # explicit rows-only declaration — fail fast, before anything runs
    for name in qs:
        if name not in oracles and name not in ROWS_ONLY:
            print(
                f"FAIL  {name}: no oracle_sql and not declared in "
                "queries.ROWS_ONLY - add the oracle or the declaration"
            )
            failed.append(f"lint:{name}")
    for name in sorted(ROWS_ONLY - set(qs)):
        print(f"FAIL  ROWS_ONLY declares unknown query {name!r}")
        failed.append(f"lint:{name}")
    # a typoed DRIVER_PRIORITY name is silently skipped by _driver_order,
    # shrinking the driver's 50-slot window with no error anywhere
    from etl_pipline_ibrd_loan_system_spark.queries import DRIVER_PRIORITY

    for name in DRIVER_PRIORITY:
        if name not in qs:
            print(f"FAIL  DRIVER_PRIORITY names unknown query {name!r}")
            failed.append(f"lint:{name}")
    if only:
        for name in sorted(only - set(qs)):
            # a typoed name must not count as passed (it would never run)
            print(f"FAIL  {name}: unknown query name")
            failed.append(name)
    for mod, tb in REGISTRY_ERRORS.items():
        print(f"FAIL  registry import {mod}:\n{tb}")
        failed.append(f"registry:{mod}")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failed.append(name)
            continue
        t_spark = time.time() - t0
        status = f"rows={len(sdf)}"
        t_oracle = 0.0
        if name in oracles:
            t1 = time.time()
            try:
                odf = con.execute(oracles[name]).fetchdf()
            except Exception:
                print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
                failed.append(name)
                continue
            t_oracle = time.time() - t1
            problems = compare(name, sdf, odf)
            if problems:
                print(f"FAIL  {name}: " + "; ".join(problems))
                failed.append(name)
                continue
            status += " oracle=match"
        else:
            status += " oracle=NONE(rows-only)"
        print(f"ok    {name}: {status} (spark={t_spark:.1f}s oracle={t_oracle:.1f}s)")
    total = len(only) if only else len(qs)
    print(f"\n{total - len(failed)}/{total} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
