"""Regression tests for tools/selfcheck.py::compare — the local replica
of the driver's correctness hash.

VERDICT r7 "What's wrong" #2: the r7 driver reds (q12/dq12) were
invisible to seven local full sweeps because compare() used
assert_frame_equal(check_dtype=False), which treats 389.0 == 389 while
the driver's canonicalized value hash does not. compare() now fails any
column where one side is integer dtype and the other floating — these
tests pin that behavior with the exact DuckDB HUGEINT→float64 shape
that produced the reds.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from selfcheck import compare  # noqa: E402


def test_int_vs_float_dtype_divergence_fails():
    """The un-cast fixture: DuckDB types SUM(CASE WHEN..1..0) as HUGEINT
    and fetchdf() materializes it as float64; Spark emits bigint. Values
    are identical — the driver's hash still diverges, so compare must
    fail."""
    con = duckdb.connect()
    oracle = con.sql(
        "SELECT 'A' AS k, SUM(CASE WHEN i >= 0 THEN 1 ELSE 0 END) AS n"
        " FROM range(389) t(i) GROUP BY k"
    ).fetchdf()
    assert oracle["n"].dtype.kind == "f", (
        "fixture precondition: DuckDB HUGEINT must land as float64 "
        f"(got {oracle['n'].dtype}) - if duckdb changed this, the driver "
        "blind spot may be gone; re-verify before relaxing compare()"
    )
    spark_side = pd.DataFrame({"k": ["A"], "n": pd.array([389], dtype="int64")})
    problems = compare("fixture", spark_side, oracle)
    assert any("dtype divergence" in p for p in problems), problems


def test_bigint_cast_fixture_passes():
    """Same values with the oracle-side CAST(... AS BIGINT) — the fix
    applied to the 8 HUGEINT oracles — must compare clean."""
    con = duckdb.connect()
    oracle = con.sql(
        "SELECT 'A' AS k,"
        " CAST(SUM(CASE WHEN i >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n"
        " FROM range(389) t(i) GROUP BY k"
    ).fetchdf()
    spark_side = pd.DataFrame({"k": ["A"], "n": pd.array([389], dtype="int64")})
    assert compare("fixture", spark_side, oracle) == []


def test_float_measures_on_both_sides_still_pass():
    """Double-typed measures (the exact-decimal-rounded-to-double
    convention) are float on BOTH sides — no divergence flag."""
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    b = pd.DataFrame({"k": pd.array([1, 2], dtype="int32"), "v": [1.5, 2.5]})
    assert compare("fixture", a, b) == []


def test_actual_value_mismatch_still_caught():
    a = pd.DataFrame({"k": [1], "v": [10]})
    b = pd.DataFrame({"k": [1], "v": [11]})
    assert any("values differ" in p for p in compare("fixture", a, b))
