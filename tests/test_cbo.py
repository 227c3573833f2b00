"""Cost-based optimizer surface: ANALYZE TABLE statistics feeding
Catalyst's stats-driven join reorder.

At 100 TB the syntactic join order a user writes is rarely the cheap
one; the engine must be able to collect table/column statistics and let
the CBO re-plan the join tree from cardinalities instead of file sizes.
This module proves the full loop on managed tables: ANALYZE populates
exact rowCounts, the optimizer's stats reflect them, and with
`spark.sql.cbo.joinReorder.enabled` a deliberately-bad syntactic order
(fact ⋈ dim ⋈ tiny-dim) is rewritten to join the two small relations
first — while with CBO off the syntactic order is preserved (control,
so the assertion can't pass vacuously).
"""

from __future__ import annotations

import contextlib

import pytest


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, str(v))
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def cbo_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("cbo_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS cbodb LOCATION '{wh}'")
    for t in ("lineitem", "part", "region"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).saveAsTable(f"cbodb.{t}")
        spark.sql(f"ANALYZE TABLE cbodb.{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield
    spark.sql("DROP DATABASE cbodb CASCADE")


_JOIN_SQL = """
    SELECT r.r_name, count(*) AS n FROM cbodb.lineitem l
    JOIN cbodb.part p ON l.l_partkey = p.p_partkey
    JOIN cbodb.region r ON p.p_size % 5 = r.r_regionkey
    GROUP BY r.r_name
"""


def _innermost_join_condition(plan: str) -> str:
    """The condition of the innermost (first-executed) join — the LAST
    `Join Inner` line of the optimized plan string."""
    start = plan.rindex("Join Inner")
    return plan[start : plan.index("\n", start)]


def test_analyze_populates_exact_rowcount(spark, sf_dir, cbo_tables):
    expected = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    with _confs(spark, **{"spark.sql.cbo.enabled": "true"}):
        df = spark.table("cbodb.lineitem")
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().get() == expected, (
            "ANALYZE did not surface an exact rowCount to the optimizer"
        )


def test_cbo_reorders_bad_syntactic_join_order(spark, cbo_tables):
    with _confs(
        spark,
        **{
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
        },
    ):
        plan = (
            spark.sql(_JOIN_SQL)._jdf.queryExecution().optimizedPlan().toString()
        )
    cond = _innermost_join_condition(plan)
    # the dim-dim join (part ⋈ region on the p_size ring key) must run
    # first; the fact-key equi condition belongs to the OUTER join
    assert "r_regionkey" in cond, (
        "CBO did not move the dim-dim join innermost:\n" + plan
    )
    assert "l_partkey" not in cond, (
        "the fact join is still innermost:\n" + plan
    )


def test_without_cbo_syntactic_order_kept(spark, cbo_tables):
    """Control: with CBO off the innermost join is the one the user
    wrote (lineitem ⋈ part) — proving the reorder above came from the
    statistics, not from some always-on rewrite."""
    with _confs(
        spark,
        **{
            "spark.sql.cbo.enabled": "false",
            "spark.sql.cbo.joinReorder.enabled": "false",
        },
    ):
        plan = (
            spark.sql(_JOIN_SQL)._jdf.queryExecution().optimizedPlan().toString()
        )
    cond = _innermost_join_condition(plan)
    assert "l_partkey" in cond and "p_partkey" in cond, (
        "expected the syntactic (lineitem ⋈ part) inner join with CBO off:\n"
        + plan
    )
