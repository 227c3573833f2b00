"""SCD2 engine property tests (SURVEY.md §5.3, FIXTURES.md §C).

Invariants: at most one current row per business key; version intervals
non-overlapping; idempotence (re-applying the same staging is a no-op);
all three routing outputs exercised by the two-load fixture.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_pipline_ibrd_loan_system_spark.operators.scd import (
    scd2_apply,
    scd2_init,
    scd_classify,
)

ROWS0 = [
    # (bk, name[T2], balance[T1], country[fixed])
    ("b1", "alpha", 10.0, "fr"),
    ("b2", "beta", 20.0, "de"),
    ("b3", "gamma", 30.0, "es"),
    ("b4", "delta", 40.0, "it"),
]
ROWS1 = [
    ("b1", "alpha", 10.0, "fr"),        # unchanged
    ("b2", "beta", 25.0, "de"),         # T1: balance overwritten
    ("b3", "gamma_renamed", 30.0, "es"),  # T2: new version
    ("b5", "epsilon", 50.0, "pt"),      # new key  (b4 absent -> stays current)
]
COLS = ["bk", "name", "balance", "country"]
KW = dict(key="bk", t1_cols=["balance"], t2_cols=["name"], fixed_cols=["country"], sk_col="sk")


@pytest.fixture(scope="module")
def dims(spark):
    s0 = spark.createDataFrame(ROWS0, COLS)
    s1 = spark.createDataFrame(ROWS1, COLS)
    # dense pinned: this fixture tests the SSIS-IDENTITY parity numbering
    # (sk == 1..n, continuation from max) — the hash default is covered by
    # test_sk_hash_strategy and the snaptable suite
    dim0 = scd2_init(s0, key="bk", attr_cols=COLS[1:], asof="2024-01-01",
                     sk_col="sk", sk_strategy="dense")
    dim1 = scd2_apply(dim0, s1, asof="2024-02-01", sk_strategy="dense", **KW)
    return s0, s1, dim0, dim1


def test_initial_load_all_current(spark, dims):
    _, _, dim0, _ = dims
    rows = dim0.collect()
    assert len(rows) == 4
    assert all(r.is_current for r in rows)
    assert sorted(r.sk for r in rows) == [1, 2, 3, 4]


def test_classification(spark, dims):
    s0, s1, dim0, _ = dims
    c = {
        r.change_type: r.n
        for r in scd_classify(dim0, s1, **KW)
        .groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert c == {"unchanged": 1, "t1": 1, "t2": 1, "new": 1}


def test_apply_routing(spark, dims):
    *_, dim1 = dims
    rows = {(r.bk, r.is_current): r for r in dim1.collect()}
    assert len(rows) == 6  # 4 original + closed b3 version replaced + b5
    # T1: balance overwritten in place, version row intact
    b2 = rows[("b2", True)]
    assert b2.balance == 25.0 and str(b2.start_date) == "2024-01-01"
    # T2: old version closed, new version opened
    b3_old, b3_new = rows[("b3", False)], rows[("b3", True)]
    assert b3_old.name == "gamma" and str(b3_old.end_date) == "2024-02-01"
    assert b3_new.name == "gamma_renamed" and str(b3_new.start_date) == "2024-02-01"
    assert b3_new.end_date is None
    # absent key untouched
    assert rows[("b4", True)].name == "delta"
    # new key inserted with fresh SK
    assert rows[("b5", True)].sk > 4


def test_invariant_one_current_per_key(spark, dims):
    *_, dim1 = dims
    dupes = (
        dim1.filter("is_current").groupBy("bk").count().filter("count > 1").count()
    )
    assert dupes == 0


def test_invariant_nonoverlapping_intervals(spark, dims):
    *_, dim1 = dims
    from pyspark.sql import Window

    w = Window.partitionBy("bk").orderBy("start_date")
    overlaps = (
        dim1.withColumn("next_start", F.lead("start_date").over(w))
        .filter(F.col("next_start").isNotNull())
        .filter(~(F.col("end_date") <= F.col("next_start")))
        .count()
    )
    assert overlaps == 0


def test_idempotent_reapply(spark, dims):
    _, s1, _, dim1 = dims
    dim2 = scd2_apply(dim1, s1, asof="2024-03-01", **KW)
    a = sorted(map(tuple, dim1.collect()))
    b = sorted(map(tuple, dim2.collect()))
    assert a == b


def test_duplicate_key_staging_collapses(spark, dims):
    """Two staging rows with the same business key but different attrs must
    yield exactly ONE current version (the attr-wise smallest wins), both
    on initial load and on apply."""
    s_dup = spark.createDataFrame(
        [("b9", "zeta", 1.0, "gr"), ("b9", "zeta_b", 2.0, "gr")], COLS
    )
    dim0 = scd2_init(s_dup, key="bk", attr_cols=COLS[1:], asof="2024-01-01", sk_col="sk")
    assert dim0.count() == 1
    assert dim0.collect()[0].name == "zeta"  # deterministic winner

    *_, dim1 = dims
    dim2 = scd2_apply(dim1, s_dup, asof="2024-03-01", **KW)
    b9 = dim2.filter("bk = 'b9' and is_current").collect()
    assert len(b9) == 1 and b9[0].name == "zeta"


def test_hash_sk_strategy_distributed(spark, dims):
    s0, s1, _, _ = dims
    dim0 = scd2_init(s0, key="bk", attr_cols=COLS[1:], asof="2024-01-01",
                     sk_col="sk", sk_strategy="hash")
    dim1 = scd2_apply(dim0, s1, asof="2024-02-01", sk_strategy="hash", **KW)
    assert dim1.select("sk").distinct().count() == dim1.count()  # unique SKs
    assert dim1.filter("is_current").count() == 5


# ---- MERGE INTO twin (production path on Delta/Iceberg) ----------------

MERGE_KW = dict(
    key="bk", t1_cols=["balance"], t2_cols=["name"], fixed_cols=["country"],
    asof="2024-02-01", key_type="string",
)


def test_merge_sql_parses(spark):
    """The generated MERGE must be valid Spark SQL — proven by Spark's
    own parser, not by string inspection."""
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_merge_sql

    sql = scd2_merge_sql("borrower_dim", "staging_v", **MERGE_KW)
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    assert "MergeIntoTable" in plan.getClass().getSimpleName()


def test_merge_sql_routes_match_scd2_apply_branches(spark):
    """Statement shape mirrors the rebuild's slices: T2 close, T1
    in-place update, insert of new keys AND new T2 versions (via the
    NULL merge key), null-safe change predicates, hash SKs."""
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_merge_sql

    sql = scd2_merge_sql("borrower_dim", "staging_v", **MERGE_KW)
    # T2 close: end_date stamped, is_current dropped on the matched row
    assert "d.end_date = DATE'2024-02-01', d.is_current = FALSE" in sql
    # T1: only the T1 column is overwritten in place
    assert "THEN UPDATE SET d.balance = u.balance" in sql
    # fresh versions: NULL merge key never matches -> falls through to INSERT
    assert "CAST(NULL AS string) AS __merge_key" in sql
    assert "WHEN NOT MATCHED THEN INSERT (sk, bk, balance, name, country, start_date, end_date, is_current)" in sql
    # hash SK strategy (the only scale-safe one under MERGE)
    assert "xxhash64(u.bk, '2024-02-01')" in sql
    # change detection is null-safe in every predicate position
    assert "NOT (s.name <=> d.name)" in sql and "NOT (d.name <=> u.name)" in sql
    # probe restricted to current rows on both the USING join and the ON
    assert sql.count("d.is_current") >= 3


def test_merge_without_t1_cols_omits_t1_clause(spark):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_merge_sql

    sql = scd2_merge_sql(
        "d_t", "s_v", key="bk", t2_cols=["name"], fixed_cols=["country"],
        asof="2024-02-01", key_type="string",
    )
    assert sql.count("WHEN MATCHED") == 1  # only the T2 close remains
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    assert "MergeIntoTable" in plan.getClass().getSimpleName()


def test_merge_on_parquet_table_is_guarded(spark, dims, tmp_path):
    """No MERGE-capable format in the sandbox: a parquet table must fail
    with the pointer to the overwrite-rebuild twin, not a raw JVM error."""
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_apply_merge

    _, s1, dim0, _ = dims
    dim0.write.mode("overwrite").option(
        "path", str(tmp_path / "dim_tbl")
    ).saveAsTable("scd_merge_guard_dim")
    try:
        with pytest.raises(RuntimeError, match="scd2_apply"):
            scd2_apply_merge(
                spark, "scd_merge_guard_dim", s1,
                key="bk", t1_cols=["balance"], t2_cols=["name"],
                fixed_cols=["country"], asof="2024-02-01", key_type="string",
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS scd_merge_guard_dim")


# --- scd2_snapshot (point-in-time read, round 6) ------------------------


def test_snapshot_before_history_is_empty(spark, dims):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_snapshot

    *_, dim1 = dims
    assert scd2_snapshot(dim1, "2023-12-31").count() == 0


def test_snapshot_between_loads_reconstructs_first_state(spark, dims):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_snapshot

    *_, dim1 = dims
    snap = {
        r["bk"]: (r["name"], r["balance"])
        for r in scd2_snapshot(dim1, "2024-01-15").collect()
    }
    # All four original keys in effect; b5 (born 2024-02-01) absent.
    assert set(snap) == {"b1", "b2", "b3", "b4"}
    # T2 attr shows the ORIGINAL version (gamma_renamed starts later) ...
    assert snap["b3"][0] == "gamma"
    # ... while the T1 overwrite rewrote history in place.
    assert snap["b2"][1] == 25.0


def test_snapshot_at_most_one_row_per_key_any_date(spark, dims):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_snapshot

    *_, dim1 = dims
    for d in ("2024-01-01", "2024-01-31", "2024-02-01", "2025-01-01"):
        dup = (
            scd2_snapshot(dim1, d)
            .groupBy("bk")
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        assert dup == 0, f"duplicate key in snapshot at {d}"


def test_snapshot_today_equals_current_rows(spark, dims):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_snapshot

    *_, dim1 = dims
    snap = scd2_snapshot(dim1, "2099-01-01").select("sk").collect()
    cur = dim1.where("is_current").select("sk").collect()
    assert sorted(r["sk"] for r in snap) == sorted(r["sk"] for r in cur)


def test_merge_execution_blocker_r6():
    """VERDICT r5 item 7 — attempt to EXECUTE scd2_merge_sql for real.

    Avenues tried this round (2026-08-14), all environment-blocked:
      1. `pip download delta-spark` — no package index reachable from
         the sandbox (offline), and no delta-* jars anywhere on disk,
         so Spark cannot load a MERGE-capable catalog.
      2. DuckDB as the executing engine — MERGE INTO landed in DuckDB
         1.4.0; the sandbox ships 1.0.0 (Parser Error on MERGE).
      3. Spark built-in v2 sources — parquet/orc tables do not
         implement SupportsRowLevelOperations, so Spark's own analyzer
         rejects MERGE on them (covered by
         test_merge_on_parquet_table_is_guarded).

    The validated-SQL ceiling (generation + Spark-parse + branch-route
    equivalence vs scd2_apply) therefore stands for the SQL STATEMENT;
    the EXECUTION shape a table format would give it is now implemented
    from first principles in sources/snaptable.py (bucket-level
    copy-on-write merge over a snapshot log, proven row-identical to
    scd2_apply in tests/test_snaptable.py). This test is a TRIPWIRE: if
    the sandbox ever gains delta-spark or DuckDB >= 1.4, it FAILS on
    purpose — the correct response is to execute the MERGE statement
    against the g1 oracle and delete this test.
    """
    import importlib.util

    assert importlib.util.find_spec("delta") is None, (
        "delta-spark is now importable — execute scd2_apply_merge for real "
        "against the g1 oracle and retire this tripwire"
    )
    import duckdb

    major, minor = (int(x) for x in duckdb.__version__.split(".")[:2])
    assert (major, minor) < (1, 4), (
        f"DuckDB {duckdb.__version__} supports MERGE INTO — execute the "
        "generated MERGE there against the g1 oracle and retire this tripwire"
    )


# --- point-in-time join (scd2_pointintime_join) --------------------------


@pytest.fixture(scope="module")
def pit(spark, dims):
    """Probes straddling every boundary of the two-load dimension:
    before the first version, on both load dates, between them, and on
    a key that never existed."""
    _, _, _, dim1 = dims
    probes = spark.createDataFrame(
        [
            (1, "b3", "2023-12-31"),  # before first version -> no match
            (2, "b3", "2024-01-01"),  # first day of the closed version
            (3, "b3", "2024-01-31"),  # inside the closed version
            (4, "b3", "2024-02-01"),  # boundary day -> NEW version (half-open)
            (5, "b3", "2024-12-01"),  # open current version
            (6, "b2", "2024-01-15"),  # T1 key: rewritten balance even pre-load
            (7, "b5", "2024-01-15"),  # new key, probe before its birth
            (8, "b5", "2024-02-01"),  # new key, birth day
            (9, "zz", "2024-06-01"),  # key never in the dimension
        ],
        ["probe_id", "bk", "d"],
    ).select("probe_id", "bk", F.col("d").cast("date").alias("d"))
    return dim1, probes


def _pit_rows(dim1, probes, **kw):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import (
        scd2_pointintime_join,
    )

    out = scd2_pointintime_join(probes, dim1, key="bk", fact_date_col="d", **kw)
    return {
        r["probe_id"]: (r["name"], r["balance"], r["is_current"])
        for r in out.collect()
    }


@pytest.mark.parametrize("broadcastable", [True, False])
def test_pointintime_boundary_semantics(pit, broadcastable):
    dim1, probes = pit
    got = _pit_rows(dim1, probes, dim_broadcastable=broadcastable)
    assert set(got) == {2, 3, 4, 5, 6, 8}  # 1, 7, 9 drop out (inner)
    assert got[2] == ("gamma", 30.0, False)          # closed version, day 1
    assert got[3] == ("gamma", 30.0, False)
    assert got[4] == ("gamma_renamed", 30.0, True)   # half-open boundary
    assert got[5] == ("gamma_renamed", 30.0, True)
    assert got[6] == ("beta", 25.0, True)            # T1 rewrote history
    assert got[8] == ("epsilon", 50.0, True)


@pytest.mark.parametrize("broadcastable", [True, False])
def test_pointintime_left_keeps_unmatched(pit, broadcastable):
    dim1, probes = pit
    got = _pit_rows(dim1, probes, how="left", dim_broadcastable=broadcastable)
    assert set(got) == set(range(1, 10))
    for pid in (1, 7, 9):
        assert got[pid] == (None, None, None)


def test_pointintime_paths_agree(pit):
    """Broadcast and union+window shapes are the same operator: their
    full outputs must match row-for-row on every column both emit."""
    dim1, probes = pit
    a = _pit_rows(dim1, probes, dim_broadcastable=True)
    b = _pit_rows(dim1, probes, dim_broadcastable=False)
    assert a == b


def test_pointintime_rejects_bad_how(pit):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import (
        scd2_pointintime_join,
    )

    dim1, probes = pit
    with pytest.raises(ValueError, match="inner/left"):
        scd2_pointintime_join(probes, dim1, key="bk", fact_date_col="d", how="anti")


# --- SCD Type 3 (scd3_apply) ---------------------------------------------


def test_scd3_two_applies(spark):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd3_apply

    dim0 = spark.createDataFrame(
        [("b1", "alpha", None), ("b2", "beta", None), ("b3", "gamma", None)],
        "bk string, name string, prev_name string",
    )
    s1 = spark.createDataFrame(
        [("b1", "alpha2"), ("b2", "beta")], ["bk", "name"]
    )
    dim1 = scd3_apply(dim0, s1, key="bk", tracked_cols=["name"])
    got1 = {r["bk"]: (r["name"], r["prev_name"]) for r in dim1.collect()}
    assert got1 == {
        "b1": ("alpha2", "alpha"),   # changed: old value -> prev
        "b2": ("beta", None),        # unchanged: prev stays NULL
        "b3": ("gamma", None),       # absent from staging: untouched
    }

    s2 = spark.createDataFrame(
        [("b1", "alpha2"), ("b2", "beta9"), ("b4", "delta")], ["bk", "name"]
    )
    dim2 = scd3_apply(dim1, s2, key="bk", tracked_cols=["name"])
    got2 = {r["bk"]: (r["name"], r["prev_name"]) for r in dim2.collect()}
    assert got2 == {
        "b1": ("alpha2", "alpha"),   # unchanged: EXISTING prev survives
        "b2": ("beta9", "beta"),     # changed on 2nd load
        "b3": ("gamma", None),       # still untouched
        "b4": ("delta", None),       # brand-new key: NULL prev
    }


# ------------------------------------------------------------- bitemporal


_BT_KW = dict(
    key="bk", t1_cols=["balance"], t2_cols=["name"], fixed_cols=["country"]
)


@pytest.fixture(scope="module")
def bitemporal(spark):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import (
        bitemporal_apply,
        bitemporal_init,
    )

    s0 = spark.createDataFrame(ROWS0, COLS)
    s1 = spark.createDataFrame(ROWS1, COLS)
    bt0 = bitemporal_init(s0, "bk", COLS[1:], asof="2024-01-01")
    bt1 = bitemporal_apply(bt0, s1, asof="2024-02-01", **_BT_KW)
    return bt0, bt1


def _at(dim, tx, valid):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import bitemporal_at

    return bitemporal_at(
        dim, F.lit(tx).cast("date"), F.lit(valid).cast("date")
    )


def test_bitemporal_point_unique_per_key(spark, bitemporal):
    _, bt1 = bitemporal
    for tx in ("2024-01-15", "2024-02-15"):
        for valid in ("2024-01-15", "2024-02-15"):
            per_key = (
                _at(bt1, tx, valid).groupBy("bk").count().collect()
            )
            assert all(r["count"] == 1 for r in per_key), (tx, valid)


def test_bitemporal_reproduces_pre_load_report(spark, bitemporal):
    bt0, bt1 = bitemporal
    # as KNOWN in January, the world (any valid date) is exactly bt0
    before = {
        (r["bk"], r["name"], r["balance"])
        for r in _at(bt0, "2024-01-15", "2024-01-15").collect()
    }
    after = {
        (r["bk"], r["name"], r["balance"])
        for r in _at(bt1, "2024-01-15", "2024-01-15").collect()
    }
    assert after == before  # the Feb load did not rewrite Jan knowledge


def test_bitemporal_t1_is_retroactive_t2_is_not(spark, bitemporal):
    _, bt1 = bitemporal
    # known in Feb, effective in Jan: T1 balance corrected BACK in time,
    # T2 name shows the OLD version (the rename only holds from Feb)
    jan_as_known_feb = {
        r["bk"]: r for r in _at(bt1, "2024-02-15", "2024-01-15").collect()
    }
    assert jan_as_known_feb["b2"]["balance"] == 25.0  # retroactive T1
    assert jan_as_known_feb["b3"]["name"] == "gamma"  # T2 not retroactive
    assert "b5" not in jan_as_known_feb  # new key not valid in Jan
    # known in Feb, effective in Feb: current state
    feb = {r["bk"]: r for r in _at(bt1, "2024-02-15", "2024-02-15").collect()}
    assert feb["b3"]["name"] == "gamma_renamed"
    assert feb["b5"]["balance"] == 50.0
    assert feb["b4"]["name"] == "delta"  # absent from staging: untouched


def test_bitemporal_reapply_is_noop_on_points(spark, bitemporal):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import (
        bitemporal_apply,
    )

    _, bt1 = bitemporal
    s1 = spark.createDataFrame(ROWS1, COLS)
    bt2 = bitemporal_apply(bt1, s1, asof="2024-03-01", **_BT_KW)
    # every point query gives the same answer (row-identity is not
    # required; point-semantics identity is the bitemporal contract)
    for tx, valid in (("2024-02-15", "2024-02-15"), ("2024-03-15", "2024-03-15")):
        a = {
            (r["bk"], r["name"], r["balance"])
            for r in _at(bt1, tx, valid).collect()
        }
        b = {
            (r["bk"], r["name"], r["balance"])
            for r in _at(bt2, tx, valid).collect()
        }
        assert a == b, (tx, valid)


# ------------------------------------------------------------- compaction


def test_compaction_preserves_point_in_time(spark, dims):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import (
        scd2_compact,
        scd2_snapshot,
    )

    _, _, _, dim1 = dims
    # churn: close every current row on 03-01 and re-insert verbatim
    churn = F.lit("2024-03-01").cast("date")
    cur = dim1.filter(F.col("is_current"))
    refresh = (
        dim1.filter(~F.col("is_current"))
        .unionByName(
            cur.withColumn("end_date", churn).withColumn(
                "is_current", F.lit(False)
            )
        )
        .unionByName(
            cur.withColumn("sk", F.col("sk") + 1000)
            .withColumn("start_date", churn)
            .withColumn("end_date", F.lit(None).cast("date"))
        )
    )
    compacted = scd2_compact(
        refresh, key="bk", attr_cols=["name", "balance", "country"]
    )
    # snapshots agree with the PRE-churn dim on every probe date,
    # including one inside the churned interval
    for d in ("2024-01-15", "2024-02-15", "2024-03-15"):
        a = {
            tuple(r)
            for r in scd2_snapshot(dim1, d)
            .select("bk", "name", "balance", "country")
            .collect()
        }
        b = {
            tuple(r)
            for r in scd2_snapshot(compacted, d)
            .select("bk", "name", "balance", "country")
            .collect()
        }
        assert a == b, d
    # and the churn is fully merged out: same row count as dim1
    assert compacted.count() == dim1.count()


def test_compaction_is_idempotent_and_keeps_true_boundaries(spark, dims):
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_compact

    _, _, _, dim1 = dims
    once = scd2_compact(dim1, key="bk", attr_cols=["name", "balance", "country"])
    twice = scd2_compact(once, key="bk", attr_cols=["name", "balance", "country"])
    rows1 = {tuple(r) for r in once.collect()}
    rows2 = {tuple(r) for r in twice.collect()}
    assert rows1 == rows2
    # b3's T2 boundary (gamma -> gamma_renamed) must survive: 2 versions
    b3 = [r for r in rows1 if r[1] == "b3"]
    assert len(b3) == 2


def test_scd6_project_current_on_every_version(spark):
    """SCD6: every historical row of a key carries the key's current
    tracked value; rows of keys with one version see their own value;
    the projection adds no rows and no join."""
    from etl_pipline_ibrd_loan_system_spark.operators.scd import scd6_project
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [
            (1, 10, "alpha_v1", "2024-01-01", "2024-06-01", False),
            (2, 10, "alpha_v2", "2024-06-01", None, True),
            (3, 20, "beta", "2024-01-01", None, True),
        ],
        "sk long, k long, name string, start_date string, "
        "end_date string, is_current boolean",
    )
    out = scd6_project(dim, key="k", t2_cols=["name"])
    rows = {r.sk: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[1].current_name == "alpha_v2"  # history row, current label
    assert rows[2].current_name == "alpha_v2"
    assert rows[3].current_name == "beta"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
