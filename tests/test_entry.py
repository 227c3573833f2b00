"""Driver-contract smoke tests: entry() runs, every query runs at sf0.001,
every oracle key has a matching query, column names line up with the SQL."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


def test_all_queries_run_sf0001(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
        assert len(df.columns) == len(set(df.columns)), f"{name}: dup columns"


def test_aliases_match_oracle_sql(spark, sf_dir):
    """Spark result columns must all appear in the oracle SQL text (driver
    sorts columns by name before hashing)."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name, sql in oracles.items():
        cols = qs[name](spark, sf_dir).columns
        sql_low = sql.lower()
        for c in cols:
            assert re.search(rf"\b{re.escape(c.lower())}\b", sql_low), (
                f"{name}: column {c} not present in oracle SQL"
            )


def test_driver_window_is_fully_pinned():
    """The driver checks the FIRST 50 registry entries. DRIVER_PRIORITY
    pins all 50 explicitly; every name must resolve, with no dupes —
    a new query registration must land beyond the window, never shift it."""
    from etl_pipline_ibrd_loan_system_spark.queries import DRIVER_PRIORITY

    qs = entrymod.queries()
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    missing = [n for n in DRIVER_PRIORITY if n not in qs]
    assert not missing, f"DRIVER_PRIORITY names not in registry: {missing}"
    assert list(qs)[:50] == list(DRIVER_PRIORITY)


def test_rows_only_declarations_resolve():
    from etl_pipline_ibrd_loan_system_spark.queries import ROWS_ONLY

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert ROWS_ONLY <= set(qs)
    # every registered query has an oracle unless declared rows-only
    assert set(qs) - set(oracles) <= ROWS_ONLY


def test_rotation_plan_covers_and_window_is_current():
    """Staleness lint (VERDICT r6 item 8): every registered query is
    driver-checked or scheduled; every planned window is legal; the
    active window is the earliest plan round still owed driver rows."""
    from etl_pipline_ibrd_loan_system_spark.queries import rotation_lint

    entrymod.queries()  # ensure registry populated
    assert rotation_lint() == []


def test_derive_active_window_counts_only_green_rows(tmp_path):
    """VERDICT r8 item 2: the active window derives from the newest
    CORRECTNESS files — no hand rotation. A red driver row must never
    retire a query (VERDICT r7 item 2). Synthesize a repo root whose
    CORRECTNESS file covers every registered query except one
    ROTATION_PLAN[10] name: the derived window is round 10. A RED row
    for a round-9 query pulls the window back to 9 (red != covered).
    All-green: the window settles on the LAST plan round, padded to 50
    for re-verification."""
    import json

    from etl_pipline_ibrd_loan_system_spark.queries import (
        ROTATION_PLAN,
        derive_active_window,
    )

    qs = entrymod.queries()
    green = {n: {"rows_match": True, "schema_match": True, "hash_match": True}
             for n in qs}
    hole = ROTATION_PLAN[10][0]
    del green[hole]  # round 10 still owed one row
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps(green))
    w10 = ROTATION_PLAN[10]
    derived = derive_active_window(str(tmp_path))
    assert derived[: len(w10[:50])] == w10[:50]
    assert len(derived) == 50 and len(set(derived)) == 50

    # one round-9 query goes RED: round 9 is pending again
    green[ROTATION_PLAN[9][0]] = {
        "rows_match": True, "schema_match": True, "hash_match": False
    }
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps(green))
    w9 = ROTATION_PLAN[9][:50]
    assert derive_active_window(str(tmp_path))[: len(w9)] == w9

    # everything green: last window, padded to the full 50-slot gate
    green[ROTATION_PLAN[9][0]]["hash_match"] = True
    green[hole] = {"rows_match": True, "schema_match": True,
                   "hash_match": True}
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps(green))
    last = ROTATION_PLAN[max(ROTATION_PLAN)]
    derived = derive_active_window(str(tmp_path))
    assert len(derived) == 50
    assert derived[: len(last)] == last
    assert len(set(derived)) == 50


def test_rotation_lint_flags_numbering_collisions(monkeypatch):
    """rotation_lint rule 4 (r11, generalizing the judge's dq17
    finding): two registered names sharing a numbering code (`tx17_...`
    twice) must fail the lint — ledger greps key on the code, so a
    collision silently mis-credits driver rows. Letter-suffix variants
    (dd3 vs dd3b) are distinct codes and stay legal."""
    import etl_pipline_ibrd_loan_system_spark.queries as q

    entrymod.queries()  # populate
    assert q.rotation_lint() == []  # live registry is collision-free
    fake = dict(q.QUERIES)
    fake["tx1_shadow_duplicate"] = fake[next(iter(fake))]
    monkeypatch.setattr(q, "QUERIES", fake)
    probs = q.rotation_lint()
    assert any("numbering collision on 'tx1'" in p for p in probs)
    # letter-suffix variants are NOT collisions
    assert not any("'dd3'" in p for p in probs)
