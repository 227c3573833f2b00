"""Unit semantics of operators/reconcile.py beyond the c7/c8/c9
oracles: null-safe diff classification, all-null survivorship, and
inferred-member completeness/flagging."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.operators.reconcile import (
    golden_record,
    infer_members,
    snapshot_diff,
)


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k int, name string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 21), (3, "c", None), (5, "e", 50)],
        "k int, name string, v int",
    )
    rows = {
        r.k: r for r in snapshot_diff(old, new, ["k"], ["name", "v"]).collect()
    }
    # k=1 unchanged, k=3 unchanged with a NULL (null-safe equality) -> absent
    assert set(rows) == {2, 4, 5}
    assert rows[2].change_kind == "changed"
    assert rows[2].changed_cols == "name,v"
    assert rows[4].change_kind == "removed" and rows[4].changed_cols == ""
    assert rows[5].change_kind == "added" and rows[5].changed_cols == ""


def test_snapshot_diff_null_transitions_are_changes(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "k int, v string")
    rows = {r.k: r for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert rows[1].changed_cols == "v"
    assert rows[2].changed_cols == "v"


def test_golden_record_latest_non_null_wins(spark):
    rec = spark.createDataFrame(
        [
            (1, 10, "old", None),
            (1, 20, None, 5.0),   # newest phone-less record
            (2, 30, None, None),  # all-null attributes
        ],
        "k int, seq int, name string, score double",
    )
    out = {r.k: r for r in golden_record(rec, ["k"], "seq", ["name", "score"]).collect()}
    assert out[1].name == "old"      # null at seq 20 does NOT erase seq 10
    assert out[1].score == 5.0
    assert out[1].n_records == 2 and out[1].last_seq == 20
    assert out[2].name is None and out[2].score is None
    assert out[2].last_seq == 30


def test_infer_members_flags_and_covers_every_fact_key(spark):
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "id int, name string")
    facts = spark.createDataFrame([(1,), (3,), (3,), (4,)], "fid int")
    out = infer_members(
        dim, facts, "id", "fid", {"name": F.lit("INFERRED")}
    )
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert not rows[1].inferred and not rows[2].inferred
    assert rows[3].inferred and rows[3].name == "INFERRED"
    assert rows[4].inferred
    # every fact key now resolves
    assert facts.join(out, facts.fid == out.id, "left_anti").count() == 0


def test_infer_members_requires_full_placeholders(spark):
    dim = spark.createDataFrame([(1, "x", 2)], "id int, name string, v int")
    facts = spark.createDataFrame([(9,)], "fid int")
    import pytest

    with pytest.raises(ValueError, match="placeholders missing"):
        infer_members(dim, facts, "id", "fid", {"name": F.lit("p")})


def test_diff_apply_round_trip(spark):
    """old + diff(old, new) == new, exactly — the applicable-delta
    contract (include_values)."""
    from etl_pipline_ibrd_loan_system_spark.operators.reconcile import (
        apply_snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (None, "nullkey", 0)],
        "k int, name string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 2), (4, "d", 40), (None, "nullkey2", 0)],
        "k int, name string, v int",
    )
    delta = snapshot_diff(old, new, ["k"], ["name", "v"], include_values=True)
    rebuilt = apply_snapshot_diff(old, delta, ["k"], ["name", "v"])
    assert sorted(map(repr, rebuilt.collect())) == sorted(map(repr, new.collect()))


def test_diff_null_key_rows_classified_by_presence_marker(spark):
    """A row whose KEY is null is still 'present' — the presence marker
    (not key-null-ness) drives added/removed classification."""
    old = spark.createDataFrame([(None, "x")], "k int, v string")
    new = spark.createDataFrame([(None, "y")], "k int, v string")
    rows = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert len(rows) == 1
    assert rows[0].change_kind == "changed"
    assert rows[0].changed_cols == "v"


# ------------------------------------------------------------- linkage


def test_multi_pass_candidates_union_and_dedup(spark):
    from etl_pipline_ibrd_loan_system_spark.operators import linkage

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "lid long, k1 string, k2 long"
    )
    right = spark.createDataFrame(
        [(7, "a", 99), (8, "z", 20), (9, "a", 20)],
        "rid long, k1 string, k2 long",
    )
    pairs = {
        (r["lid"], r["rid"])
        for r in linkage.multi_pass_candidates(
            left, right, "lid", "rid",
            passes=[[("k1", "k1")], [("k2", "k2")]],
        ).collect()
    }
    # pass A (k1): (1,7), (1,9); pass B (k2): (2,8), (2,9); no dupes
    assert pairs == {(1, 7), (1, 9), (2, 8), (2, 9)}


def test_multi_pass_candidates_self_lineage(spark):
    # dirty extract derived FROM the clean frame (shared lineage) must
    # not trip Spark's ambiguous-self-join analyzer
    from etl_pipline_ibrd_loan_system_spark.operators import linkage

    clean = spark.createDataFrame(
        [(1, "x"), (2, "y")], "cid long, k string"
    )
    dirty = clean.select(F.col("cid").alias("did"), "k")
    pairs = {
        (r["did"], r["cid"])
        for r in linkage.multi_pass_candidates(
            dirty, clean, "did", "cid", passes=[[("k", "k")]]
        ).collect()
    }
    assert pairs == {(1, 1), (2, 2)}


def test_score_pairs_thresholds(spark):
    from etl_pipline_ibrd_loan_system_spark.operators import linkage

    pairs = spark.createDataFrame(
        [(1, True, True), (2, True, False), (3, False, False)],
        "pid long, a boolean, b boolean",
    )
    out = {
        r["pid"]: r
        for r in linkage.score_pairs(
            pairs,
            comparisons=[(F.col("a"), 30, -10), (F.col("b"), 20, -20)],
            match_threshold=50,
            possible_threshold=0,
        ).collect()
    }
    assert out[1]["score"] == 50 and out[1]["classification"] == "match"
    assert out[2]["score"] == 10 and out[2]["classification"] == "possible"
    assert out[3]["score"] == -30 and out[3]["classification"] == "non_match"


def test_fit_fs_weights_matches_hand_math_and_signs():
    """fit_fs_weights reproduces the smoothed log-likelihood weights to
    the micro-nat on a hand example, and an informative field gets a
    positive agreement / negative disagreement weight."""
    import math

    from etl_pipline_ibrd_loan_system_spark.operators import linkage

    # 10 true pairs (9 agree on name), 100 false pairs (5 agree)
    w = linkage.fit_fs_weights({"name": (9, 5)}, n_true=10, n_false=100)
    wa, wd = w["name"]
    m_num, m_den = (9 + 1) * (100 + 2), (10 + 2) * (5 + 1)
    assert wa == round(1_000_000 * math.log(m_num / m_den))
    d_num, d_den = (10 - 9 + 1) * (100 + 2), (10 + 2) * (100 - 5 + 1)
    assert wd == round(1_000_000 * math.log(d_num / d_den))
    assert wa > 0 > wd

    # perfectly-separating field: smoothing keeps both logs finite
    w2 = linkage.fit_fs_weights({"f": (10, 0)}, n_true=10, n_false=100)
    assert w2["f"][0] > wa  # cleaner evidence -> bigger weight
    assert math.isfinite(w2["f"][1])


def test_er2b_tight_fit_never_rejects_true_pairs_and_cuts_fps(spark, sf_dir):
    """The tight-blocked fit must never classify a true pair below
    'possible' (the two-field passes are recall-complete over the
    planted defects and positive evidence keeps the LLR >= 0), and
    must produce no more false-positive matches than the loose fit.
    At match grade specifically the guarantee is NOT scale-invariant:
    on a tiny universe the smoothed u-estimates dampen the weights and
    partial-agreement true pairs land in the clerical-review zone —
    at sf0.01 all 300 true pairs reach 'match' with FPs 34 -> 6."""
    import __spark_entry__ as entry

    def confusion(name):
        return {
            (r.classification, r.is_true_pair): r.n_pairs
            for r in entry.queries()[name](spark, sf_dir).collect()
        }

    loose = confusion("er2_fellegi_sunter_fit")
    tight = confusion("er2b_fs_fit_tight")
    n_true = sum(v for (c, t), v in loose.items() if t)
    kept = tight.get(("match", True), 0) + tight.get(("possible", True), 0)
    assert kept == n_true
    assert ("non_match", True) not in tight
    assert tight.get(("match", False), 0) <= loose.get(("match", False), 0)
