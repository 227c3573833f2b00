"""Cross-metric consistency laws of the composed metrics mart — the
identities four independent pipelines can silently violate when one
drifts (the value-level checks live in e27/m19/m20/e28's oracle rows)."""

from __future__ import annotations

import pytest

from etl_pipline_ibrd_loan_system_spark.plans.metrics_pipeline import (
    activity_grain,
    build_metrics_mart,
)


@pytest.fixture(scope="module")
def mart(spark, sf_dir):
    return build_metrics_mart(spark, sf_dir)


def test_dau_decomposes_into_growth_classes(spark, sf_dir, mart):
    eng = {r["day"]: r for r in mart["engagement"].collect()}
    gro = {r["day"]: r for r in mart["growth"].collect()}
    assert eng
    for day, e in eng.items():
        g = gro[day]
        assert (
            g["new_users"] + g["retained"] + g["resurrected"] == e["dau"]
        ), day
        assert e["wau"] >= e["dau"]


def test_streak_mass_equals_grain(spark, sf_dir, mart):
    # every active user-day belongs to exactly one streak: the sum of
    # all streak lengths (recomputed from the grain) equals |grain|
    ud = activity_grain(spark, sf_dir)
    n_grain = ud.count()
    n_users = ud.select("user_id").distinct().count()
    streaks = mart["streaks"].collect()
    assert len(streaks) == n_users
    for r in streaks:
        assert 1 <= r["current_streak"] <= r["longest_streak"]


def test_survival_base_accounts_every_user(spark, sf_dir, mart):
    ud = activity_grain(spark, sf_dir)
    n_users = ud.select("user_id").distinct().count()
    base = mart["survival_base"].collect()
    assert len(base) == n_users
    # exactly the max-tenure users on the cutoff day are censored
    assert any(not r["churned_observed"] for r in base)


def test_churn_mass_equals_user_episodes(spark, sf_dir, mart):
    # every user churns once per activity episode (streak): total
    # churned across all days == total number of streaks
    gro = mart["growth"].collect()
    total_churned = sum(r["churned"] for r in gro)
    ud = activity_grain(spark, sf_dir)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("day")
    n_streaks = (
        ud.select(
            "user_id",
            F.date_sub(F.col("day"), F.row_number().over(w)).alias("grp"),
        )
        .select("user_id", "grp")
        .distinct()
        .count()
    )
    assert total_churned == n_streaks


def test_amortization_schedule_ledger_invariants(spark, sf_dir):
    """Per loan: principal portions sum EXACTLY to the principal, the
    balance reaches zero, interest strictly follows the declining
    balance (non-increasing), and payment = principal + interest."""
    import __spark_entry__ as entry

    rows = entry.queries()["m27_amortization_schedule"](spark, sf_dir).collect()
    by_loan = {}
    for r in rows:
        by_loan.setdefault(r.loan_id, []).append(r)
    assert by_loan
    for loan_id, sched in by_loan.items():
        sched.sort(key=lambda r: r.period)
        assert [r.period for r in sched] == list(range(1, 13))
        principal = sum(r.principal_due_cents for r in sched)
        # closed form: balance after period 1 = P - P div 12
        assert sched[0].balance_after_cents == principal - principal // 12
        assert sched[-1].balance_after_cents == 0
        ints = [r.interest_cents for r in sched]
        assert all(a >= b for a, b in zip(ints, ints[1:]))
        for r in sched:
            assert r.payment_cents == r.principal_due_cents + r.interest_cents


def test_loan_npv_consistent_with_schedule_and_python_replay(spark, sf_dir):
    """m28 invariants: total_payment equals m27's per-loan payment sum
    (the two queries share one closed form), NPV < total payment
    (positive rate), discount_loss is their exact difference, and an
    independent Python integer replay reproduces every NPV bit-for-bit."""
    import __spark_entry__ as entry

    sched = entry.queries()["m27_amortization_schedule"](spark, sf_dir).collect()
    pay = {}
    for r in sched:
        pay.setdefault(r.loan_id, {})[r.period] = r.payment_cents

    disc = [(10**9 * 200**t) // (201**t) for t in range(1, 13)]
    rows = entry.queries()["m28_loan_npv"](spark, sf_dir).collect()
    assert rows and len(rows) == len(pay)
    for r in rows:
        per = pay[r.loan_id]
        assert r.total_payment_cents == sum(per.values())
        expect_npv = sum(
            (per[t] * disc[t - 1]) // 10**9 for t in range(1, 13)
        )
        assert r.npv_cents == expect_npv
        assert r.npv_cents < r.total_payment_cents
        assert r.discount_loss_cents == r.total_payment_cents - r.npv_cents


def test_vintage_curves_monotone_and_complete(spark, sf_dir):
    """Per vintage: the cumulative repaid cents are strictly
    non-decreasing down the age axis, the final fraction is exactly
    1.0 (every vintage fully repays within the data horizon), and the
    per-age repaid cents re-sum to the cumulative."""
    import __spark_entry__ as entry

    rows = entry.queries()["m29_vintage_curves"](spark, sf_dir).collect()
    by_v: dict[str, list] = {}
    for r in rows:
        by_v.setdefault(r.vintage, []).append(r)
    assert by_v
    for v, curve in by_v.items():
        curve.sort(key=lambda r: r.age_months)
        run = 0
        prev = -1
        for r in curve:
            run += r.repaid_cents
            assert r.cum_repaid_cents == run, (v, r.age_months)
            assert r.cum_repaid_cents >= prev
            prev = r.cum_repaid_cents
        assert curve[-1].repaid_frac == 1.0, v
