"""Semantics pins for the round-9 loan/product measures (m30/m31/m32):
crafted micro-fixtures where the correct answer is hand-checkable —
the oracle parity lives in selfcheck; these pin the SEMANTICS."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )


def test_m31_day_count_conventions(spark):
    """30/360 US bond basis vs ACT: month-end and cross-year cases.
    Jan 15 -> Mar 15: ACT = 59 (16 left in Jan + 28 Feb + 15 Mar,
    non-leap), 30/360 = 60.
    Jan 31 -> Feb 28 2023: ACT = 28; 30/360 = 30*1 + (28 - 30) = 28.
    Dec 30 2023 -> Jan 2 2024: ACT = 3; 30/360 = 360 - 330 + 2 - 30 = 2."""
    cases = [
        (dt.date(2023, 1, 15), dt.date(2023, 3, 15), 59, 60),
        (dt.date(2023, 1, 31), dt.date(2023, 2, 28), 28, 28),
        (dt.date(2023, 12, 30), dt.date(2024, 1, 2), 3, 2),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _, _ in cases], "draw_date date, settle_date date"
    )
    act = F.datediff("settle_date", "draw_date").cast("bigint")
    d360 = (
        (F.year("settle_date") - F.year("draw_date")) * 360
        + (F.month("settle_date") - F.month("draw_date")) * 30
        + (
            F.least(F.dayofmonth("settle_date"), F.lit(30))
            - F.least(F.dayofmonth("draw_date"), F.lit(30))
        )
    ).cast("bigint")
    got = df.select(act.alias("act"), d360.alias("d360")).collect()
    # recompute expected ACT with python for the first case (Jan 15->Mar 15
    # 2023 is 59 days: 16 left in Jan + 28 Feb + 15 Mar)
    for row, (a, b, exp_act, exp_360) in zip(
        sorted(got, key=lambda r: r.act),
        sorted(cases, key=lambda c: (c[1] - c[0]).days),
    ):
        assert row.act == (b - a).days == exp_act
        assert row.d360 == exp_360


def test_m31_interest_is_truncating_integer(spark, sf_dir):
    """interest = p * bp * days div basis, never a float: re-derive one
    row by hand from the query output."""
    from etl_pipline_ibrd_loan_system_spark.queries import load_registry

    qs, _ = load_registry()
    row = (
        qs["m31_interest_accrual"](spark, sf_dir)
        .orderBy("loan_id")
        .limit(1)
        .collect()[0]
    )
    assert row.interest_act365_cents == (
        row.principal_cents * 425 * row.act_days
    ) // 3650000
    assert row.interest_30_360_cents == (
        row.principal_cents * 425 * row.d360_days
    ) // 3600000
    assert row.basis_diff_cents == (
        row.interest_act365_cents - row.interest_30_360_cents
    )


def test_m30_gap_days_do_not_roll(spark):
    """user 1: active day1(light: 1 ev), day2(mid: 2 ev), day4(heavy:
    4 ev) — only day1->day2 is a roll (day2->day4 gapped out); rate is
    exact micro units."""
    ts = lambda d, h: dt.datetime(2024, 1, d, h, 0, 0)  # noqa: E731
    rows = (
        [(1, ts(1, 1), 1, "view", 0.0, "{}")]
        + [(10 + i, ts(2, 1 + i), 1, "view", 0.0, "{}") for i in range(2)]
        + [(20 + i, ts(4, 1 + i), 1, "view", 0.0, "{}") for i in range(4)]
    )
    ev = _events(spark, rows)
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    from pyspark.sql import Window as _W

    tiered = daily.select(
        "user_id", "d",
        F.when(F.col("n_ev") >= 4, "heavy")
        .when(F.col("n_ev") >= 2, "mid")
        .otherwise("light").alias("tier"),
    )
    w = _W.partitionBy("user_id").orderBy("d")
    trans = tiered.select(
        F.col("tier").alias("to_tier"), "d",
        F.lag("tier").over(w).alias("from_tier"),
        F.lag("d").over(w).alias("prev_d"),
    ).where(
        F.col("from_tier").isNotNull()
        & (F.col("d") == F.date_add(F.col("prev_d"), 1))
    )
    got = [(r.from_tier, r.to_tier) for r in trans.collect()]
    assert got == [("light", "mid")]


def test_m32_first_last_and_tiebreak(spark):
    """One purchase; touches at t-3 (view), t-2 (click), and TWO at
    t-1 with equal ts but different event_ids — first touch is the
    view, last touch is the higher event_id of the tied pair (click).
    A later touch AFTER the purchase never attributes."""
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    s = dt.timedelta
    # 12.34 -> 1233.99... -> 1234 on every engine; do NOT use a value
    # whose *100 lands exactly on .5 — Python round is half-even there
    # while Spark/DuckDB round half-away (they agree with each other,
    # which is the contract; Python is just the wrong referee)
    rows = [
        (100, t0, 7, "purchase", 12.34, "{}"),
        (1, t0 - s(minutes=3), 7, "view", 0.0, "{}"),
        (2, t0 - s(minutes=2), 7, "click", 0.0, "{}"),
        (3, t0 - s(minutes=1), 7, "view", 0.0, "{}"),
        (4, t0 - s(minutes=1), 7, "click", 0.0, "{}"),  # tied ts, higher id
        (5, t0 + s(minutes=1), 7, "click", 0.0, "{}"),  # after: excluded
    ]
    ev = _events(spark, rows)
    import duckdb

    # replay the registered implementation inline on the fixture
    from etl_pipline_ibrd_loan_system_spark.queries import (
        ORACLE,
        load_registry,
    )

    load_registry()
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    out = con.execute(ORACLE["m32_touch_attribution"]).fetchdf()
    by = {(r.model, r.channel): int(r.attributed_cents)
          for r in out.itertuples()}
    cents = 1234
    assert by == {
        ("first_touch", "view"): cents,
        ("last_touch", "click"): cents,
    }


def test_m34_cpr_annualizes_smm_with_twelfth_power(spark, sf_dir):
    """ADVICE r9 (high): the r9 square-multiply chain computed x^22,
    not the documented x^12, and the oracle SQL carried the identical
    error so the hash gate could not catch it. Pin CPR against Python
    pow for EVERY period, and pin the SMM denominator as net of
    scheduled principal (the industry base)."""
    from etl_pipline_ibrd_loan_system_spark.queries import load_registry

    qs, _ = load_registry()
    rows = qs["m34_prepayment_speed"](spark, sf_dir).collect()
    assert rows
    assert any(r.prepaid_cents > 0 for r in rows)  # fixture plants prepays
    for r in rows:
        smm = r.smm_micro / 1_000_000.0
        # chain vs pow differ only in last-ulp accumulation
        assert abs(r.cpr - (1.0 - (1.0 - smm) ** 12)) < 1e-12, r
        net = r.opening_cents - r.sched_prin_cents
        if net > 0:
            assert r.smm_micro == (r.prepaid_cents * 1_000_000) // net, r
        else:
            assert r.smm_micro == 0, r


def test_m35_wal_level_principal_is_six_and_a_half(spark, sf_dir):
    """Level principal over 12 periods has WAL = (1+...+12)/12 = 6.5
    months exactly (up to the period-12 residual cents); the actual
    series must be strictly shorter wherever prepays are planted."""
    from etl_pipline_ibrd_loan_system_spark.queries import load_registry

    qs, _ = load_registry()
    rows = qs["m35_weighted_average_life"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.wal_sched_micro - 6_500_000) < 2_000, r  # residual drift
        assert r.wal_actual_micro <= r.wal_sched_micro, r


def test_m36_ecl_per_loan_arithmetic(spark, sf_dir):
    """Coverage ratio re-derives from the exact per-stage PD x LGD:
    stage-1 rows must price at 150bp x 4500bp (67.5bp of EAD)."""
    from etl_pipline_ibrd_loan_system_spark.queries import load_registry

    qs, _ = load_registry()
    rows = qs["m36_ecl_staging"](spark, sf_dir).collect()
    stages = {r.stage for r in rows}
    assert stages == {1, 2, 3}
    for r in rows:
        bp = {1: 150, 2: 2200, 3: 10000}[r.stage]
        # sum of per-loan truncations <= untruncated product; within n_loans
        exact = r.ead_cents * bp * 4500 // 100_000_000
        assert exact - r.n_loans <= r.ecl_cents <= exact, r
        assert r.coverage_micro == r.ecl_cents * 1_000_000 // r.ead_cents, r


def test_m37_duration_matches_float_closed_form(spark, sf_dir):
    """The exact rational duration must agree with the float closed
    form sum(t*CF/1.005^t)/sum(CF/1.005^t) to < 1 micro-period, and
    decrease as the coupon rises (higher early cash flow -> shorter)."""
    from etl_pipline_ibrd_loan_system_spark.queries import load_registry

    qs, _ = load_registry()
    rows = sorted(
        qs["m37_macaulay_duration"](spark, sf_dir).collect(),
        key=lambda r: r.tier,
    )
    assert [r.tier for r in rows] == [0, 1, 2, 3]
    for r in rows:
        face = r.face_cents  # aggregate face acts like one big note
        bp = (r.tier + 1) * 100
        coupon = face * bp / 10_000
        num = den = 0.0
        for t in range(1, 7):
            cf = coupon + (face if t == 6 else 0)
            pv = cf / 1.005**t
            num += t * pv
            den += pv
        # aggregate-vs-sum-of-loans truncation keeps this within ~1e-3
        assert abs(r.macaulay_periods_micro / 1e6 - num / den) < 1e-3, r
        assert r.modified_periods_micro == (
            r.macaulay_periods_micro * 200 // 201
        ), r
    durs = [r.macaulay_periods_micro for r in rows]
    assert durs == sorted(durs, reverse=True)


def test_m38_waterfall_conservation(spark, sf_dir):
    """Collected == fees + interest + principal + overpay must hold as
    an exact integer identity per cohort, and shortfall loans exist in
    the fixture (collection ratio spans 0..12/10 of total due)."""
    from etl_pipline_ibrd_loan_system_spark.queries import load_registry

    qs, _ = load_registry()
    rows = qs["m38_payment_waterfall"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.collected_cents == (
            r.fees_cents + r.interest_cents + r.principal_cents
            + r.overpay_cents
        ), r
        assert 0 < r.n_shortfall < r.n_loans, r
        assert r.overpay_cents >= 0, r


def test_m39_effective_duration_agrees_with_m37_analytic(spark, sf_dir):
    """Model-validation law: effective duration from +/-100bp full
    revaluation must agree with m37's analytic modified duration to
    second order (the difference is the convexity term ~ C*dy^2, well
    under 2% here), and convexity must be positive for option-free
    cash flows."""
    from etl_pipline_ibrd_loan_system_spark.queries import load_registry

    qs, _ = load_registry()
    eff = {
        r.tier: r
        for r in qs["m39_rate_shock_revaluation"](spark, sf_dir).collect()
    }
    ana = {
        r.tier: r
        for r in qs["m37_macaulay_duration"](spark, sf_dir).collect()
    }
    assert set(eff) == set(ana) and eff
    for tier, r in eff.items():
        d_eff = r.eff_duration_periods_micro / 1e6
        d_mod = ana[tier].modified_periods_micro / 1e6
        assert abs(d_eff - d_mod) / d_mod < 0.02, (tier, d_eff, d_mod)
        assert r.eff_convexity_micro > 0, r
        assert r.pv_down_cents > r.pv_base_cents > r.pv_up_cents, r


def test_loan_grain_unscaled_measures_scoped_to_loan_fact():
    """LOAN_GRAIN_MEASURES_UNSCALED's rewrites (COUNT(pk) for COUNTD,
    cents/rate_k identities) are only valid over the loan-grain fact.
    Pin the wiring at source level: the ONLY module in the package that
    references the dict is measure_queries, and there it is passed a
    fact built by _loan_fact_unscaled (VERDICT r11 item 8 / ADVICE)."""
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "etl_pipline_ibrd_loan_system_spark",
    )
    users = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            text = open(path).read()
            if "LOAN_GRAIN_MEASURES_UNSCALED" in text:
                users.append((os.path.relpath(path, pkg), text))
    names = sorted(n for n, _ in users)
    assert names == ["functions/measures.py", "queries/measure_queries.py"], (
        f"LOAN_GRAIN_MEASURES_UNSCALED leaked to {names} — its rewrites "
        "assume loan-grain pk uniqueness and cents/rate_k exactness"
    )
    mq = dict(users)["queries/measure_queries.py"]
    # every dashboard_query call that selects the unscaled dict must take
    # its fact from _loan_fact_unscaled
    for m in re.finditer(r"dashboard_query\((.*?)\)", mq, re.S):
        body = m.group(1)
        if "LOAN_GRAIN_MEASURES_UNSCALED" in body:
            assert "fact" in body
    assert "_loan_fact_unscaled(" in mq
