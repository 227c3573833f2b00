"""BI measure-layer queries (SURVEY.md §2.D D2-D7, §3 entry point 4).

`orders` stands in for the loan fact; derived monetary columns are
decimal-space products so the oracle hashes identically. The query shape is
one Power BI visual: report-level year slicer -> groupBy(dim attr) ->
multiple named measures -> sort by measure desc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.measures import dashboard_query
from . import query

_FACT_SQL = """
    fact AS (
      SELECT o_orderkey AS pk_loan_number_sk,
             o_custkey AS fk_borrower,
             o_custkey % 100 AS fk_guarantor,
             o_orderstatus AS loan_status,
             year(o_orderdate) AS year,
             CAST(o_totalprice AS DECIMAL(12,2)) AS original_principal_amount,
             CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.8 AS DECIMAL(4,2)) AS disbursed_amount,
             CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.2 AS DECIMAL(4,2)) AS undisbursed_amount,
             CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(4,2)) AS repaid,
             CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.3 AS DECIMAL(4,2)) AS due,
             (o_orderkey % 80) / 10.0 AS interest_rate
      FROM orders
    )
"""


def _loan_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    principal = F.col("o_totalprice").cast("decimal(12,2)")
    return o.select(
        F.col("o_orderkey").alias("pk_loan_number_sk"),
        F.col("o_custkey").alias("fk_borrower"),
        (F.col("o_custkey") % 100).alias("fk_guarantor"),
        F.col("o_orderstatus").alias("loan_status"),
        F.year("o_orderdate").alias("year"),
        principal.alias("original_principal_amount"),
        (principal * F.lit(0.8).cast("decimal(4,2)")).alias("disbursed_amount"),
        (principal * F.lit(0.2).cast("decimal(4,2)")).alias("undisbursed_amount"),
        (principal * F.lit(0.5).cast("decimal(4,2)")).alias("repaid"),
        (principal * F.lit(0.3).cast("decimal(4,2)")).alias("due"),
        ((F.col("o_orderkey") % 80) / 10.0).alias("interest_rate"),
    )


def _loan_fact_unscaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The loan fact projected for LOAN_GRAIN_MEASURES_UNSCALED (optimization r11):
    one decimal cast per row yields `cents` (exact unscaled int64 of the
    principal), and `rate_k` carries the integer tenths behind
    interest_rate — every money measure in _loan_fact is an exact
    small-int multiple of these (see functions/measures.py
    LOAN_GRAIN_MEASURES_UNSCALED). Same rows, narrower types (§2.3)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("pk_loan_number_sk"),
        F.col("o_custkey").alias("fk_borrower"),
        (F.col("o_custkey") % 100).alias("fk_guarantor"),
        F.col("o_orderstatus").alias("loan_status"),
        F.year("o_orderdate").alias("year"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        (F.col("o_orderkey") % 80).alias("rate_k"),
    )


@query(
    "m6_dashboard_visual",
    sql=f"""
    WITH {_FACT_SQL}
    SELECT loan_status,
           COUNT(*) AS loans,
           COUNT(DISTINCT pk_loan_number_sk) AS number_of_loans,
           CAST(ROUND(SUM(original_principal_amount), 2) AS DOUBLE) AS loan_amount,
           CAST(ROUND(SUM(repaid), 2) AS DOUBLE) AS repaid,
           CAST(ROUND(SUM(due), 2) AS DOUBLE) AS due1,
           CAST(ROUND(SUM(disbursed_amount), 2) AS DOUBLE) AS disbursed_amount,
           CAST(ROUND(SUM(undisbursed_amount), 2) AS DOUBLE) AS undisbursed_amount,
           ROUND(CAST(SUM(CAST(interest_rate AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS average_interest_rate,
           CAST(ROUND(SUM(CAST(disbursed_amount AS DECIMAL(18,4)) * CAST(interest_rate / 100 AS DECIMAL(8,4))), 2) AS DOUBLE) AS interest_income,
           COUNT(DISTINCT fk_guarantor) AS guarantors,
           COUNT(DISTINCT fk_borrower) AS borrowers
    FROM fact
    WHERE year BETWEEN 1993 AND 1997
    GROUP BY loan_status
    """,
)
def m6_dashboard_visual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimization r11: same visual, measures evaluated through the
    unscaled-long twins (LOAN_GRAIN_MEASURES_UNSCALED over _loan_fact_unscaled) —
    per-row BigDecimal products and BigDecimal sum buffers become int64
    codegen arithmetic; the oracle SQL is unchanged and proves the
    doubles bit-identical."""
    from ..functions.measures import LOAN_GRAIN_MEASURES_UNSCALED

    fact = _loan_fact_unscaled(spark, sf_dir)
    out = dashboard_query(
        fact,
        group_by=["loan_status"],
        measures=[
            "loans", "number_of_loans", "loan_amount", "repaid", "due1",
            "disbursed_amount", "undisbursed_amount", "average_interest_rate",
            "interest_income", "guarantors", "borrowers",
        ],
        year_col="year",
        year_range=(1993, 1997),
        measure_defs=LOAN_GRAIN_MEASURES_UNSCALED,
    )
    return out


@query(
    "m7_incremental_rollup",
    sql="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def m7_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate: history and the new batch are
    folded into PARTIAL state independently and merged associatively —
    the oracle recomputes from the full table, proving
    merge(partial(old), partial(new)) == partial(all) bit-for-bit
    (operators.rollup; decimal-space sums make the identity exact).
    The refresh cost at 100 TB is the new partition + the rollup table,
    never history."""
    from ..operators.rollup import finalize_rollup, merge_rollups, partial_rollup

    events = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    history = events.where(F.col("ts") < cut)
    fresh = events.where(F.col("ts") >= cut)
    merged = merge_rollups(
        [
            partial_rollup(history, ["event_type"], "value"),
            partial_rollup(fresh, ["event_type"], "value"),
        ],
        ["event_type"],
    )
    return finalize_rollup(merged, ["event_type"])


@query(
    "m25_date_hierarchy_drill",
    sql="""
    WITH dated AS (
      SELECT year(o_orderdate) AS year,
             quarter(o_orderdate) AS quarter,
             month(o_orderdate) AS month,
             CAST(o_totalprice AS DECIMAL(12,2)) AS principal,
             CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(4,2))
               AS repaid_m
      FROM orders
      WHERE year(o_orderdate) BETWEEN 1993 AND 1997
    )
    SELECT year, quarter, month,
           CAST(GROUPING(year, quarter, month) AS BIGINT) AS gid,
           COUNT(*) AS loans,
           CAST(ROUND(SUM(principal), 2) AS DOUBLE) AS loan_amount,
           CAST(ROUND(SUM(repaid_m), 2) AS DOUBLE) AS repaid
    FROM dated
    GROUP BY ROLLUP(year, quarter, month)
    """,
)
def m25_date_hierarchy_drill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PBIX date-hierarchy drill below Year (VERDICT r7 "What's missing"
    #4): the dashboard line chart binds `DimDate.Date Hierarchy.Year`
    (`Loans Dashboard.pbix::Report/Layout`), and a PBIX date hierarchy
    implies Quarter/Month/Day levels — this is the Year > Quarter >
    Month drill of the same loan_amount/repaid measures (the m6 measure
    definitions), every level in ONE pass: rollup() compiles to a single
    Expand + hash aggregate, where a BI engine materializing each drill
    level separately would scan the fact three times. Day is omitted
    like the PBIX visual omits it (no visual binds below Month).

    Scale: one fact scan with the year filter pushed into it,
    Expand(4 grouping sets), one shuffle whose key space is bounded by
    the calendar (<= 60 months + subtotals), not the data."""
    from ..functions.exact import dsum

    orders = load_table(spark, sf_dir, "orders")
    principal = F.col("o_totalprice").cast("decimal(12,2)")
    dated = orders.where(
        F.year("o_orderdate").between(1993, 1997)
    ).select(
        F.year("o_orderdate").alias("year"),
        F.quarter("o_orderdate").alias("quarter"),
        F.month("o_orderdate").alias("month"),
        principal.alias("principal"),
        (principal * F.lit(0.5).cast("decimal(4,2)")).alias("repaid_m"),
    )
    return (
        dated.rollup("year", "quarter", "month")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("loans"),
            dsum("principal", "loan_amount", cast_to=None),
            dsum("repaid_m", "repaid", cast_to=None),
        )
        .select("year", "quarter", "month", "gid", "loans",
                "loan_amount", "repaid")
    )


# --- m27: level-principal amortization schedule ---------------------------
#
# The reference IS a loan system: IBRD loans amortize with LEVEL
# PRINCIPAL repayments (equal principal portions, interest on the
# declining balance) — which makes the whole schedule CLOSED-FORM in
# integer cents: no pow(), no recursion, one projection per (loan,
# period). Rate fixed at 450 bp annual -> 375 micro-units monthly;
# interest truncates to the cent exactly like a ledger.

_M27_RATE_MICRO = 3750      # 0.375% per period, in 1e-6 units
_M27_PERIODS = 12


@query(
    "m27_amortization_schedule",
    sql=f"""
    WITH loans AS (
      SELECT o_orderkey AS loan_id,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS principal_cents
      FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT loan_id, period,
           CASE WHEN period < {_M27_PERIODS}
                THEN principal_cents // {_M27_PERIODS}
                ELSE principal_cents
                     - {_M27_PERIODS - 1} * (principal_cents // {_M27_PERIODS})
           END AS principal_due_cents,
           ((principal_cents - (period - 1) * (principal_cents // {_M27_PERIODS}))
             * {_M27_RATE_MICRO}) // 1000000 AS interest_cents,
           CASE WHEN period < {_M27_PERIODS}
                THEN principal_cents // {_M27_PERIODS}
                ELSE principal_cents
                     - {_M27_PERIODS - 1} * (principal_cents // {_M27_PERIODS})
           END
           + ((principal_cents - (period - 1) * (principal_cents // {_M27_PERIODS}))
              * {_M27_RATE_MICRO}) // 1000000 AS payment_cents,
           CASE WHEN period < {_M27_PERIODS}
                THEN principal_cents - period * (principal_cents // {_M27_PERIODS})
                ELSE 0 END AS balance_after_cents
    FROM loans, unnest(range(1, {_M27_PERIODS + 1})) AS t(period)
    """,
)
def m27_amortization_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-principal amortization schedule (the IBRD repayment form:
    equal principal portions, interest on the declining balance) for a
    1% sample of orders standing in as loans. All arithmetic is integer
    cents with ledger truncation — the declining balance is closed-form
    (P - (t-1) * P div 12), so the 12-row schedule is a pure projection
    per loan: no recursion, no window, no shuffle beyond the scan. The
    double -> DECIMAL(12,2) cast is the dq3 cent-quantization contract,
    identical on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    n, r = _M27_PERIODS, _M27_RATE_MICRO
    loans = orders.where(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("loan_id"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("p"),
    )
    sched = loans.select(
        "loan_id",
        "p",
        F.explode(F.sequence(F.lit(1).cast("bigint"), F.lit(n).cast("bigint"))).alias("period"),
    )
    base = F.expr(f"p div {n}")
    prev_bal = F.col("p") - (F.col("period") - 1) * base
    prin = F.when(F.col("period") < n, base).otherwise(
        F.col("p") - F.lit(n - 1) * base
    )
    interest = F.expr(
        f"((p - (period - 1) * (p div {n})) * {r}) div 1000000"
    )
    bal_after = F.when(
        F.col("period") < n, F.col("p") - F.col("period") * base
    ).otherwise(F.lit(0).cast("bigint"))
    return sched.select(
        "loan_id",
        "period",
        prin.alias("principal_due_cents"),
        interest.alias("interest_cents"),
        (prin + interest).alias("payment_cents"),
        bal_after.alias("balance_after_cents"),
    )


# --- m28: NPV of the amortization schedule (exact integer discounting) ----
#
# Discount at 0.5% per period: (1+r) = 201/200, so the period-t
# discount factor is the RATIONAL (200/201)^t. Quantized once to
# DISC[t] = floor(1e9 * 200^t / 201^t) in unbounded-integer Python at
# import time — zero transcendentals, zero floats, zero driver state
# (data-independent literals baked into both plans). Per-term PV
# truncates to the cent like a ledger: pv_t = (payment_t * DISC[t])
# div 1e9. Overflow headroom: payment <= ~5e7 cents, DISC < 1e9 ->
# products < 5e16 << 2^63.

_M28_DISC_SCALE = 10**9
_M28_DISC = [
    (_M28_DISC_SCALE * 200**t) // (201**t) for t in range(1, _M27_PERIODS + 1)
]


def _m28_payment_sql(t: str) -> str:
    """payment_cents at period `t` — m27's closed form, shared text."""
    n, r = _M27_PERIODS, _M27_RATE_MICRO
    prin = (
        f"CASE WHEN {t} < {n} THEN principal_cents // {n} "
        f"ELSE principal_cents - {n - 1} * (principal_cents // {n}) END"
    )
    interest = (
        f"((principal_cents - ({t} - 1) * (principal_cents // {n}))"
        f" * {r}) // 1000000"
    )
    return f"({prin} + {interest})"


@query(
    "m28_loan_npv",
    sql=f"""
    WITH loans AS (
      SELECT o_orderkey AS loan_id,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS principal_cents
      FROM orders WHERE o_orderkey % 100 = 0
    ), sched AS (
      SELECT loan_id, principal_cents, period,
             {_m28_payment_sql('period')} AS payment_cents,
             ([{', '.join(str(d) for d in _M28_DISC)}])[period]
               AS disc
      FROM loans, unnest(range(1, {_M27_PERIODS + 1})) AS t(period)
    )
    SELECT loan_id,
           MIN(principal_cents) AS principal_cents,
           CAST(SUM(payment_cents) AS BIGINT) AS total_payment_cents,
           CAST(SUM((payment_cents * disc) // {_M28_DISC_SCALE}) AS BIGINT)
             AS npv_cents,
           CAST(SUM(payment_cents)
                - SUM((payment_cents * disc) // {_M28_DISC_SCALE})
             AS BIGINT) AS discount_loss_cents
    FROM sched GROUP BY loan_id
    """,
)
def m28_loan_npv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Present value of each loan's level-principal repayment stream
    (m27's schedule) at 0.5%/period, entirely in integer cents: the
    discount factors floor(1e9 * (200/201)^t) are exact rationals
    quantized in unbounded-integer arithmetic at IMPORT time (no
    float, no ln/pow, nothing data-dependent), and each period's PV
    truncates to the cent like a ledger. The whole query is ONE
    projection per loan — the 12-term sum folds inside the row via
    F.aggregate over sequence(1,12), so there is NO explode and NO
    shuffle beyond the scan (plan twin of fv4's fixed-point fold);
    the oracle unrolls the identical terms through unnest + SUM,
    which integer arithmetic makes equal."""
    orders = load_table(spark, sf_dir, "orders")
    n = _M27_PERIODS
    loans = orders.where(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("loan_id"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("principal_cents"),
    )
    disc = "array({})".format(", ".join(f"{d}L" for d in _M28_DISC))
    pay = _m28_payment_sql("t").replace("//", " div ")
    total = F.expr(
        f"aggregate(sequence(1L, {n}L), 0L, (acc, t) -> acc + {pay})"
    )
    npv = F.expr(
        f"aggregate(sequence(1L, {n}L), 0L, (acc, t) -> "
        f"acc + (({pay} * element_at({disc}, CAST(t AS INT)))"
        f" div {_M28_DISC_SCALE}))"
    )
    return loans.select(
        "loan_id",
        "principal_cents",
        total.alias("total_payment_cents"),
        npv.alias("npv_cents"),
        (total - npv).alias("discount_loss_cents"),
    )


# --- m29: vintage curves ---------------------------------------------------


@query(
    "m29_vintage_curves",
    sql="""
    WITH base AS (
      SELECT date_trunc('quarter', o.o_orderdate) AS vintage,
             (year(l.l_shipdate) * 12 + month(l.l_shipdate))
             - (year(o.o_orderdate) * 12 + month(o.o_orderdate))
               AS age_months,
             CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), by_age AS (
      SELECT vintage, age_months,
             CAST(SUM(cents) AS BIGINT) AS repaid_cents,
             COUNT(*)::BIGINT AS n_lines
      FROM base GROUP BY 1, 2
    ), tot AS (
      SELECT vintage, CAST(SUM(repaid_cents) AS BIGINT) AS total_cents
      FROM by_age GROUP BY 1
    )
    SELECT CAST(b.vintage AS VARCHAR) AS vintage,
           CAST(b.age_months AS BIGINT) AS age_months,
           b.repaid_cents, b.n_lines,
           CAST(SUM(b.repaid_cents) OVER (
             PARTITION BY b.vintage ORDER BY b.age_months
           ) AS BIGINT) AS cum_repaid_cents,
           CAST(SUM(b.repaid_cents) OVER (
             PARTITION BY b.vintage ORDER BY b.age_months
           ) AS DOUBLE) / CAST(t.total_cents AS DOUBLE) AS repaid_frac
    FROM by_age b JOIN tot t USING (vintage)
    """,
)
def m29_vintage_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vintage curves — the credit-portfolio staple the IBRD domain
    reports on: loans cohorted by ORIGINATION quarter (the vintage),
    repayment activity (line shipments standing in for repayment
    postings) rolled up by integer months-on-book, and the cumulative
    repaid fraction per vintage read down the age axis. Laid side by
    side, the curves expose underwriting drift the calendar view (m10
    cohorts events by first activity; this cohorts MONEY by
    origination) averages away. Exact arithmetic: cents sums, integer
    month ages ((y*12+m) difference — no calendar-daycount float), one
    pinned division per row for the fraction; the cumulative window
    partitions by vintage over <= months-on-book rows."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    base = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("vintage"),
        (
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            - (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        ).cast("bigint").alias("age_months"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    by_age = base.groupBy("vintage", "age_months").agg(
        F.sum("cents").cast("bigint").alias("repaid_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    from pyspark.sql import Window as _W

    tot = by_age.groupBy("vintage").agg(
        F.sum("repaid_cents").cast("bigint").alias("total_cents")
    )
    w = _W.partitionBy("vintage").orderBy("age_months")
    cum = F.sum("repaid_cents").over(w).cast("bigint")
    return (
        by_age.join(tot, "vintage")
        .select(
            F.col("vintage").cast("string").alias("vintage"),
            "age_months",
            "repaid_cents",
            "n_lines",
            cum.alias("cum_repaid_cents"),
            (cum.cast("double") / F.col("total_cents").cast("double")).alias(
                "repaid_frac"
            ),
        )
    )


# --- m30: delinquency-style roll-rate matrix ------------------------------


@query(
    "m30_roll_rates",
    sql="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n_ev
      FROM events GROUP BY 1, 2
    ), tiered AS (
      SELECT user_id, d,
             CASE WHEN n_ev >= 4 THEN 'heavy'
                  WHEN n_ev >= 2 THEN 'mid'
                  ELSE 'light' END AS tier
      FROM daily
    ), trans AS (
      SELECT tier AS to_tier, d,
             lag(tier) OVER (PARTITION BY user_id ORDER BY d) AS from_tier,
             lag(d)    OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      FROM tiered
    ), rolls AS (
      SELECT from_tier, to_tier, COUNT(*)::BIGINT AS n_rolls
      FROM trans
      WHERE from_tier IS NOT NULL AND d = prev_d + 1
      GROUP BY 1, 2
    )
    SELECT from_tier, to_tier, n_rolls,
           CAST(SUM(n_rolls) OVER (PARTITION BY from_tier) AS BIGINT)
             AS from_total,
           (n_rolls * 1000000)
             // CAST(SUM(n_rolls) OVER (PARTITION BY from_tier) AS BIGINT)
             AS roll_rate_micro
    FROM rolls
    """,
)
def m30_roll_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll-rate (state-transition) matrix — the delinquency migration
    report a loan book reads monthly (current -> 30DPD -> 60DPD ...),
    here day-over-day engagement tiers on the events table: per
    (user, day) an activity tier from the event count, then strict
    consecutive-day transitions counted into a from->to matrix with
    the per-from-state roll rate in exact integer micro units
    (n*1e6 div row_total — no float division inside the engine).

    Scale shape: one (user, day) count (map-side combinable), one
    user-partitioned lag window at user-day grain, one matrix-grain
    aggregate — the final window runs over <= |tiers|^2 rows. The
    gap filter (d = prev_d + 1) makes the matrix a true one-period
    migration, not a mixture of horizons — the property that lets
    roll rates chain multiplicatively in a Markov projection."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as _W

    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    tiered = daily.select(
        "user_id",
        "d",
        F.when(F.col("n_ev") >= 4, "heavy")
        .when(F.col("n_ev") >= 2, "mid")
        .otherwise("light")
        .alias("tier"),
    )
    w = _W.partitionBy("user_id").orderBy("d")
    trans = tiered.select(
        F.col("tier").alias("to_tier"),
        "d",
        F.lag("tier").over(w).alias("from_tier"),
        F.lag("d").over(w).alias("prev_d"),
    )
    rolls = (
        trans.where(
            F.col("from_tier").isNotNull()
            & (F.col("d") == F.date_add(F.col("prev_d"), 1))
        )
        .groupBy("from_tier", "to_tier")
        .agg(F.count(F.lit(1)).alias("n_rolls"))
    )
    wf = _W.partitionBy("from_tier")
    from_total = F.sum("n_rolls").over(wf).cast("bigint")
    return rolls.select(
        "from_tier",
        "to_tier",
        "n_rolls",
        from_total.alias("from_total"),
        F.expr("n_rolls * 1000000").cast("bigint").alias("__num"),
    ).select(
        "from_tier",
        "to_tier",
        "n_rolls",
        "from_total",
        F.expr("__num div from_total").alias("roll_rate_micro"),
    )


# --- m31: day-count-convention interest accrual ---------------------------

_M31_RATE_BP = 425  # 4.25% simple annual rate, in basis points


@query(
    "m31_interest_accrual",
    sql=f"""
    WITH loans AS (
      SELECT o.o_orderkey AS loan_id,
             CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS principal_cents,
             CAST(o.o_orderdate AS DATE) AS draw_date,
             CAST(MIN(l.l_shipdate) AS DATE) AS settle_date
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey % 20 = 0
      GROUP BY 1, 2, 3
    ), basis AS (
      SELECT loan_id, principal_cents, draw_date, settle_date,
             CAST(date_diff('day', draw_date, settle_date) AS BIGINT)
               AS act_days,
             CAST((year(settle_date) - year(draw_date)) * 360
                  + (month(settle_date) - month(draw_date)) * 30
                  + (LEAST(day(settle_date), 30) - LEAST(day(draw_date), 30))
               AS BIGINT) AS d360_days
      FROM loans
    )
    SELECT loan_id, principal_cents,
           CAST(draw_date AS VARCHAR) AS draw_date,
           CAST(settle_date AS VARCHAR) AS settle_date,
           act_days, d360_days,
           (principal_cents * {_M31_RATE_BP} * act_days) // 3650000
             AS interest_act365_cents,
           (principal_cents * {_M31_RATE_BP} * d360_days) // 3600000
             AS interest_30_360_cents,
           (principal_cents * {_M31_RATE_BP} * act_days) // 3650000
             - (principal_cents * {_M31_RATE_BP} * d360_days) // 3600000
             AS basis_diff_cents
    FROM basis
    """,
)
def m31_interest_accrual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-count-convention interest accrual — the ACT/365 vs 30/360
    basis arithmetic every loan ledger runs (IBRD lends on both
    bases): a 5% order sample stands in for drawn loans, accruing
    simple interest from draw (order date) to settlement (first
    shipment) under both conventions, with the basis difference per
    loan. The 30/360 day count is the US bond-basis form
    (360*dy + 30*dm + (min(d2,30) - min(d1,30))), stated explicitly so
    both engines compute the identical integer.

    Exactness: interest = principal_cents * rate_bp * days div
    (10000 * year_basis) — a single truncating division on an exact
    int64 product (headroom: 5e7 cents * 425 * ~200 days < 2^63).
    Scale shape: order-grain join + MIN agg, then a pure projection;
    no window, no driver state."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    loans = (
        orders.where(F.col("o_orderkey") % 20 == 0)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_orderkey").alias("loan_id"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("principal_cents"),
            F.col("o_orderdate").cast("date").alias("draw_date"),
        )
        .agg(F.min(F.col("l_shipdate").cast("date")).alias("settle_date"))
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
    basis = loans.select(
        "loan_id",
        "principal_cents",
        "draw_date",
        "settle_date",
        act.alias("act_days"),
        d360.alias("d360_days"),
    )
    r = _M31_RATE_BP
    i365 = F.expr(f"(principal_cents * {r} * act_days) div 3650000")
    i360 = F.expr(f"(principal_cents * {r} * d360_days) div 3600000")
    return basis.select(
        "loan_id",
        "principal_cents",
        F.col("draw_date").cast("string").alias("draw_date"),
        F.col("settle_date").cast("string").alias("settle_date"),
        "act_days",
        "d360_days",
        i365.alias("interest_act365_cents"),
        i360.alias("interest_30_360_cents"),
        (i365 - i360).alias("basis_diff_cents"),
    )


# --- m32: first/last-touch attribution ------------------------------------


@query(
    "m32_touch_attribution",
    sql="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS channel
      FROM events WHERE event_type IN ('click', 'view')
    ), ranked AS (
      SELECT p.p_id, p.cents, t.channel,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY t.t_ts ASC, t.t_id ASC) AS rn_first,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY t.t_ts DESC, t.t_id DESC) AS rn_last
      FROM purchases p
      JOIN touches t ON t.user_id = p.user_id AND t.t_ts < p.p_ts
    )
    SELECT model, channel,
           COUNT(*)::BIGINT AS n_conversions,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM (
      SELECT 'first_touch' AS model, channel, cents
      FROM ranked WHERE rn_first = 1
      UNION ALL
      SELECT 'last_touch', channel, cents
      FROM ranked WHERE rn_last = 1
    )
    GROUP BY 1, 2
    """,
)
def m32_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch revenue attribution: each purchase's
    cents credited to the channel (click/view) of the user's earliest
    and latest PRIOR touch, rolled up per (model, channel). The
    conversion-window join is per-user (t.user_id = p.user_id AND
    t_ts < p_ts) — pair volume is bounded by per-user activity, never
    the corpus; both row_number rankings ride the SAME per-purchase
    partition (one exchange, two in-partition sorts), and the winning
    rows fan out their model labels via explode instead of a UNION of
    filters — a union would duplicate the whole join+window subtree
    per branch (plan-gated in test_plan_regressions). Ties on
    touch timestamp break by event_id in BOTH orderings, so the
    attribution is deterministic cross-engine. Purchases with no prior
    touch drop out of both models identically (inner join) — the
    standard 'unattributed' bucket is the complement, derivable by
    anti-join. Cents via round(value*100) — the established exact
    double->cents quantization both engines share."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as _W

    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
    )
    # qualified aliases: both sides derive from the same events scan, so
    # unqualified user_id == user_id is ambiguous (trivially-true WARN)
    pa, ta = purchases.alias("__att_p"), touches.alias("__att_t")
    joined = pa.join(
        ta,
        (F.col("__att_p.user_id") == F.col("__att_t.user_id"))
        & (F.col("__att_t.t_ts") < F.col("__att_p.p_ts")),
    ).select("p_id", "cents", "channel", "t_ts", "t_id")
    w_first = _W.partitionBy("p_id").orderBy(
        F.asc("t_ts"), F.asc("t_id")
    )
    w_last = _W.partitionBy("p_id").orderBy(
        F.desc("t_ts"), F.desc("t_id")
    )
    ranked = joined.select(
        "p_id",
        "cents",
        "channel",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    # ONE subtree for both models: a union of two filters would make
    # Spark duplicate the join+window pipeline per branch (no subtree
    # sharing across union arms); instead keep the winning rows and
    # explode the model label(s) each row earned — same output, one
    # conversion join, one per-purchase exchange (the two orderings
    # re-sort within it)
    model_arr = F.array(
        F.when(F.col("rn_first") == 1, F.lit("first_touch")),
        F.when(F.col("rn_last") == 1, F.lit("last_touch")),
    )
    return (
        ranked.where((F.col("rn_first") == 1) | (F.col("rn_last") == 1))
        .select(
            F.explode(
                F.filter(model_arr, lambda x: x.isNotNull())
            ).alias("model"),
            "channel",
            "cents",
        )
        .groupBy("model", "channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("cents").cast("bigint").alias("attributed_cents"),
        )
    )


# --- m33: receivables aging buckets ----------------------------------------

_M33_ASOF = "1998-06-01"


@query(
    "m33_aging_buckets",
    sql=f"""
    WITH open_items AS (
      SELECT o_orderkey,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
                            DATE '{_M33_ASOF}') AS BIGINT) AS days_past,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
      WHERE o_orderstatus = 'O' AND o_orderdate <= TIMESTAMP '{_M33_ASOF}'
    ), bucketed AS (
      SELECT CASE WHEN days_past <= 30 THEN 'current'
                  WHEN days_past <= 60 THEN '31-60'
                  WHEN days_past <= 90 THEN '61-90'
                  WHEN days_past <= 180 THEN '91-180'
                  ELSE '180+' END AS bucket,
             CASE WHEN days_past <= 30 THEN 0
                  WHEN days_past <= 60 THEN 1
                  WHEN days_past <= 90 THEN 2
                  WHEN days_past <= 180 THEN 3
                  ELSE 4 END AS bucket_order,
             cents
      FROM open_items
    ), tot AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM bucketed
    )
    SELECT bucket, CAST(bucket_order AS BIGINT) AS bucket_order,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(cents) AS BIGINT) AS amount_cents,
           CAST(CAST(SUM(cents) AS HUGEINT) * 1000000
             // (SELECT total_cents FROM tot) AS BIGINT) AS share_micro
    FROM bucketed GROUP BY bucket, bucket_order
    """,
)
def m33_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Receivables AGING report — the stock complement of m30's
    roll-rate flows and the aging read every loan/AR book closes the
    month with: open items (status 'O') as of a pinned date, bucketed
    by exact integer days outstanding (current/31-60/61-90/91-180/
    180+), with counts, cent-exact amounts, and integer micro shares
    of the open balance. bucket_order ships alongside the label so a
    consumer sorts the report without parsing strings.

    Scale shape: pushed-down status+date scan filter -> projection ->
    bucket-grain combinable aggregate (5 rows) -> one 1-row total
    broadcast for the share — the fact table is scanned once, never
    reshuffled."""
    orders = load_table(spark, sf_dir, "orders")
    open_items = orders.where(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_orderdate") <= F.lit(_M33_ASOF).cast("timestamp"))
    ).select(
        F.datediff(
            F.lit(_M33_ASOF).cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("days_past"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    bucket = (
        F.when(F.col("days_past") <= 30, "current")
        .when(F.col("days_past") <= 60, "31-60")
        .when(F.col("days_past") <= 90, "61-90")
        .when(F.col("days_past") <= 180, "91-180")
        .otherwise("180+")
    )
    border = (
        F.when(F.col("days_past") <= 30, 0)
        .when(F.col("days_past") <= 60, 1)
        .when(F.col("days_past") <= 90, 2)
        .when(F.col("days_past") <= 180, 3)
        .otherwise(4)
    ).cast("bigint")
    bucketed = open_items.select(
        bucket.alias("bucket"), border.alias("bucket_order"), "cents"
    )
    counts = bucketed.groupBy("bucket", "bucket_order").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("cents").cast("bigint").alias("amount_cents"),
    )
    tot = bucketed.agg(
        F.sum("cents").cast("bigint").alias("total_cents")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "bucket_order",
        "n_items",
        "amount_cents",
        # decimal-widened numerator: amount_cents * 1e6 overflows int64
        # once a bucket holds ~9e12 cents (hit at the sf10 decade) —
        # Spark div on DECIMAL(38,0) and DuckDB HUGEINT // truncate
        # identically for positive operands
        F.expr(
            "CAST(CAST(amount_cents AS DECIMAL(38,0)) * 1000000"
            " div total_cents AS BIGINT)"
        ).alias("share_micro"),
    )


# --- m34: prepayment speed (SMM / CPR) -------------------------------------
#
# CPR = 1 - (1 - SMM)^12, computed as an EXPLICIT square-multiply chain
# (x2 = x*x; x4 = x2*x2; x8 = x4*x4; x12 = x8*x4) in BOTH engines — no
# POWER(), whose libm paths differ in the last ulp. SMM itself is an
# exact integer micro ratio first (DECIMAL/HUGEINT-widened numerator,
# the m33 overflow lesson), so the one double chain starts from the
# same exact integer on both sides.


@query(
    "m34_prepayment_speed",
    sql="""
    WITH loans AS (
      SELECT o_orderkey AS loan_id,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS p,
             CASE WHEN o_orderkey % 3 = 0
                  THEN CAST((o_orderkey // 100) % 11 + 1 AS BIGINT)
                  ELSE NULL END AS prepay_period
      FROM orders WHERE o_orderkey % 100 = 0
    ), sched AS (
      SELECT l.loan_id, l.p, l.prepay_period, t.period,
             l.p - (t.period - 1) * (l.p // 12) AS opening_cents,
             l.p // 12 AS sched_prin_cents,
             CASE WHEN l.prepay_period = t.period
                  THEN l.p - t.period * (l.p // 12) ELSE 0 END
               AS prepaid_cents
      FROM loans l, unnest(range(1, 13)) AS t(period)
      WHERE l.prepay_period IS NULL OR t.period <= l.prepay_period
    ), pool AS (
      SELECT CAST(period AS BIGINT) AS period,
             CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(SUM(opening_cents) AS BIGINT) AS opening_cents,
             CAST(SUM(sched_prin_cents) AS BIGINT) AS sched_prin_cents,
             CAST(SUM(prepaid_cents) AS BIGINT) AS prepaid_cents
      FROM sched GROUP BY period
    ), smm AS (
      SELECT *, CASE WHEN opening_cents - sched_prin_cents > 0
                 THEN CAST(CAST(prepaid_cents AS HUGEINT) * 1000000
                      // (opening_cents - sched_prin_cents) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS smm_micro
      FROM pool
    )
    SELECT period, n_active, opening_cents, sched_prin_cents,
           prepaid_cents, smm_micro,
           (1.0 - (((x2 * x2) * (x2 * x2)) * (x2 * x2))) AS cpr
    FROM (SELECT *,
                 (1.0 - smm_micro::DOUBLE / 1000000.0)
                   * (1.0 - smm_micro::DOUBLE / 1000000.0) AS x2
          FROM smm)
    """,
)
def m34_prepayment_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pool prepayment speed — SMM (single-month mortality) and CPR
    (conditional prepayment rate), the named metrics every
    securitized-loan desk tracks: m27's level-principal pool with a
    planted full-prepayment event (loan_id % 3 prepays its remaining
    balance after the scheduled payment of a deterministic period),
    per-period pool opening balance, scheduled principal, prepaid
    principal, SMM as an exact DECIMAL-widened integer micro ratio
    over the industry denominator (opening balance NET of the period's
    scheduled principal — a prepayment is principal returned beyond
    the scheduled payment, so the base excludes what was due anyway;
    zero-net-balance periods guard to SMM 0), and CPR = 1-(1-SMM)^12
    via an explicit square-multiply chain (x2, x4, x8, x12 = x8*x4 —
    no POWER(); both engines run the identical IEEE multiplication
    tree from the same exact integer, so the doubles are bit-equal).

    Scale shape: loans x 12 periods is a closed-form projection (the
    m27 argument — no recursion); the pool rollup is a period-grain
    combinable aggregate (12 rows); everything after is
    constant-size."""
    orders = load_table(spark, sf_dir, "orders")
    loans = orders.where(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("loan_id"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("p"),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            (F.expr("o_orderkey div 100") % 11 + 1).cast("bigint"),
        ).alias("prepay_period"),
    )
    sched = (
        loans.select(
            "loan_id",
            "p",
            "prepay_period",
            F.explode(
                F.sequence(F.lit(1).cast("bigint"), F.lit(12).cast("bigint"))
            ).alias("period"),
        )
        .where(
            F.col("prepay_period").isNull()
            | (F.col("period") <= F.col("prepay_period"))
        )
        .select(
            "period",
            (F.col("p") - (F.col("period") - 1) * F.expr("p div 12"))
            .alias("opening_cents"),
            F.expr("p div 12").alias("sched_prin_cents"),
            F.when(
                F.col("prepay_period") == F.col("period"),
                F.col("p") - F.col("period") * F.expr("p div 12"),
            ).otherwise(0).alias("prepaid_cents"),
        )
    )
    pool = sched.groupBy("period").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum("opening_cents").cast("bigint").alias("opening_cents"),
        F.sum("sched_prin_cents").cast("bigint").alias("sched_prin_cents"),
        F.sum("prepaid_cents").cast("bigint").alias("prepaid_cents"),
    )
    smm = pool.withColumn(
        "smm_micro",
        F.expr(
            "CASE WHEN opening_cents - sched_prin_cents > 0"
            " THEN CAST(CAST(prepaid_cents AS DECIMAL(38,0)) * 1000000"
            " div (opening_cents - sched_prin_cents) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ),
    )
    x = F.lit(1.0) - F.col("smm_micro").cast("double") / F.lit(1_000_000.0)
    out = smm.withColumn("x2", x * x)
    x2 = F.col("x2")
    x4 = x2 * x2
    cpr = F.lit(1.0) - ((x4 * x4) * x4)
    return out.select(
        "period",
        "n_active",
        "opening_cents",
        "sched_prin_cents",
        "prepaid_cents",
        "smm_micro",
        cpr.alias("cpr"),
    )


# --- m35: weighted average life ---------------------------------------------


@query(
    "m35_weighted_average_life",
    sql="""
    WITH loans AS (
      SELECT o_orderkey AS loan_id, o_orderpriority AS cohort,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS p,
             CASE WHEN o_orderkey % 3 = 0
                  THEN CAST((o_orderkey // 100) % 11 + 1 AS BIGINT)
                  ELSE NULL END AS prepay_period
      FROM orders WHERE o_orderkey % 100 = 0
    ), flows AS (
      SELECT l.cohort, t.period,
             -- scheduled principal series (no-prepay scenario, all 12)
             CASE WHEN t.period = 12
                  THEN l.p - 11 * (l.p // 12)
                  ELSE l.p // 12 END AS sflow,
             -- actual principal series: truncates at the prepay period
             CASE
               WHEN l.prepay_period IS NOT NULL
                    AND t.period > l.prepay_period THEN 0
               WHEN l.prepay_period = t.period
                  THEN l.p - (t.period - 1) * (l.p // 12)
               WHEN l.prepay_period IS NULL AND t.period = 12
                  THEN l.p - 11 * (l.p // 12)
               ELSE l.p // 12 END AS aflow
      FROM loans l, unnest(range(1, 13)) AS t(period)
    )
    SELECT cohort,
           CAST(COUNT(*) // 12 AS BIGINT) AS n_loans,
           CAST(SUM(sflow) AS BIGINT) AS principal_cents,
           CAST(CAST(SUM(period * sflow) AS HUGEINT) * 1000000
                // SUM(sflow) AS BIGINT) AS wal_sched_micro,
           CAST(CAST(SUM(period * aflow) AS HUGEINT) * 1000000
                // SUM(aflow) AS BIGINT) AS wal_actual_micro
    FROM flows GROUP BY cohort
    """,
)
def m35_weighted_average_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average life of the loan pool, per priority cohort —
    THE summary statistic an investor quotes for an amortizing pool
    (how many months until the average principal dollar comes back):
    WAL = sum(t * principal_t) / sum(principal_t) over the m34 fixture
    (level principal, planted full prepayments), reported micro-scaled
    for BOTH the contractual schedule and the prepay-shortened actual
    schedule, so wal_sched - wal_actual is the prepayment WAL
    compression. All integer: flows are exact cents (the period-12 row
    carries the p mod 12 residual so each series sums to exactly p),
    and the t-weighted numerator is HUGEINT/DECIMAL(38,0)-widened at
    birth (t*flow sums past int64 * 1e6 at the sf10 decade — the m33
    hazard class).

    Scale shape: closed-form loans x 12 projection (no recursion), one
    cohort-grain combinable aggregate — 5 rows out; nothing shuffles
    but the partial aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    loans = orders.where(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderpriority").alias("cohort"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("p"),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            (F.expr("o_orderkey div 100") % 11 + 1).cast("bigint"),
        ).alias("prepay_period"),
    )
    flows = loans.select(
        "cohort",
        "p",
        "prepay_period",
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), F.lit(12).cast("bigint"))
        ).alias("period"),
    ).select(
        "cohort",
        "period",
        F.when(
            F.col("period") == 12, F.col("p") - 11 * F.expr("p div 12")
        ).otherwise(F.expr("p div 12")).alias("sflow"),
        F.when(
            F.col("prepay_period").isNotNull()
            & (F.col("period") > F.col("prepay_period")),
            F.lit(0).cast("bigint"),
        )
        .when(
            F.col("prepay_period") == F.col("period"),
            F.col("p") - (F.col("period") - 1) * F.expr("p div 12"),
        )
        .when(
            F.col("prepay_period").isNull() & (F.col("period") == 12),
            F.col("p") - 11 * F.expr("p div 12"),
        )
        .otherwise(F.expr("p div 12"))
        .alias("aflow"),
    )
    return flows.groupBy("cohort").agg(
        F.expr("COUNT(*) div 12").cast("bigint").alias("n_loans"),
        F.sum("sflow").cast("bigint").alias("principal_cents"),
        F.expr(
            "CAST(CAST(SUM(period * sflow) AS DECIMAL(38,0)) * 1000000"
            " div SUM(sflow) AS BIGINT)"
        ).alias("wal_sched_micro"),
        F.expr(
            "CAST(CAST(SUM(period * aflow) AS DECIMAL(38,0)) * 1000000"
            " div SUM(aflow) AS BIGINT)"
        ).alias("wal_actual_micro"),
    )


# --- m36: expected-credit-loss staging --------------------------------------


@query(
    "m36_ecl_staging",
    sql="""
    WITH loans AS (
      SELECT o_orderkey AS loan_id, o_orderpriority AS cohort,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS ead_cents,
             CASE o_orderkey % 9 WHEN 6 THEN 35 WHEN 7 THEN 65
                  WHEN 8 THEN 120 ELSE 0 END AS dpd
      FROM orders
    ), staged AS (
      SELECT cohort, ead_cents, dpd,
             CASE WHEN dpd >= 90 THEN 3
                  WHEN dpd >= 30 THEN 2 ELSE 1 END AS stage,
             CASE WHEN dpd >= 90 THEN 10000
                  WHEN dpd >= 30 THEN 2200 ELSE 150 END AS pd_bp
      FROM loans
    ), provisioned AS (
      SELECT cohort, stage, ead_cents,
             CAST(CAST(ead_cents AS HUGEINT) * pd_bp * 4500
                  // 100000000 AS BIGINT) AS ecl_cents
      FROM staged
    )
    SELECT stage, cohort,
           CAST(COUNT(*) AS BIGINT) AS n_loans,
           CAST(SUM(ead_cents) AS BIGINT) AS ead_cents,
           CAST(SUM(ecl_cents) AS BIGINT) AS ecl_cents,
           CAST(CAST(SUM(ecl_cents) AS HUGEINT) * 1000000
                // SUM(ead_cents) AS BIGINT) AS coverage_micro
    FROM provisioned
    GROUP BY stage, cohort
    """,
)
def m36_ecl_staging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IFRS 9 expected-credit-loss staging — the provisioning engine a
    loan book runs at every close: loans bucket into Stage 1 (dpd <
    30, 12-month ECL), Stage 2 (30-89, lifetime ECL on significant
    deterioration) or Stage 3 (90+, credit-impaired) off a
    deterministic days-past-due fixture; per-loan provision =
    EAD x PD(stage) x LGD in exact basis-point integer arithmetic
    (ECL cents = EAD * pd_bp * lgd_bp div 1e8, HUGEINT/DECIMAL-widened
    at birth — the per-row product alone reaches ~1e16), rolled up to
    (stage, cohort) with an exact coverage-ratio micro (the number
    auditors quote: provisions as a share of exposure).

    Scale shape: single fact scan, one (stage, cohort)-grain
    combinable aggregate — 15 rows out. At 100 TB this is a map-side
    partial agg per partition and a 15-row reduce; PD/LGD curves in
    production would be a broadcast dim keyed by (stage, segment)."""
    orders = load_table(spark, sf_dir, "orders")
    dpd = F.expr(
        "CASE o_orderkey % 9 WHEN 6 THEN 35 WHEN 7 THEN 65"
        " WHEN 8 THEN 120 ELSE 0 END"
    )
    loans = orders.select(
        F.col("o_orderpriority").alias("cohort"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("ead_cents"),
        dpd.alias("dpd"),
    )
    staged = loans.select(
        "cohort",
        "ead_cents",
        F.when(F.col("dpd") >= 90, 3)
        .when(F.col("dpd") >= 30, 2)
        .otherwise(1)
        .cast("bigint")
        .alias("stage"),
        F.when(F.col("dpd") >= 90, 10000)
        .when(F.col("dpd") >= 30, 2200)
        .otherwise(150)
        .alias("pd_bp"),
    )
    prov = staged.withColumn(
        "ecl_cents",
        F.expr(
            "CAST(CAST(ead_cents AS DECIMAL(38,0)) * pd_bp * 4500"
            " div 100000000 AS BIGINT)"
        ),
    )
    return prov.groupBy("stage", "cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_loans"),
        F.sum("ead_cents").cast("bigint").alias("ead_cents"),
        F.sum("ecl_cents").cast("bigint").alias("ecl_cents"),
        F.expr(
            "CAST(CAST(SUM(ecl_cents) AS DECIMAL(38,0)) * 1000000"
            " div SUM(ead_cents) AS BIGINT)"
        ).alias("coverage_micro"),
    )


# --- m37: Macaulay / modified duration --------------------------------------
#
# Discounting is EXACT RATIONAL arithmetic: yield 0.5% per semiannual
# period means the period-t discount factor is (200/201)^t; putting
# every cash flow over the common denominator 201^6 turns the whole
# present-value calculation into integer products CF_t * 200^t *
# 201^(6-t) (factors fit int64; products widen to HUGEINT/DECIMAL(38,0)
# at birth). Duration then falls out as a ratio of two exact integer
# sums — no POWER(), no float discounting, bit-equal cross-engine.

_M37_FACTORS = {t: 200**t * 201 ** (6 - t) for t in range(1, 7)}


def _m37_factor_case(engine_cast: str) -> str:
    arms = " ".join(
        f"WHEN {t} THEN CAST('{v}' AS {engine_cast})"
        for t, v in _M37_FACTORS.items()
    )
    return f"CASE period {arms} END"


@query(
    "m37_macaulay_duration",
    sql=f"""
    WITH loans AS (
      SELECT o_orderkey AS loan_id,
             CAST((o_orderkey // 100) % 4 AS BIGINT) AS tier,
             ((o_orderkey // 100) % 4 + 1) * 100 AS coupon_bp,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS face_cents
      FROM orders WHERE o_orderkey % 100 = 0
    ), cf AS (
      SELECT l.tier, l.face_cents, t.period,
             (CAST(l.face_cents AS HUGEINT) * l.coupon_bp // 10000)
               + CASE WHEN t.period = 6
                      THEN CAST(l.face_cents AS HUGEINT)
                      ELSE CAST(0 AS HUGEINT) END AS cf_cents
      FROM loans l, unnest(range(1, 7)) AS t(period)
    ), pv AS (
      SELECT tier, face_cents, period,
             cf_cents * {_m37_factor_case('HUGEINT')} AS x
      FROM cf
    )
    SELECT tier,
           CAST(COUNT(*) // 6 AS BIGINT) AS n_loans,
           CAST(SUM(face_cents) // 6 AS BIGINT) AS face_cents,
           CAST(SUM(period * x) * 1000000 // SUM(x) AS BIGINT)
             AS macaulay_periods_micro,
           CAST((SUM(period * x) * 1000000 // SUM(x)) // 2 AS BIGINT)
             AS macaulay_years_micro,
           CAST((SUM(period * x) * 1000000 // SUM(x)) * 200 // 201
                AS BIGINT) AS modified_periods_micro
    FROM pv GROUP BY tier
    """,
)
def m37_macaulay_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Macaulay and modified duration of the loan book's cash flows,
    per coupon tier — the interest-rate-risk statistic next to m28's
    NPV: each loan is a 6-period semiannual level-coupon note (coupon
    = face x tier bp, face repaid at maturity) discounted at 0.5% per
    period. The discount curve is exact rational arithmetic over the
    common denominator 201^6 (module comment): weight X_t = CF_t x
    200^t x 201^(6-t) as widened integers, Macaulay =
    sum(t*X)/sum(X) micro-scaled by integer division, modified =
    Macaulay x 200/201 (exactly 1/(1+y)) — every output column an
    exact integer, no transcendentals anywhere.

    Scale shape: m35's closed-form projection (loans x 6), one
    tier-grain combinable aggregate, 4 rows out; the HUGEINT/DECIMAL
    sums stay ~1e33 at sf10 (< the 38-digit ceiling with 5 decades of
    headroom)."""
    orders = load_table(spark, sf_dir, "orders")
    loans = orders.where(F.col("o_orderkey") % 100 == 0).select(
        (F.expr("o_orderkey div 100") % 4).cast("bigint").alias("tier"),
        ((F.expr("o_orderkey div 100") % 4 + 1) * 100).alias("coupon_bp"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("face_cents"),
    )
    cf = loans.select(
        "tier",
        "face_cents",
        "coupon_bp",
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), F.lit(6).cast("bigint"))
        ).alias("period"),
    ).select(
        "tier",
        "face_cents",
        "period",
        F.expr(
            "CAST(face_cents AS DECIMAL(38,0)) * coupon_bp div 10000"
            " + CASE WHEN period = 6 THEN CAST(face_cents AS DECIMAL(38,0))"
            " ELSE CAST(0 AS DECIMAL(38,0)) END"
        ).alias("cf_cents"),
    )
    pv = cf.select(
        "tier",
        "face_cents",
        "period",
        F.expr(f"cf_cents * {_m37_factor_case('DECIMAL(38,0)')}").alias("x"),
    )
    dur = "SUM(period * x) * 1000000 div SUM(x)"
    return pv.groupBy("tier").agg(
        F.expr("COUNT(*) div 6").cast("bigint").alias("n_loans"),
        F.expr("SUM(face_cents) div 6").cast("bigint").alias("face_cents"),
        F.expr(f"CAST({dur} AS BIGINT)").alias("macaulay_periods_micro"),
        F.expr(f"CAST(({dur}) div 2 AS BIGINT)").alias("macaulay_years_micro"),
        F.expr(f"CAST(({dur}) * 200 div 201 AS BIGINT)")
        .alias("modified_periods_micro"),
    )


# --- m38: payment waterfall ---------------------------------------------------


@query(
    "m38_payment_waterfall",
    sql="""
    WITH loans AS (
      SELECT o_orderkey AS loan_id, o_orderpriority AS cohort,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS p,
             CAST(o_orderkey % 7 AS BIGINT) * 2500 AS fee_due_cents
      FROM orders WHERE o_orderkey % 10 = 0
    ), due AS (
      SELECT loan_id, cohort, fee_due_cents,
             p * 425 // 120000 AS int_due_cents,
             p // 12 AS prin_due_cents,
             -- collected: a deterministic fraction of total due, so every
             -- waterfall tier (full pay / partial / shortfall) occurs
             (fee_due_cents + p * 425 // 120000 + p // 12)
               * (loan_id % 13) // 10 AS collected_cents
      FROM loans
    ), applied AS (
      SELECT cohort, collected_cents, fee_due_cents, int_due_cents,
             prin_due_cents,
             LEAST(collected_cents, fee_due_cents) AS fee_paid,
             LEAST(collected_cents - LEAST(collected_cents, fee_due_cents),
                   int_due_cents) AS int_paid,
             LEAST(collected_cents - LEAST(collected_cents, fee_due_cents)
                   - LEAST(collected_cents
                           - LEAST(collected_cents, fee_due_cents),
                           int_due_cents),
                   prin_due_cents) AS prin_paid
      FROM due
    )
    SELECT cohort,
           CAST(COUNT(*) AS BIGINT) AS n_loans,
           CAST(SUM(collected_cents) AS BIGINT) AS collected_cents,
           CAST(SUM(fee_paid) AS BIGINT) AS fees_cents,
           CAST(SUM(int_paid) AS BIGINT) AS interest_cents,
           CAST(SUM(prin_paid) AS BIGINT) AS principal_cents,
           CAST(SUM(collected_cents - fee_paid - int_paid - prin_paid)
                AS BIGINT) AS overpay_cents,
           CAST(SUM(CASE WHEN fee_paid + int_paid + prin_paid
                         < fee_due_cents + int_due_cents + prin_due_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_shortfall
    FROM applied GROUP BY cohort
    """,
)
def m38_payment_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment-waterfall allocation — the loan-servicing rule every
    remittance runs through: collections apply to FEES first, then
    INTEREST, then PRINCIPAL (the standard servicing priority), any
    remainder is overpayment/suspense, and a loan whose collection
    doesn't cover total due is a shortfall. The allocation is the
    LEAST()-chain identity (paid_k = min(remaining_k, due_k)) in
    exact cents — collected - fees - interest - principal == overpay
    holds as an integer identity per row, and the fixture's
    (loan_id % 13)/10 collection ratio plants full-pay, partial and
    over-pay tiers so every output column is exercised.

    Scale shape: single scan, pure projection (the waterfall is
    per-row arithmetic, no window, no join), cohort-grain combine —
    5 rows out."""
    orders = load_table(spark, sf_dir, "orders")
    loans = orders.where(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("loan_id"),
        F.col("o_orderpriority").alias("cohort"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("p"),
        ((F.col("o_orderkey") % 7).cast("bigint") * 2500)
        .alias("fee_due_cents"),
    )
    due = loans.select(
        "loan_id",
        "cohort",
        "fee_due_cents",
        F.expr("p * 425 div 120000").alias("int_due_cents"),
        F.expr("p div 12").alias("prin_due_cents"),
        F.expr(
            "(fee_due_cents + p * 425 div 120000 + p div 12)"
            " * (loan_id % 13) div 10"
        ).alias("collected_cents"),
    )
    applied = due.select(
        "cohort",
        "collected_cents",
        "fee_due_cents",
        "int_due_cents",
        "prin_due_cents",
        F.expr("LEAST(collected_cents, fee_due_cents)").alias("fee_paid"),
        F.expr(
            "LEAST(collected_cents - LEAST(collected_cents, fee_due_cents),"
            " int_due_cents)"
        ).alias("int_paid"),
        F.expr(
            "LEAST(collected_cents - LEAST(collected_cents, fee_due_cents)"
            " - LEAST(collected_cents - LEAST(collected_cents, fee_due_cents),"
            " int_due_cents), prin_due_cents)"
        ).alias("prin_paid"),
    )
    return applied.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_loans"),
        F.sum("collected_cents").cast("bigint").alias("collected_cents"),
        F.sum("fee_paid").cast("bigint").alias("fees_cents"),
        F.sum("int_paid").cast("bigint").alias("interest_cents"),
        F.sum("prin_paid").cast("bigint").alias("principal_cents"),
        F.sum(
            F.col("collected_cents")
            - F.col("fee_paid")
            - F.col("int_paid")
            - F.col("prin_paid")
        )
        .cast("bigint")
        .alias("overpay_cents"),
        F.sum(
            F.when(
                F.col("fee_paid") + F.col("int_paid") + F.col("prin_paid")
                < F.col("fee_due_cents")
                + F.col("int_due_cents")
                + F.col("prin_due_cents"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_shortfall"),
    )


# --- m39: rate-shock revaluation (effective duration / convexity) -----------
#
# Full exact revaluation at three per-period yields (-0.5%, +0.5%,
# +1.5% — the +/-100bp parallel shock around m37's base 0.5%): each
# yield y = num/200 - 1 gives PV = sum(CF_t * 200^t * num^(6-t)) /
# num^6 in exact integers (the m37 rational-discount trick with a
# per-scenario denominator), truncated to cents per tier so the three
# scenarios land on a COMMON integer scale before differencing —
# cross-denominator products (~1e47) would blow the 38-digit ceiling,
# pv cents never do.

_M39_NUMS = {"down": 199, "base": 201, "up": 203}


def _m39_x_case(engine_cast: str, num: int) -> str:
    arms = " ".join(
        f"WHEN {t} THEN CAST('{200**t * num ** (6 - t)}' AS {engine_cast})"
        for t in range(1, 7)
    )
    return f"CASE period {arms} END"


def _m39_pv_sql(engine_cast: str, scen: str) -> str:
    num = _M39_NUMS[scen]
    return (
        f"CAST(SUM(cf_cents * {_m39_x_case(engine_cast, num)})"
        f" // CAST('{_M39_NUMS[scen] ** 6}' AS {engine_cast}) AS BIGINT)"
        if engine_cast == "HUGEINT"
        else f"CAST(SUM(cf_cents * {_m39_x_case(engine_cast, num)})"
        f" div CAST('{_M39_NUMS[scen] ** 6}' AS {engine_cast}) AS BIGINT)"
    )


@query(
    "m39_rate_shock_revaluation",
    sql=f"""
    WITH loans AS (
      SELECT o_orderkey AS loan_id,
             CAST((o_orderkey // 100) % 4 AS BIGINT) AS tier,
             ((o_orderkey // 100) % 4 + 1) * 100 AS coupon_bp,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS face_cents
      FROM orders WHERE o_orderkey % 100 = 0
    ), cf AS (
      SELECT l.tier, t.period,
             (CAST(l.face_cents AS HUGEINT) * l.coupon_bp // 10000)
               + CASE WHEN t.period = 6
                      THEN CAST(l.face_cents AS HUGEINT)
                      ELSE CAST(0 AS HUGEINT) END AS cf_cents
      FROM loans l, unnest(range(1, 7)) AS t(period)
    ), pv AS (
      SELECT tier,
             {_m39_pv_sql('HUGEINT', 'down')} AS pv_down_cents,
             {_m39_pv_sql('HUGEINT', 'base')} AS pv_base_cents,
             {_m39_pv_sql('HUGEINT', 'up')} AS pv_up_cents
      FROM cf GROUP BY tier
    )
    SELECT tier, pv_down_cents, pv_base_cents, pv_up_cents,
           CAST(CAST(pv_down_cents - pv_up_cents AS HUGEINT) * 100000000
                // (2 * pv_base_cents) AS BIGINT)
             AS eff_duration_periods_micro,
           CAST(CAST(pv_down_cents + pv_up_cents - 2 * pv_base_cents
                     AS HUGEINT) * 10000000000
                // pv_base_cents AS BIGINT)
             AS eff_convexity_micro
    FROM pv
    """,
)
def m39_rate_shock_revaluation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel rate-shock revaluation — the risk report next to m37's
    analytic duration: the m37 book fully repriced at per-period
    yields -0.5% / +0.5% / +1.5% (a +/-100bp shock straddling the
    base; the negative-rate leg is deliberate — the scenario set every
    post-2015 desk runs), each PV an exact rational sum truncated to
    cents, then EFFECTIVE duration (P- - P+) / (2 P0 dy) and
    EFFECTIVE convexity (P- + P+ - 2 P0) / (P0 dy^2) as widened
    integer micro ratios (dy = 0.01/period, so the factors are exactly
    100e6 and 1e10). Cross-query law unit-pinned: effective duration
    from full revaluation must agree with m37's analytic modified
    duration to first order — the standard model-validation check that
    the two implementations are consistent.

    Scale shape: m37's closed-form projection with a 3-scenario
    tier-grain combine (the three PVs share ONE pass — each scenario
    is a different constant-folded factor CASE over the same cf rows);
    4 rows out."""
    orders = load_table(spark, sf_dir, "orders")
    loans = orders.where(F.col("o_orderkey") % 100 == 0).select(
        (F.expr("o_orderkey div 100") % 4).cast("bigint").alias("tier"),
        ((F.expr("o_orderkey div 100") % 4 + 1) * 100).alias("coupon_bp"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("face_cents"),
    )
    cf = loans.select(
        "tier",
        "face_cents",
        "coupon_bp",
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), F.lit(6).cast("bigint"))
        ).alias("period"),
    ).select(
        "tier",
        "period",
        F.expr(
            "CAST(face_cents AS DECIMAL(38,0)) * coupon_bp div 10000"
            " + CASE WHEN period = 6 THEN CAST(face_cents AS DECIMAL(38,0))"
            " ELSE CAST(0 AS DECIMAL(38,0)) END"
        ).alias("cf_cents"),
    )
    pv = cf.groupBy("tier").agg(
        *[
            F.expr(_m39_pv_sql("DECIMAL(38,0)", scen)).alias(
                f"pv_{scen}_cents"
            )
            for scen in ("down", "base", "up")
        ]
    )
    return pv.select(
        "tier",
        "pv_down_cents",
        "pv_base_cents",
        "pv_up_cents",
        F.expr(
            "CAST(CAST(pv_down_cents - pv_up_cents AS DECIMAL(38,0))"
            " * 100000000 div (2 * pv_base_cents) AS BIGINT)"
        ).alias("eff_duration_periods_micro"),
        F.expr(
            "CAST(CAST(pv_down_cents + pv_up_cents - 2 * pv_base_cents"
            " AS DECIMAL(38,0)) * 10000000000 div pv_base_cents AS BIGINT)"
        ).alias("eff_convexity_micro"),
    )
