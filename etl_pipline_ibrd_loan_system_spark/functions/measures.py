"""Semantic/measure layer (SURVEY.md §1.1, §2.D) — the 12 named measures
recovered from `Loans Dashboard.pbix::Report/Layout` `_Measures`, as
composable aggregate expressions over the loan star, plus the dashboard
query shape (groupBy dim attr + slicer predicates + sort by measure desc).

The DAX definitions were lost with the compressed DataModel; definitions
below follow the field bindings and are flagged inferred where SURVEY.md
says so (D5 Interest Income).

Measures are decimal-space exact (functions.exact) so the BI parity queries
hash-match the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .exact import davg, dsum, lavg_unscaled, lsum_unscaled

_DEC12 = "decimal(12,2)"
_DEC8 = "decimal(8,4)"


def _m(name: str) -> Column:
    return F.col(name)


# name -> factory returning an aliased aggregate Column. Aliases are the
# measure names in snake_case (Layout names in comments).
MEASURES = {
    # "Loans" / "Number of Loans" (count cards)
    "loans": lambda: F.count(F.lit(1)).alias("loans"),
    "number_of_loans": lambda: F.countDistinct("pk_loan_number_sk").alias(
        "number_of_loans"
    ),
    # "Loan Amount" / "Total Loan Amount"
    "loan_amount": lambda: dsum("original_principal_amount", "loan_amount"),
    "total_loan_amount": lambda: dsum(
        "original_principal_amount", "total_loan_amount"
    ),
    # "Repaid" / "Due1"
    "repaid": lambda: dsum("repaid", "repaid"),
    "due1": lambda: dsum("due", "due1"),
    # "Disbursed Amount" / "Undisbursed Amount"
    "disbursed_amount": lambda: dsum("disbursed_amount", "disbursed_amount"),
    "undisbursed_amount": lambda: dsum("undisbursed_amount", "undisbursed_amount"),
    # "Average Inerest Rate" (sic, Layout)
    "average_interest_rate": lambda: davg("interest_rate", "average_interest_rate"),
    # "Interest Income" — DAX lost; inferred sum(disbursed*rate/100) (SURVEY §2.D D5)
    # factor kept at scale 4: a down-scale decimal cast would round in Spark
    # but truncate in DuckDB — never narrow a decimal's scale cross-engine
    "interest_income": lambda: dsum(
        _m("disbursed_amount").cast("decimal(18,4)")
        * (_m("interest_rate") / 100).cast(_DEC8),
        "interest_income",
        cast_to=None,
    ),
    # "Guarantors" / "Borrowers" (distinct-count cards)
    "guarantors": lambda: F.countDistinct("fk_guarantor").alias("guarantors"),
    "borrowers": lambda: F.countDistinct("fk_borrower").alias("borrowers"),
}


# Unscaled-long twins of the measure set (optimization r11, guide §1.2
# step 2 / §2.3): the loan fact's money columns are all exact multiples
# of the principal's cents (principal x 0.8/0.5/0.3/0.2 with 2-digit
# factors), so over a fact exposing `cents` (unscaled int64 of
# CAST(principal AS DECIMAL(12,2))) and `rate_k` (the integer tenths of
# interest_rate), every decimal measure's unscaled value is a small-int
# product: no per-row BigDecimal multiply, and the SUMs accumulate on
# int64 limbs (functions.exact.lsum_unscaled — same doubles out,
# bit-for-bit; the m6 oracle is unchanged and proves it). Value bounds:
# cents*100 <= ~1e10 (2 limbs); income u8 = cents*80 * rate_k*10 <= ~4e12
# (3 limbs). rate_k*1000 is the exact unscaled4 of
# CAST(rate_k/10.0 AS DECIMAL(18,4)) because |double(k/10)-k/10| << 5e-5.
# Named LOAN_GRAIN_* because the rewrites below are only valid over a
# fact at LOAN grain (ADVICE r11): COUNT(pk) for COUNT(DISTINCT pk)
# requires pk uniqueness/non-nullness, and the cents/rate_k identities
# require the money columns to be exact small-int multiples of the
# principal's cents. Applying this dict to any other fact (e.g. after a
# fan-out join) silently over-counts — tests/test_loan_measures.py pins
# the only wiring to _loan_fact_unscaled.
LOAN_GRAIN_MEASURES_UNSCALED = {
    "loans": lambda: F.count(F.lit(1)).alias("loans"),
    # COUNTD over the fact's PRIMARY KEY: pk_loan_number_sk is the loan
    # fact's unique, non-null grain key (o_orderkey), so
    # COUNT(DISTINCT pk) == COUNT(pk) — the rewrite a BI engine makes
    # from a UNIQUE constraint, which Spark cannot infer (guide §8: use
    # what you know that the optimizer does not). This removes the pk
    # branch of the distinct-aggregate Expand — the branch carrying
    # ~100k of m6's ~104k partial-aggregate rows — and the oracle still
    # computes COUNT(DISTINCT ...), proving equality on every SF. Only
    # valid over a loan-grain fact; MEASURES keeps the general COUNTD.
    "number_of_loans": lambda: F.count("pk_loan_number_sk").alias(
        "number_of_loans"
    ),
    "loan_amount": lambda: lsum_unscaled("cents * 100", 4, "loan_amount", limbs=2),
    "total_loan_amount": lambda: lsum_unscaled(
        "cents * 100", 4, "total_loan_amount", limbs=2
    ),
    "repaid": lambda: lsum_unscaled("cents * 50", 4, "repaid", limbs=2),
    "due1": lambda: lsum_unscaled("cents * 30", 4, "due1", limbs=2),
    "disbursed_amount": lambda: lsum_unscaled(
        "cents * 80", 4, "disbursed_amount", limbs=2
    ),
    "undisbursed_amount": lambda: lsum_unscaled(
        "cents * 20", 4, "undisbursed_amount", limbs=2
    ),
    "average_interest_rate": lambda: lavg_unscaled(
        "rate_k * 1000", 4, "average_interest_rate", limbs=2
    ),
    "interest_income": lambda: lsum_unscaled(
        "(cents * 80) * (rate_k * 10)", 8, "interest_income", limbs=3
    ),
    "guarantors": lambda: F.countDistinct("fk_guarantor").alias("guarantors"),
    "borrowers": lambda: F.countDistinct("fk_borrower").alias("borrowers"),
}


def dashboard_query(
    fact: DataFrame,
    group_by: Sequence[str],
    measures: Sequence[str],
    year_col: str | None = None,
    year_range: tuple[int, int] | None = None,
    slicers: dict[str, object] | None = None,
    order_by_measure: str | None = None,
    measure_defs: dict | None = None,
) -> DataFrame:
    """One Power BI visual: slicer predicates -> groupBy(dim attrs) ->
    measure aggregates -> optional sort-by-measure-desc (SURVEY §2.E E2,
    §3 entry point 4: `Year In 2011L..2024L` report filter + per-visual
    group/sort). `measure_defs` selects the measure dictionary (default
    the decimal-space MEASURES; pass LOAN_GRAIN_MEASURES_UNSCALED with a
    loan-grain fact that exposes cents/rate_k for the long-space
    twins)."""
    out = fact
    if year_range and year_col:
        out = out.filter(F.col(year_col).between(*year_range))
    for col, val in (slicers or {}).items():
        out = out.filter(F.col(col) == val)
    aggs = [(measure_defs or MEASURES)[m]() for m in measures]
    out = out.groupBy(*group_by).agg(*aggs) if group_by else out.agg(*aggs)
    if order_by_measure:
        out = out.orderBy(F.col(order_by_measure).desc(), *group_by)
    return out
