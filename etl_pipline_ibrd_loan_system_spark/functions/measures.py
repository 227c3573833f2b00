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

from .exact import davg, dsum

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


def dashboard_query(
    fact: DataFrame,
    group_by: Sequence[str],
    measures: Sequence[str],
    year_col: str | None = None,
    year_range: tuple[int, int] | None = None,
    slicers: dict[str, object] | None = None,
    order_by_measure: str | None = None,
) -> DataFrame:
    """One Power BI visual: slicer predicates -> groupBy(dim attrs) ->
    measure aggregates -> optional sort-by-measure-desc (SURVEY §2.E E2,
    §3 entry point 4: `Year In 2011L..2024L` report filter + per-visual
    group/sort)."""
    out = fact
    if year_range and year_col:
        out = out.filter(F.col(year_col).between(*year_range))
    for col, val in (slicers or {}).items():
        out = out.filter(F.col(col) == val)
    aggs = [MEASURES[m]() for m in measures]
    out = out.groupBy(*group_by).agg(*aggs) if group_by else out.agg(*aggs)
    if order_by_measure:
        out = out.orderBy(F.col(order_by_measure).desc(), *group_by)
    return out
