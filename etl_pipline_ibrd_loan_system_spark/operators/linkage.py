"""Probabilistic-style record linkage: multi-pass blocked candidate
generation and Fellegi–Sunter-shaped weighted evidence scoring.

Not reference-derived — this is the entity-resolution family a
warehouse needs between dd14's phonetic blocking (candidate recall) and
c8's golden record (post-match survivorship): given two tables of
possibly-dirty records, emit candidate pairs via cheap equi-join
blocking passes, then score each pair by summing per-field
agreement/disagreement weights (the log-likelihood-ratio shape of
Fellegi & Sunter 1969, with INTEGER weights so the score — and the
match/possible/non-match decision — is bit-exact cross-engine; real
deployments would fit the weights via EM, which only changes the
constants, not the plan).

Scale: each blocking pass is one hash equi-join on its blocking key —
never an all-pairs product; pair volume is sum over blocks of
|left-block| * |right-block|, controlled by key choice exactly like
dd11's sorted-neighborhood windows. Scoring is a pure per-pair
projection. The union of passes is deduplicated on the id pair only
(groupBy two keys), not on payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def multi_pass_candidates(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    passes: list[list[tuple[str, str]]],
) -> DataFrame:
    """Distinct (left_id, right_id) candidate pairs from the union of
    equi-join blocking passes; each pass is a list of (left_col,
    right_col) equality conditions. A true pair survives overall if at
    least ONE pass blocks on fields that pass's perturbations spared —
    the standard multi-pass recall argument."""
    la, ra = left.alias("__lnk_l"), right.alias("__lnk_r")
    out = None
    for cols in passes:
        cond = None
        for lc, rc in cols:
            # qualified names so frames sharing lineage (dirty extract
            # of the clean table — the common ER case) stay unambiguous
            c = F.col(f"__lnk_l.{lc}") == F.col(f"__lnk_r.{rc}")
            cond = c if cond is None else cond & c
        pairs = la.join(ra, cond).select(
            F.col(f"__lnk_l.{left_id}"), F.col(f"__lnk_r.{right_id}")
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct()


def score_pairs(
    pairs: DataFrame,
    comparisons: list[tuple[Column, int, int]],
    match_threshold: int,
    possible_threshold: int,
) -> DataFrame:
    """Weighted-evidence score and three-way decision per candidate
    pair. `comparisons` is [(agreement_predicate, agree_weight,
    disagree_weight)]; the score is the integer sum of the fired
    weights, and the decision is 'match' (>= match_threshold),
    'possible' (>= possible_threshold — the clerical-review zone), else
    'non_match'."""
    score = None
    for agree, w_agree, w_disagree in comparisons:
        term = F.when(agree, F.lit(w_agree)).otherwise(F.lit(w_disagree))
        score = term if score is None else score + term
    score = score.cast("bigint")
    decision = (
        F.when(score >= match_threshold, "match")
        .when(score >= possible_threshold, "possible")
        .otherwise("non_match")
    )
    return pairs.withColumn("score", score).withColumn(
        "classification", decision
    )
