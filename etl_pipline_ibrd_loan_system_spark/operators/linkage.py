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
    the standard multi-pass recall argument.

    Prefer MANY TIGHT passes over few loose ones: per-pass cost is
    sum-over-blocks of |left-block|*|right-block|, so a 2-3 field
    conjunction per pass keeps blocks small while the pass union keeps
    recall (the er2b shape — see fit_fs_weights' SCALE note for the
    measured sf10 numbers)."""
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


def fit_fs_weights(
    field_counts: dict[str, tuple[int, int]],
    n_true: int,
    n_false: int,
    scale: int = 1_000_000,
) -> dict[str, tuple[int, int]]:
    """Fit Fellegi–Sunter agreement/disagreement weights from labeled
    candidate-pair counts — the EM-free special case where ground
    truth is known (a clerically-reviewed sample in production; the
    planted-defect extract here). For each field with
    (n_agree_in_true_pairs, n_agree_in_false_pairs):

        m = P(agree | match)     = (at + 1) / (n_true + 2)
        u = P(agree | non-match) = (af + 1) / (n_false + 2)
        w_agree    = ln(m / u),      w_disagree = ln((1-m) / (1-u))

    (add-one smoothing so a perfectly-separating field can't yield
    ln(0)). Both logs are quantized to integer micro-nats through
    sampling.guarded_log_qround — the fv5/fv6 discipline: the ln
    argument is a RATIO OF INTEGER PRODUCTS both engines form
    identically, driver-side rounding refuses values within 1e-7 of a
    boundary, so the fitted weights (and every pair score summed from
    them) are exact integers cross-engine. Driver state: 2 ints per
    field + 2 totals — bounded by the comparison vector, never the
    data.

    SCALE — the blocking you fit on decides everything (VERDICT r8
    item 3): the fit consumes whatever candidate universe
    multi_pass_candidates produced, so feed it TIGHT multi-field
    passes (2-3 field conjunctions per pass; recall from the UNION of
    passes) — the er2b shape, measured 119 s at sf10 on the default
    8 GiB heap. Loose single-field blocks (the er2 baseline) grow
    candidate mass ~100× under 10× row replication and wall at sf10
    even on a 48 GiB heap (SCALE.md:1425). Tight blocks are not a
    recall sacrifice: a true pair survives if ANY pass's fields were
    spared by that record's perturbations, and the sf10 run pinned
    recall possible-or-better per true pair."""
    import math

    from .sampling import guarded_log_qround

    nt2, nf2 = n_true + 2, n_false + 2
    out: dict[str, tuple[int, int]] = {}
    for f, (at, af) in field_counts.items():
        w_a = guarded_log_qround(
            scale * math.log(((at + 1) * nf2) / (nt2 * (af + 1))),
            f"w_agree[{f}]",
        )
        w_d = guarded_log_qround(
            scale * math.log(((n_true - at + 1) * nf2) / (nt2 * (n_false - af + 1))),
            f"w_disagree[{f}]",
        )
        out[f] = (w_a, w_d)
    return out
