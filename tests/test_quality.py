"""Data-quality operators detect planted violations (operators/quality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.operators import quality


def test_violation_checks_one_pass_and_counts(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 0.0), (None, 3.0)], "k int, v double"
    )
    out = {
        r.check_name: r
        for r in quality.violation_checks(
            df,
            [
                quality.Check("nonpositive_v", F.col("v") <= 0),
                quality.Check("null_k", F.col("k").isNull()),
                quality.Check("tolerated", F.col("v") < 5, max_bad=3),
            ],
        ).collect()
    }
    assert (out["nonpositive_v"].metric, out["nonpositive_v"].passed) == (2, False)
    assert (out["null_k"].metric, out["null_k"].passed) == (1, False)
    assert (out["tolerated"].metric, out["tolerated"].passed) == (3, True)
    # the whole suite is ONE aggregate over the table: no join, no window
    plan = quality.violation_checks(
        df, [quality.Check("x", F.col("v") < 0)]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


def test_fk_orphans_and_duplicates(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,)], "pk int")
    orphan = quality.fk_orphan_count(fact, "fk", dim, "pk", "orphans").first()
    assert (orphan.metric, orphan.passed) == (2, False)
    dup = quality.duplicate_key_count(fact, "fk", "dups").first()
    assert (dup.metric, dup.passed) == (1, False)


def test_profile_table_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c")], "k int, s string"
    )
    prof = {r.column: r for r in quality.profile_table(df, ["k", "s"]).collect()}
    assert prof["k"].n_rows == 3 and prof["k"].n_nulls == 0
    assert prof["k"].n_distinct == 2
    assert (prof["k"].min_value, prof["k"].max_value) == ("1", "2")
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert (prof["s"].min_value, prof["s"].max_value) == ("a", "c")


def test_k_anonymity_flags_and_generalization_fix(spark):
    """Small classes are flagged; generalizing the offending column
    coarsens classes until the k floor holds — the standard screen ->
    generalize -> re-screen loop."""
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.operators.quality import k_anonymity

    rows = [("1000" + str(i % 2), "a") for i in range(6)] + [("20001", "b")]
    df = spark.createDataFrame(rows, "zip string, seg string")
    out = {
        (r.zip, r.seg): (r.class_size, r.violates_k)
        for r in k_anonymity(df, ["zip", "seg"], k=3).collect()
    }
    assert out[("20001", "b")] == (1, True)   # singleton: re-identifiable
    assert out[("10000", "a")] == (3, False)
    # generalize: truncate zip to 3-digit prefix -> the two 1000x classes
    # merge to size 6; the singleton remains a violation (next loop would
    # coarsen further or suppress)
    gen = k_anonymity(
        df, ["zip", "seg"], k=3,
        generalize={"zip": F.substring("zip", 1, 3)},
    )
    got = {(r.zip, r.seg): (r.class_size, r.violates_k) for r in gen.collect()}
    assert got[("100", "a")] == (6, False)
    assert got[("200", "b")] == (1, True)


def test_l_diversity_catches_homogeneous_class(spark):
    """A class can pass the k floor and still be homogeneous in the
    sensitive attribute — that's the leak l-diversity exists to catch."""
    from etl_pipline_ibrd_loan_system_spark.operators.quality import (
        k_anonymity,
        l_diversity,
    )

    rows = (
        [("100", "flu")] * 5            # big class, ONE sensitive value
        + [("200", "flu"), ("200", "cold"), ("200", "ok")]
    )
    df = spark.createDataFrame(rows, "zip string, diagnosis string")
    k = {r.zip: r.violates_k for r in k_anonymity(df, ["zip"], k=3).collect()}
    assert k == {"100": False, "200": False}  # both pass k=3
    ld = {
        r.zip: (r.sensitive_values, r.violates_l)
        for r in l_diversity(df, ["zip"], "diagnosis", l=2).collect()
    }
    assert ld["100"] == (1, True)   # homogeneous: membership discloses
    assert ld["200"] == (3, False)


def test_dq17_drift_is_scale_invariant_and_selfconsistent(spark, sf_dir):
    """drift_cos is a true cosine: within [-1, 1]; identical halves
    give exactly 1; counts partition each label's population."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table

    rows = entry.queries()["dq24_embedding_drift"](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    totals = {
        r.label: r.n for r in emb.groupBy("label").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert len(rows) == len(totals)
    for r in rows:
        assert -1.0 <= r.mean_drift_cos <= 1.0
        assert r.n_baseline + r.n_current == totals[r.label]
        # same-population halves: second-moment profile is stable even
        # though this corpus is zero-mean per label (mean cos ~ noise)
        assert r.var_drift_cos > 0.8  # ~25 vecs/half at sf0.001


def test_t_closeness_exact_tvd_and_flags(spark):
    """Hand universe: 2 classes over a 3-value sensitive attribute.
    The integer EMD numerator, the t_value, and the cross-multiplied
    violation flag all match a manual total-variation computation —
    including a class MISSING one sensitive value entirely."""
    from etl_pipline_ibrd_loan_system_spark.operators.quality import t_closeness

    rows = (
        [("a", "x")] * 4                              # class a: all x, no y/z
        + [("b", "x")] * 5 + [("b", "y")] * 5 + [("b", "z")] * 2
    )
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {r.qi: r for r in t_closeness(df, ["qi"], "s", 1, 5).collect()}

    # global: x=9, y=5, z=2, N=16
    def num(cls_counts, n):
        g = {"x": 9, "y": 5, "z": 2}
        return sum(abs(cls_counts.get(v, 0) * 16 - g[v] * n) for v in g)

    na = num({"x": 4}, 4)  # 56 -> t = 56/128 = 0.4375
    assert out["a"].emd_num == na
    assert out["a"].t_value == na / (2.0 * 4 * 16)
    assert out["a"].violates_t == (na * 5 > 2 * 4 * 16)
    nb = num({"x": 5, "y": 5, "z": 2}, 12)  # 56 -> t = 56/384 ~ 0.146
    assert out["b"].emd_num == nb
    assert out["b"].violates_t == (nb * 5 > 2 * 12 * 16)
    # sanity: the skewed class violates, the representative one doesn't
    assert out["a"].violates_t and not out["b"].violates_t


def test_mutual_information_nonnegative_total_and_independence(spark, sf_dir):
    """Total MI (sum of contributions) is >= 0 on real data, and an
    independent hand universe yields ~zero MI (every PMI cell is 0
    micro-nats when joint = product of marginals exactly)."""
    import __spark_entry__ as entry

    rows = entry.queries()["dq21_mutual_information"](spark, sf_dir).collect()
    assert sum(r.mi_contrib for r in rows) >= 0.0
    assert all(r.n_xy > 0 for r in rows)

    # perfectly independent 2x2 with equal masses -> all PMI exactly 0
    import math

    from etl_pipline_ibrd_loan_system_spark.operators import sampling

    for n_xy, n_x, n_y, n in [(25, 50, 50, 100), (10, 20, 50, 100)]:
        v = sampling.guarded_log_qround(
            1_000_000 * math.log((n_xy * n) / (n_x * n_y)), "t"
        )
        assert v == 0


def test_dq23_psi_degenerate_bins_do_not_crash(spark, tmp_path):
    """ADVICE r9 (medium): a bin with zero rows in either window — the
    exact new/vanished-category situation PSI is deployed to flag —
    must yield a finite, correctly-signed contribution (count floored
    to 1 inside the ln) instead of ZeroDivisionError / ln(0), and the
    DuckDB oracle must agree exactly on the same fixture."""
    import datetime as dt

    import duckdb

    from etl_pipline_ibrd_loan_system_spark.queries import (
        ORACLE,
        load_registry,
    )

    qs, _ = load_registry()
    before = dt.datetime(2024, 1, 10, 0, 0, 0)
    after = dt.datetime(2024, 1, 20, 0, 0, 0)
    rows = (
        # stable bin: both windows
        [(i, before, 1, "stable", 0.0, "{}") for i in range(5)]
        + [(100 + i, after, 1, "stable", 0.0, "{}") for i in range(5)]
        # vanished bin: baseline only (n_actual = 0)
        + [(200 + i, before, 1, "vanished", 0.0, "{}") for i in range(3)]
        # new bin: current only (n_expected = 0)
        + [(300 + i, after, 1, "brand_new", 0.0, "{}") for i in range(4)]
    )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.bin: r
        for r in qs["dq23_population_stability"](spark, str(tmp_path))
                 .collect()
    }
    assert set(got) == {"stable", "vanished", "brand_new"}
    # both degenerate bins contribute POSITIVE drift mass, never NaN/inf
    assert got["brand_new"].psi_contrib > 0
    assert got["vanished"].psi_contrib > 0
    for r in got.values():
        assert r.psi_contrib == r.psi_contrib  # not NaN
    # oracle parity on the degenerate fixture
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    want = {
        r.bin: r
        for r in con.execute(
            ORACLE["dq23_population_stability"]
        ).fetchdf().itertuples()
    }
    for b, r in got.items():
        assert int(want[b].psi_ln_micro) == r.psi_ln_micro, b
        assert abs(float(want[b].psi_contrib) - r.psi_contrib) < 1e-15, b
