"""Unit tests for the round-6 second-wave operators: CDC changelog
apply (operators/cdc.py), triangle counting (operators/graph.py), and
the interval-overlap join (operators/rangejoin.py)."""

from __future__ import annotations

import itertools

from etl_pipline_ibrd_loan_system_spark.operators import graph
from etl_pipline_ibrd_loan_system_spark.operators.cdc import cdc_apply
from etl_pipline_ibrd_loan_system_spark.operators.rangejoin import (
    binned_interval_overlap_join,
)

CDC_SCHEMA = "k string, seq long, op string, val string"


def _apply(spark, rows):
    df = spark.createDataFrame(rows, CDC_SCHEMA)
    out = cdc_apply(df, ["k"], "seq", "op", ["val"])
    return {r.k: (r.seq, r.val) for r in out.collect()}


def test_cdc_last_writer_wins(spark):
    got = _apply(
        spark,
        [("a", 1, "I", "v1"), ("a", 3, "U", "v3"), ("a", 2, "U", "v2")],
    )
    assert got == {"a": (3, "v3")}


def test_cdc_trailing_delete_removes_key(spark):
    got = _apply(
        spark,
        [("a", 1, "I", "v1"), ("a", 2, "D", None), ("b", 1, "I", "w1")],
    )
    assert got == {"b": (1, "w1")}


def test_cdc_upsert_after_delete_resurrects(spark):
    got = _apply(
        spark,
        [("a", 1, "I", "v1"), ("a", 2, "D", None), ("a", 3, "I", "v3")],
    )
    assert got == {"a": (3, "v3")}


def test_cdc_partition_invariant(spark):
    rows = [
        (f"k{i % 7}", i, "D" if i % 11 == 0 else "U", f"v{i}") for i in range(1, 200)
    ]
    one = cdc_apply(
        spark.createDataFrame(rows, CDC_SCHEMA).coalesce(1), ["k"], "seq", "op", ["val"]
    )
    many = cdc_apply(
        spark.createDataFrame(rows, CDC_SCHEMA).repartition(13),
        ["k"],
        "seq",
        "op",
        ["val"],
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def _tri_counts(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.n_triangles for r in graph.triangle_counts(df).collect()}


def test_triangle_complete_graph(spark):
    """K5: every node is in C(4,2) = 6 triangles; 10 triangles total."""
    edges = list(itertools.combinations(range(5), 2))
    got = _tri_counts(spark, edges)
    assert got == {i: 6 for i in range(5)}


def test_triangle_none_on_bipartite(spark):
    """Bipartite graphs are triangle-free — the trade graph sanity check."""
    edges = [(a, b) for a in range(3) for b in range(10, 14)]
    assert _tri_counts(spark, edges) == {}


def test_triangle_duplicate_and_reversed_edges_collapse(spark):
    """Orientation and multiplicity must not inflate counts."""
    tri = [(1, 2), (2, 3), (1, 3)]
    noisy = tri + [(b, a) for a, b in tri] + tri
    assert _tri_counts(spark, noisy) == {1: 1, 2: 1, 3: 1}


def test_triangle_skewed_hub(spark):
    """A hub star plus one rim edge: exactly one triangle, and the
    degree-ordered orientation keeps the hub's wedge list small (the
    correctness of counts is what's asserted; the fan-out cap is the
    plan property documented in the operator)."""
    hub = [(0, i) for i in range(1, 30)]
    got = _tri_counts(spark, hub + [(1, 2)])
    assert got == {0: 1, 1: 1, 2: 1}


def _overlap(spark, left, right, w):
    l = spark.createDataFrame(left, "l_id long, l_lo long, l_hi long")
    r = spark.createDataFrame(right, "r_id long, r_lo long, r_hi long")
    out = binned_interval_overlap_join(l, "l_lo", "l_hi", r, "r_lo", "r_hi", w)
    return sorted((row.l_id, row.r_id) for row in out.collect())


def test_overlap_basic_and_touching_excluded(spark):
    left = [(1, 0, 10), (2, 20, 30)]
    right = [(10, 5, 8), (20, 10, 15), (30, 29, 40)]
    # [0,10) overlaps [5,8); [0,10) does NOT overlap [10,15) (half-open touch);
    # [20,30) overlaps [29,40)
    assert _overlap(spark, left, right, 4) == [(1, 10), (2, 30)]


def test_overlap_pair_emitted_once_across_shared_bins(spark):
    """Two long intervals sharing many bins must produce ONE pair row."""
    left = [(1, 0, 1000)]
    right = [(9, 500, 2000)]
    assert _overlap(spark, left, right, 7) == [(1, 9)]


def test_overlap_matches_bruteforce(spark):
    import random

    rnd = random.Random(13)
    left = [(i, lo := rnd.randrange(0, 500), lo + rnd.randrange(1, 60)) for i in range(80)]
    right = [(i, lo := rnd.randrange(0, 500), lo + rnd.randrange(1, 90)) for i in range(80)]
    expect = sorted(
        (a, b)
        for a, alo, ahi in left
        for b, blo, bhi in right
        if alo < bhi and blo < ahi
    )
    for w in (5, 32, 1000):
        assert _overlap(spark, left, right, w) == expect


# ------------------------------------------------------------------ zorder


def test_zorder_interleave_known_values(spark):
    from etl_pipline_ibrd_loan_system_spark.operators import zorder

    expr = zorder.interleave_sql("x", "y", bits=4)
    rows = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (0, 0), (15, 15)], "x long, y long"
    ).selectExpr("x", "y", f"{expr} AS z").collect()
    got = {(r["x"], r["y"]): r["z"] for r in rows}
    # d1 bits land at even positions, d2 at odd
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 15
    assert got[(0, 0)] == 0
    assert got[(15, 15)] == 255


def test_zorder_buckets_are_rectangles(spark, sf_dir):
    """Every Z-bucket's (d1, d2) bounding box must cover at most a
    2^(bits-bucket_bits/2)-sized slice of each normalized dimension —
    the pruning property. Checked loosely: no bucket spans the full
    range of BOTH dimensions at once."""
    from etl_pipline_ibrd_loan_system_spark.catalog import load_table
    from etl_pipline_ibrd_loan_system_spark.operators import zorder

    ev = load_table(spark, sf_dir, "events")
    out = zorder.zorder_layout(
        ev, "user_id", "CAST(CAST(ts AS TIMESTAMP) AS BIGINT)"
    ).collect()
    assert len(out) > 1
    full_d1 = max(r["max_d1"] for r in out) - min(r["min_d1"] for r in out)
    full_d2 = max(r["max_d2"] for r in out) - min(r["min_d2"] for r in out)
    for r in out:
        span1 = r["max_d1"] - r["min_d1"]
        span2 = r["max_d2"] - r["min_d2"]
        assert span1 < full_d1 or span2 < full_d2


def test_sliding_hll_equals_union_sketch(spark, sf_dir):
    """The trailing-window estimate for an anchor day must equal the
    plain HLL of the raw events in that window — register explode +
    max-merge is lossless vs re-sketching the union."""
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table
    from etl_pipline_ibrd_loan_system_spark.operators import sketches

    ev = load_table(spark, sf_dir, "events")
    sliding = {
        r["window_day"]: r["est_distinct"]
        for r in sketches.hll_sliding_distinct(
            ev, "user_id", "ts", window_days=2
        ).collect()
    }
    assert len(sliding) >= 3
    anchor = sorted(sliding)[1]  # a day with a real predecessor
    window = ev.where(
        (F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date")
         .between(F.date_sub(F.lit(anchor), 1), F.lit(anchor)))
    )
    direct = sketches.hll_distinct(
        window.withColumn("g", F.lit(1)), "user_id", ["g"]
    ).collect()[0]["est_distinct"]
    assert sliding[anchor] == direct


def test_skyline_matches_bruteforce(spark):
    # pull the registered query's operator shape onto a hand fixture by
    # replaying its two-phase plan against the quadratic definition
    from pyspark.sql import functions as F

    pts = [
        (1, 5, 100), (2, 5, 90),   # 2 dominates 1 (same size, cheaper)
        (3, 9, 90),                # dominates 2 (same price, bigger)
        (4, 9, 90),                # duplicate of 3: both must survive
        (5, 2, 10), (6, 12, 300), (7, 11, 250), (8, 1, 10),
    ]
    def dominated(p, q):
        return (
            q[2] <= p[2] and q[1] >= p[1]
            and (q[2] < p[2] or q[1] > p[1])
        )
    expect = {
        p[0] for p in pts if not any(dominated(p, q) for q in pts if q != p)
    }
    df = spark.createDataFrame(pts, "p_partkey long, size long, price_cents long")
    from pyspark.sql import Window

    b = df.withColumn("bucket", F.expr("price_cents div 50"))
    bmax = b.groupBy("bucket").agg(F.max("size").alias("bmax"))
    w_pre = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    pre = bmax.select("bucket", F.max("bmax").over(w_pre).alias("pre_max"))
    surv = b.join(F.broadcast(pre), "bucket").where(
        F.col("pre_max").isNull() | (F.col("size") > F.col("pre_max"))
    )
    w_cheaper = Window.orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_tie = Window.partitionBy("price_cents")
    got = {
        r["p_partkey"]
        for r in surv.select(
            "p_partkey", "size", "price_cents",
            F.max("size").over(w_cheaper).alias("m1"),
            F.max("size").over(w_tie).alias("m2"),
        )
        .where(
            (F.col("m1").isNull() | (F.col("size") > F.col("m1")))
            & (F.col("size") == F.col("m2"))
        )
        .collect()
    }
    assert got == expect


def test_hilbert_walk_matches_reference_and_is_adjacent(spark):
    """The generated stage expressions reproduce the classic xy2d
    Hilbert walk on the full 16x16 grid: bijective onto 0..255 and
    every consecutive key pair is grid-adjacent (the locality property
    Morton order lacks)."""
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.operators import zorder

    def xy2d_ref(order, x, y):
        d, s = 0, order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "gx long, gy long"
    )
    cur = grid.withColumn("hx", F.col("gx")).withColumn(
        "hy", F.col("gy")
    ).withColumn("hd", F.lit(0).cast("bigint"))
    for p in range(3, -1, -1):
        xe, ye, de = zorder._hilbert_stage_exprs(1 << p)
        cur = cur.select(
            "gx", "gy",
            F.expr(xe).alias("hx"),
            F.expr(ye).alias("hy"),
            F.expr(de).alias("hd"),
        )
    rows = cur.collect()
    assert all(r.hd == xy2d_ref(16, r.gx, r.gy) for r in rows)
    keys = sorted(r.hd for r in rows)
    assert keys == list(range(256))
    pos = {r.hd: (r.gx, r.gy) for r in rows}
    assert all(
        abs(pos[i][0] - pos[i + 1][0]) + abs(pos[i][1] - pos[i + 1][1]) == 1
        for i in range(255)
    )


def test_e33_twap_numerator_survives_int64_overflow(spark):
    """ADVICE r10: the TWAP numerator must widen EACH TERM to
    DECIMAL(38,0) before summing. Two segments whose cents x dur_us
    products sum past int64 (2 x 5e18 > 9.22e18) kill an unwidened
    bigint SUM (ANSI ARITHMETIC_OVERFLOW under Spark 4 defaults — the
    whole query dies at scale; with ANSI off it would wrap silently
    AND diverge from DuckDB's auto-HUGEINT); the widened-at-birth
    expression — the exact expression e33 ships — stays exact."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    df = spark.createDataFrame(
        [(1, 5_000_000_000, 1_000_000_000), (1, 5_000_000_000, 1_000_000_000)],
        "user_id int, cents long, dur_us long",
    )
    got = df.groupBy("user_id").agg(
        F.expr(
            "CAST(SUM(CAST(cents AS DECIMAL(38,0)) * dur_us) * 100"
            " div SUM(dur_us) AS BIGINT)"
        ).alias("twap_centicents"),
    ).collect()[0]
    # 2 * (5e9 * 1e9) = 1e19 total mass over 2e9 us -> 5e9 cents avg
    assert got.twap_centicents == 500_000_000_000
    # and the unwidened form really is in the overflow regime on this
    # fixture (guards that the test exercises overflow, not headroom)
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.groupBy("user_id").agg(
            F.expr("SUM(cents * dur_us)").alias("wrapped")
        ).collect()
