"""Property-based tests (SURVEY §5.3): SCD2 invariants under RANDOM
load sequences, forward-fill idempotence under random null patterns.
Few examples (Spark jobs are seconds each), but each example is a full
multi-load scenario hypothesis can shrink."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_apply, scd2_init
from etl_pipline_ibrd_loan_system_spark.operators.window_ops import forward_fill

KEYS = ["k1", "k2", "k3", "k4"]

# a load: subset of keys, each with (t1_attr, t2_attr) small-int values
load_st = st.dictionaries(
    st.sampled_from(KEYS),
    st.tuples(st.integers(0, 2), st.integers(0, 2)),
    min_size=1,
    max_size=4,
)


def _staging(spark, load: dict):
    return spark.createDataFrame(
        [(k, f"a{a}", f"b{b}") for k, (a, b) in sorted(load.items())],
        "bk string, attr1 string, attr2 string",
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(loads=st.lists(load_st, min_size=2, max_size=4))
def test_scd2_invariants_random_sequences(spark, loads):
    dim = scd2_init(
        _staging(spark, loads[0]), "bk", ["attr1", "attr2"], asof="2024-01-01"
    )
    latest = dict(loads[0])
    for i, load in enumerate(loads[1:], start=2):
        asof = f"2024-01-{i:02d}"
        dim = scd2_apply(
            dim,
            _staging(spark, load),
            key="bk",
            t1_cols=["attr1"],
            t2_cols=["attr2"],
            asof=asof,
        ).localCheckpoint(eager=True)  # keep lineage flat across applies
        latest.update(load)

        rows = dim.collect()
        by_key: dict[str, list] = {}
        for r in rows:
            by_key.setdefault(r.bk, []).append(r)
        # exactly one current row per key ever loaded; end==NULL iff current
        for k, versions in by_key.items():
            current = [r for r in versions if r.is_current]
            assert len(current) == 1, f"{k}: {len(current)} current rows"
            assert current[0].end_date is None
            assert all(r.end_date is not None for r in versions if not r.is_current)
            # versions tile time: sorted intervals never overlap
            closed = sorted(
                (r for r in versions if not r.is_current),
                key=lambda r: (r.start_date, r.end_date),
            )
            for a, b in zip(closed, closed[1:]):
                assert a.end_date <= b.start_date
            # current row reflects the LATEST staged values (T1 overwrite
            # + T2 versioning both converge on the newest attributes)
            a_val, b_val = latest[k]
            assert current[0].attr1 == f"a{a_val}"
            assert current[0].attr2 == f"b{b_val}"
        # surrogate keys unique across the whole dimension
        sks = [r.sk for r in rows]
        assert len(sks) == len(set(sks))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(0, 9)), min_size=1, max_size=12
    )
)
def test_forward_fill_idempotent_and_correct(spark, vals):
    df = spark.createDataFrame(
        [(i, None if v is None else str(v)) for i, v in enumerate(vals)],
        "ord int, v string",
    )
    filled = forward_fill(df, order_by=["ord"], target="v")
    got = {r.ord: r.v for r in filled.collect()}
    # reference semantics: last non-null at or before position
    expect, last = {}, None
    for i, v in enumerate(vals):
        if v is not None:
            last = str(v)
        expect[i] = last
    assert got == expect
    # idempotence: filling a filled column changes nothing
    refilled = forward_fill(filled, order_by=["ord"], target="v")
    assert {r.ord: r.v for r in refilled.collect()} == got


# ----------------------------------------------------------- rollup merge

rows_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.floats(-1e6, 1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_st, cut=st.integers(0, 30))
def test_rollup_merge_is_split_invariant(spark, rows, cut):
    """merge(partial(A), partial(B)) == partial(A ∪ B) for ANY split
    point — the associativity that makes incremental maintenance exact
    (decimal sums; double partials would fail this on batch boundaries)."""
    from etl_pipline_ibrd_loan_system_spark.operators.rollup import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    cut = min(cut, len(rows))
    df = spark.createDataFrame(rows, "k string, v double")
    a = spark.createDataFrame(rows[:cut] or [("zz", 0.0)], "k string, v double")
    b = spark.createDataFrame(rows[cut:] or [("zz", 0.0)], "k string, v double")
    if not rows[:cut]:
        a = a.where("k <> 'zz'")
    if not rows[cut:]:
        b = b.where("k <> 'zz'")
    direct = finalize_rollup(partial_rollup(df, ["k"], "v"), ["k"]).collect()
    merged = finalize_rollup(
        merge_rollups(
            [partial_rollup(a, ["k"], "v"), partial_rollup(b, ["k"], "v")], ["k"]
        ),
        ["k"],
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, merged))


# ----------------------------------------------------------- chunk coverage


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.integers(1, 60),
    chunk=st.integers(1, 20),
    overlap_frac=st.floats(0.0, 0.99),
)
def test_chunks_cover_all_tokens_any_geometry(spark, n_tokens, chunk, overlap_frac):
    """Every token index appears in ≥1 chunk for ANY (chunk, stride≤chunk)
    geometry; chunk k starts exactly at k*stride."""
    from etl_pipline_ibrd_loan_system_spark.operators.textprep import (
        chunk_by_tokens,
    )

    stride = max(1, int(chunk * (1 - overlap_frac)))
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_by_tokens(df, "text", "doc_id", chunk, stride).collect()
    covered = set()
    for r in rows:
        start = r["chunk_id"] * stride
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["n_tokens"] <= chunk
        assert toks == [f"t{i}" for i in range(start, start + len(toks))]
        covered.update(range(start, start + len(toks)))
    assert covered == set(range(n_tokens))


# ------------------------------------------------- prefix-filter theorem

docs_st = st.lists(
    st.lists(st.sampled_from(list("abcdef")), min_size=3, max_size=12),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_st, thresh=st.sampled_from([0.3, 0.5, 0.7]))
def test_prefix_filtered_jaccard_equals_brute_force(spark, docs, thresh):
    """prefix_filtered_jaccard_pairs must emit EXACTLY the brute-force
    pair set for any corpus and threshold — the prefix-filter recall
    theorem, exercised on random short token streams (which maximize
    shared shingles and boundary-size pairs)."""
    from etl_pipline_ibrd_loan_system_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    rows = [(i, " ".join(toks), "blk") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    fast = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in prefix_filtered_jaccard_pairs(
            df, "text", "doc_id", "lang", n=3, threshold=thresh
        ).collect()
    }
    brute = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", "lang", n=3, threshold=thresh
        ).collect()
    }
    assert fast == brute


# ---------------------------------------------- banded-cosine recall theorem


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(1, 9), min_size=4, max_size=4),
        min_size=2,
        max_size=12,
    )
)
def test_normalized_banded_pairs_recall_theorem(spark, vecs):
    """The +-1 quantized-component band must not lose any pair the
    brute-force blocked cosine finds (recall 1.0 theorem at band_q >
    sqrt(2-2t)). Pair sets compared, not cos values (the two formulas
    round differently); pairs within 1e-9 of the threshold under either
    formula are excluded as float-boundary noise."""
    from etl_pipline_ibrd_loan_system_spark.operators.dedup import (
        embedding_blocked_pairs,
        normalized_banded_pairs,
    )

    t = 0.97
    rows = [(i, [float(x) for x in v], "b") for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vid long, vec array<double>, blk string")
    banded = {
        (r["id_a"], r["id_b"])
        for r in normalized_banded_pairs(
            df, "vid", "vec", "blk", threshold=t, band_q=0.25
        ).collect()
        if abs(r["cos_sim"] - t) > 1e-9
    }
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_blocked_pairs(
            df, "vid", "vec", "blk", threshold=t
        ).collect()
        if abs(r["cos_sim"] - t) > 1e-9
    }
    assert banded == brute


# --- reconcile: diff/apply round trip under random snapshots --------------

_snap_st = st.dictionaries(
    st.integers(0, 6),  # keys
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.integers(0, 3)),
    ),
    max_size=7,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=_snap_st, new=_snap_st)
def test_snapshot_diff_apply_round_trip_random(spark, old, new):
    """For ANY pair of snapshots (random adds/drops/changes/nulls):
    applying diff(old, new) to old reconstructs new exactly, and the
    delta never contains an unchanged key."""
    from etl_pipline_ibrd_loan_system_spark.operators.reconcile import (
        apply_snapshot_diff,
        snapshot_diff,
    )

    def df(snap):
        return spark.createDataFrame(
            [(k, s, v) for k, (s, v) in sorted(snap.items())],
            "k int, s string, v int",
        )

    delta = snapshot_diff(
        df(old), df(new), ["k"], ["s", "v"], include_values=True
    ).localCheckpoint(eager=True)
    for r in delta.collect():
        assert not (
            r.k in old and r.k in new and old[r.k] == new[r.k]
        ), f"unchanged key {r.k} leaked into the delta"
    rebuilt = {
        r.k: (r.s, r.v)
        for r in apply_snapshot_diff(df(old), delta, ["k"], ["s", "v"]).collect()
    }
    assert rebuilt == new


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    records=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.one_of(st.none(), st.sampled_from(["x", "y"])),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_golden_record_idempotent_and_serial_equal(spark, records):
    """golden_record == the serial latest-non-null fold, and applying
    it to its own output is the identity (idempotence)."""
    from etl_pipline_ibrd_loan_system_spark.operators.reconcile import golden_record

    rows = [(k, seq, s, v) for seq, (k, s, v) in enumerate(records)]
    df = spark.createDataFrame(rows, "k int, seq int, s string, v int")
    out = golden_record(df, ["k"], "seq", ["s", "v"]).localCheckpoint(eager=True)

    expect: dict[int, dict] = {}
    for k, seq, s, v in rows:
        e = expect.setdefault(k, {"s": None, "v": None, "n": 0, "last": seq})
        e["n"] += 1
        e["last"] = seq
        if s is not None:
            e["s"] = s
        if v is not None:
            e["v"] = v
    got = {r.k: r for r in out.collect()}
    assert set(got) == set(expect)
    for k, e in expect.items():
        r = got[k]
        assert (r.s, r.v, r.n_records, r.last_seq) == (e["s"], e["v"], e["n"], e["last"])

    again = golden_record(
        out.select("k", F.col("last_seq").alias("seq"), "s", "v"),
        ["k"], "seq", ["s", "v"],
    )
    for r in again.collect():
        assert (r.s, r.v) == (got[r.k].s, got[r.k].v)
        assert r.n_records == 1


# --- Bellman-Ford vs brute-force Floyd-Warshall ---------------------------

_edge_st = st.lists(
    st.tuples(
        st.integers(0, 7), st.integers(0, 7), st.integers(1, 9)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edge_st, seeds=st.sets(st.integers(0, 7), min_size=1, max_size=3))
def test_bellman_ford_matches_floyd_warshall_within_rounds(spark, edges, seeds):
    """On random small graphs the 3-round relaxation must equal the
    true shortest-path distance wherever a <=3-edge path realizes it —
    computed independently by a pure-python round-limited DP."""
    from etl_pipline_ibrd_loan_system_spark.operators.graph import bellman_ford

    INF = float("inf")
    best = {s: 0 for s in seeds}
    for _ in range(3):  # same bounded relaxation, reference implementation
        nxt = dict(best)
        for u, v, w in edges:
            if best.get(u, INF) + w < nxt.get(v, INF):
                nxt[v] = best[u] + w
        best = nxt
    e_df = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    s_df = spark.createDataFrame([(s,) for s in sorted(seeds)], "node bigint")
    got = {
        r.node: r.dist for r in bellman_ford(e_df, s_df, rounds=3).collect()
    }
    assert got == best


# --- incremental join view == monolithic join ------------------------------

_a_st = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 99)), min_size=0, max_size=8
)
_b_st = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 99)), min_size=0, max_size=6
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=_a_st, b=_b_st, a_cut=st.integers(0, 8), b_cut=st.integers(0, 6))
def test_incremental_join_view_equals_monolithic(spark, a, b, a_cut, b_cut):
    """The delta-join algebra must reproduce the monolithic join for
    ANY split point of either side — including empty deltas and empty
    bases (the a_cut/b_cut extremes hypothesis will shrink to)."""
    from etl_pipline_ibrd_loan_system_spark.operators.reconcile import (
        incremental_join_view,
    )

    mk = lambda rows, schema: spark.createDataFrame(rows, schema) if rows else \
        spark.createDataFrame([], schema)
    a_old, a_delta = a[:a_cut], a[a_cut:]
    b_old, b_delta = b[:b_cut], b[b_cut:]
    sa, sb = "k bigint, av bigint", "k bigint, bv bigint"
    got = incremental_join_view(
        mk(a_old, sa), mk(a_delta, sa), mk(b_old, sb), mk(b_delta, sb), on="k"
    )
    expected = mk(a, sa).join(mk(b, sb), "k")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


# --------------------------------------------------- Hamilton apportionment


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(1, 10_000), min_size=1, max_size=8),
    budget=st.integers(0, 5_000),
)
def test_apportionment_laws_random(spark, weights, budget):
    """Hamilton laws under random weights: exact-sum, floor/ceil
    bounds, and quota monotonicity (alloc within 1 of the real-valued
    proportional share)."""
    from etl_pipline_ibrd_loan_system_spark.operators.sampling import (
        apportion_budget,
    )

    df = spark.createDataFrame(
        [(f"s{i}", w) for i, w in enumerate(weights)], "source string, w long"
    )
    rows = apportion_budget(df, "source", "w", budget=budget).collect()
    total_w = sum(weights)
    assert sum(r["alloc"] for r in rows) == budget
    for r in rows:
        quota = budget * r["weight"] / total_w
        assert r["floor_alloc"] <= r["alloc"] <= r["floor_alloc"] + 1
        # Hamilton never strays more than 1 from the real quota
        assert quota - 1 < r["alloc"] < quota + 1 or abs(
            r["alloc"] - quota
        ) <= 1


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(1, 300), min_size=1, max_size=40),
)
def test_ffd_engines_agree_random(spark, sizes):
    """The Arrow kernel and the Catalyst fold produce IDENTICAL bin
    assignments on random size multisets (the oracle checks the fold;
    this transitively covers the kernel the registered query runs)."""
    from etl_pipline_ibrd_loan_system_spark.operators.sampling import ffd_pack

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n long"
    )
    a = {
        (r["doc_id"], r["bin_id"])
        for r in ffd_pack(
            df, "doc_id", "n", budget=256, n_buckets=2, engine="arrow"
        ).collect()
    }
    b = {
        (r["doc_id"], r["bin_id"])
        for r in ffd_pack(
            df, "doc_id", "n", budget=256, n_buckets=2, engine="fold"
        ).collect()
    }
    assert a == b


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2)),  # (class, value)
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_t_closeness_bounds_and_pooled_class_is_zero(spark, rows):
    """Random universes: 0 <= t <= 1 for every class, the integer
    numerator is even-divisible into the claimed rational (emd_num /
    (2*n*N) reproduces t_value), and a universe with ONE class always
    yields t = 0 (a class equal to the whole table cannot diverge from
    it)."""
    from etl_pipline_ibrd_loan_system_spark.operators.quality import t_closeness

    df = spark.createDataFrame(
        [(f"c{c}", f"v{v}") for c, v in rows], "qi string, s string"
    )
    out = t_closeness(df, ["qi"], "s").collect()
    n_total = len(rows)
    for r in out:
        assert 0.0 <= r.t_value <= 1.0
        assert r.t_value == r.emd_num / (2.0 * r.class_size * n_total)

    one = spark.createDataFrame(
        [("only", f"v{v}") for _, v in rows], "qi string, s string"
    )
    for r in t_closeness(one, ["qi"], "s").collect():
        assert r.emd_num == 0 and r.t_value == 0.0


@given(
    principals=st.lists(st.integers(1200, 10**7), min_size=1, max_size=6)
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_npv_discount_monotone_random_principals(spark, principals):
    """Random principals (>= $12 so every period's principal portion is
    nonzero — a 1-cent loan correctly discounts to an NPV of 0 under
    ledger truncation) through the m28 arithmetic (pure Python replay
    of the same integers): NPV is strictly below the payment total,
    positive, and monotone in the principal."""
    disc = [(10**9 * 200**t) // (201**t) for t in range(1, 13)]

    def npv(p_cents: int) -> tuple[int, int]:
        base = p_cents // 12
        total = npvv = 0
        for t in range(1, 13):
            prin = base if t < 12 else p_cents - 11 * base
            interest = ((p_cents - (t - 1) * base) * 3750) // 1_000_000
            pay = prin + interest
            total += pay
            npvv += (pay * disc[t - 1]) // 10**9
        return total, npvv

    vals = sorted(set(principals))
    results = [npv(p) for p in vals]
    for (total, n), p in zip(results, vals):
        assert 0 < n < total, (p, n, total)
    for (_, n1), (_, n2) in zip(results, results[1:]):
        assert n1 < n2  # monotone in principal


@given(
    n_docs=st.integers(4, 20),
    seed=st.integers(0, 10**6),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_tfidf_rank_window_complete_and_bounded(spark, n_docs, seed):
    """Random tiny corpora: every doc with >= 1 token gets ranks
    1..min(k, distinct terms) with no gaps, and score_scaled is
    positive (df <= N makes the integer idf >= 1e6 >= 1)."""
    import random

    from etl_pipline_ibrd_loan_system_spark.operators import textstats

    rng = random.Random(seed)
    vocab = ["red", "green", "blue", "gold", "iron", "salt"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8))))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textstats.tfidf_top_terms(df, "text", "doc_id", k=3).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        assert r.score_scaled >= 1_000_000  # idf >= 1.0 in fixed point
        by_doc.setdefault(r.doc_id, []).append(r.rank)
    for i, text in docs:
        expect = min(3, len(set(text.split())))
        assert sorted(by_doc[i]) == list(range(1, expect + 1)), (i, text)
