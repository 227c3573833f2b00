"""Feature-hashing TF vectors: counts, determinism, and the stateless
text-ANN composition (hashing_tf -> random_project -> cosine_topk)."""

from __future__ import annotations



def test_hashing_tf_composes_into_text_ann(spark):
    """End-to-end text ANN from stateless pieces: hashing_tf -> JL
    random_project -> cosine_topk. Exact-duplicate texts have identical
    TF vectors, hence identical projections, hence cosine 1 — the
    duplicate must rank first in BOTH full and reduced space."""
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.operators import (
        similarity,
        textstats,
    )

    corpus_rows = [
        (10, "spark joins tables with hash partitioning"),
        (11, "ducks swim on the calm lake at dawn"),
        (12, "window functions rank rows within groups"),
        (13, "the cat sat on the warm mat"),
    ]
    query_rows = [
        (1, "spark joins tables with hash partitioning"),  # dup of 10
        (2, "window functions rank rows within groups"),   # dup of 12
    ]
    docs = spark.createDataFrame(corpus_rows + query_rows,
                                 "doc_id long, text string")
    vecs = textstats.hashing_tf(docs, "text", "doc_id", dim=64).select(
        "doc_id", F.col("tf_vec").cast("array<double>").alias("v")
    )
    corpus = vecs.where("doc_id >= 10")
    queries = vecs.where("doc_id < 10")
    top_full = similarity.cosine_topk(corpus, queries, "doc_id", "v", k=1)
    got = {r.query_id: r.neighbor_id for r in top_full.collect()}
    assert got == {1: 10, 2: 12}
    top_reduced = similarity.rp_shortlist_topk(
        corpus, queries, "doc_id", "v", k=1, d_out=16, shortlist=3
    )
    got_r = {r.query_id: r.neighbor_id for r in top_reduced.collect()}
    assert got_r == {1: 10, 2: 12}


def test_hashing_tf_counts_and_determinism(spark):
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r.tf_vec for r in
           textstats.hashing_tf(docs, "text", "doc_id", dim=8).collect()}
    assert sum(out[1]) == 4 and max(out[1]) >= 3  # 'a' x3 share a bucket
    assert sum(out[2]) == 0 and len(out[2]) == 8  # empty doc: zero vector
    again = {r.doc_id: r.tf_vec for r in
             textstats.hashing_tf(docs, "text", "doc_id", dim=8).collect()}
    assert out == again


def test_kneser_ney_counts_hand_example(spark):
    """'san francisco' example: 'francisco' is frequent as a unigram but
    only ever follows 'san' — its continuation count (1) must be tiny
    relative to its unigram count, which is the whole point of KN."""
    from etl_pipline_ibrd_loan_system_spark.operators.textstats import (
        kneser_ney_counts,
    )

    docs = spark.createDataFrame(
        [
            ("san francisco",),
            ("san francisco",),
            ("san francisco",),
            ("new york",),
            ("york hotel",),
            ("new hotel",),
        ],
        ["text"],
    )
    rows = {r["word"]: r for r in kneser_ney_counts(docs, "text").collect()}
    # bigram types: (san,francisco) c=3, (new,york) c=1, (york,hotel) c=1,
    # (new,hotel) c=1  -> n_types=4, n1=3, n2=0 -> D = 3/3 = 1.0
    assert rows["francisco"]["unigram_ct"] == 3
    assert rows["francisco"]["continuation_types"] == 1   # only after 'san'
    assert rows["francisco"]["context_types"] == 0        # never a context
    assert rows["francisco"]["pcont"] == 0.25             # 1/4 types
    assert rows["york"]["continuation_types"] == 1
    assert rows["york"]["context_types"] == 1
    assert rows["hotel"]["continuation_types"] == 2       # after york AND new
    assert rows["hotel"]["pcont"] == 0.5
    assert rows["san"]["continuation_types"] == 0
    assert all(r["discount"] == 1.0 for r in rows.values())


def test_rrf_fusion_rewards_presence_in_both_lists(spark, sf_dir):
    """A doc ranked in both arms must outscore a doc holding the same
    rank in only one arm; scores follow 1/(60+r) exactly."""
    import __spark_entry__ as entry

    rows = entry.queries()["iv6_rrf_fusion"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        expect = (1 / (60 + r.rank_lex) if r.rank_lex else 0.0) + (
            1 / (60 + r.rank_sem) if r.rank_sem else 0.0
        )
        assert r.rrf_score == expect
    # descending fused order with doc_id tiebreak
    scores = [(-r.rrf_score, r.doc_id) for r in rows]
    assert scores == sorted(scores)


def test_holt_fold_matches_hand_recursion(spark, sf_dir):
    """m26's fixed-point Holt fold reproduces the hand recursion
    (alpha=beta=1/2, truncating halves) on the real per-segment series,
    and forecast_h = level + h*trend exactly."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table

    out = entry.queries()["m26_holt_forecast"](spark, sf_dir).collect()
    assert len(out) == 15  # 5 segments x 3 horizons
    by_seg = {}
    for r in out:
        by_seg.setdefault(r.segment, {})[r.h] = r
        assert r.forecast_units == r.level_units + r.h * r.trend_units
        assert r.forecast == r.forecast_units / 1_000_000

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("m"),
        )
        .count()
        .collect()
    )
    series = {}
    for r in monthly:
        series.setdefault(r.seg, []).append((r.m, r["count"]))

    def trunc2(a):
        return -((-a) // 2) if a < 0 else a // 2

    for seg, pts in series.items():
        xs = [x * 1_000_000 for _, x in sorted(pts)]
        l = b = 0
        for i, x in enumerate(xs):
            if i == 0:
                l, b = x, 0
            else:
                nl = trunc2(x + l + b)
                b = trunc2(nl - l + b)
                l = nl
        assert by_seg[seg][1].level_units == l
        assert by_seg[seg][1].trend_units == b


def test_vocab_growth_partitions_vocabulary_exactly(spark, sf_dir):
    """Every distinct corpus token is counted in exactly one bucket
    (its first-occurrence bucket); cumulative columns are exact running
    sums and the final cum_vocab equals the independent distinct-token
    count."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table

    rows = sorted(
        entry.queries()["tx27_vocab_growth"](spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = F.explode(
        F.array_distinct(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        )
    )
    n_vocab = docs.select(toks.alias("t")).distinct().count()
    assert sum(r.new_tokens for r in rows) == n_vocab
    assert rows[-1].cum_vocab == n_vocab
    cv = ct = 0
    for r in rows:
        cv += r.new_tokens
        ct += r.tok_occurrences
        assert r.cum_vocab == cv
        assert r.cum_tokens == ct


def test_tfidf_top_terms_hand_example(spark):
    """3-doc corpus: the exact integer formula tf * ((N*1e6) div df),
    rank ordering, tie-break on term, and the rank<=k cut all match a
    hand computation."""
    from etl_pipline_ibrd_loan_system_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "common cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = textstats.tfidf_top_terms(docs, "text", "doc_id", k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}

    # df: apple 1, banana 2, cherry 2, common 3, date 1; N = 3
    def score(tf, df):
        return tf * ((3 * 1_000_000) // df)

    # doc 1: apple tf=2 df=1 -> 6e6; banana 1,2 -> 1.5e6; common 1,3 -> 1e6
    assert rows[(1, 1)].term == "apple" and rows[(1, 1)].score_scaled == score(2, 1)
    assert rows[(1, 2)].term == "banana" and rows[(1, 2)].score_scaled == score(1, 2)
    # doc 2: banana and cherry tie at score(1,2) -> term asc: banana first
    assert rows[(2, 1)].term == "banana"
    assert rows[(2, 2)].term == "cherry"
    # doc 3: date tf=1 df=1 -> 3e6 beats cherry tf=2 df=2 -> 3e6? equal:
    # score(1,1) = 3e6 == score(2,2) = 3e6 -> tie, cherry < date wins rank 1
    assert rows[(3, 1)].term == "cherry" and rows[(3, 1)].tf == 2
    assert rows[(3, 2)].term == "date"
    # k=2 cut: exactly 2 rows per doc
    assert out.count() == 6


def test_related_terms_lift_hand_example(spark):
    """4-doc corpus: the integer lift formula, symmetric emission, df
    banding (hapax 'solo' excluded), and tie-breaks match hand math."""
    from etl_pipline_ibrd_loan_system_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "coffee milk"),
            (2, "coffee milk sugar"),
            (3, "coffee sugar"),
            (4, "tea solo sugar"),
        ],
        "doc_id long, text string",
    )
    out = textstats.related_terms(
        docs, "text", "doc_id", k=2, min_df=2, max_df_frac=0.8
    )
    rows = {(r.term, r.related): r for r in out.collect()}

    # df: coffee 3, milk 2, sugar 3; tea/solo df=1 -> banded out
    # n_ab: (coffee,milk)=2, (coffee,sugar)=2, (milk,sugar)=1; N=4
    def lift(n_ab, da, db):
        return (n_ab * 4 * 1_000_000) // (da * db)

    assert rows[("coffee", "milk")].lift_scaled == lift(2, 3, 2)
    assert rows[("milk", "coffee")].lift_scaled == lift(2, 3, 2)
    assert rows[("coffee", "sugar")].lift_scaled == lift(2, 3, 3)
    # milk's best related is coffee (1333333) over sugar (666666)
    assert rows[("milk", "coffee")].rank == 1
    assert rows[("milk", "sugar")].rank == 2
    # banded-out terms appear nowhere
    assert not any("tea" in k or "solo" in k for k in rows)
