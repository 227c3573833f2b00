"""Dataset-prep operator tests: repetition filter, PII scrub, chunking,
splits/sampling, sequence packing, TF-IDF, binned range join.

Oracle value-parity is covered by tools/selfcheck + the driver gate;
these tests pin the PROPERTIES and the PHYSICAL PLANS the oracle can't
see: chunk coverage, split stability under corpus growth, packing budget
invariants, and the range join compiling to a hash equi-join instead of
a nested loop.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.catalog import load_table
from etl_pipline_ibrd_loan_system_spark.operators import (
    rangejoin,
    sampling,
    textprep,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- textprep


def test_repetition_signals_detect_repeated_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six seven"),
            (3, "x"),  # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in textprep.repetition_signals(df, "text", "doc_id").collect()
    }
    assert rows[1]["dup_ngram_frac"] == pytest.approx(0.8)  # 5 bigrams, 1 distinct
    assert not rows[1]["keep"]
    assert rows[2]["dup_ngram_frac"] == 0.0
    assert rows[2]["keep"]
    assert rows[3]["n_ngrams"] == 0
    assert rows[3]["dup_ngram_frac"] is None
    assert rows[3]["keep"]  # too short to measure, not evidence of spam


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail Bob@Example.com or call +1 (555) 123-4567 now")],
        "doc_id long, text string",
    )
    row = textprep.pii_scrub(df, "text", "doc_id", textprep.PII_PATTERNS).collect()[0]
    assert row["n_email"] == 1
    assert row["n_phone"] == 1
    assert "<EMAIL>" in row["scrubbed"] and "<PHONE>" in row["scrubbed"]
    assert "example.com" not in row["scrubbed"]
    assert "555" not in row["scrubbed"]


def test_chunks_cover_every_token_and_respect_size(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    chunk, stride = 16, 12
    out = textprep.chunk_by_tokens(docs, "text", "doc_id", chunk, stride)
    stats = (
        out.groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("max_n"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max(F.size(F.split("chunk_text", " "))).alias("max_words"),
        )
        .join(
            docs.select(
                "doc_id",
                F.size(
                    F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
                ).alias("n_toks"),
            ),
            "doc_id",
        )
        .collect()
    )
    assert stats
    for r in stats:
        assert r["max_n"] <= chunk and r["max_words"] <= chunk
        # every token covered: k chunks at stride s reach (k-1)*s + chunk
        assert (r["n_chunks"] - 1) * stride + chunk >= r["n_toks"]

    def test_stride_gap_rejected():
        with pytest.raises(ValueError):
            textprep.chunk_by_tokens(docs, "text", "doc_id", chunk=8, stride=9)

    test_stride_gap_rejected()


def test_tfidf_topk_ranks_group_heavy_terms_first(spark):
    df = spark.createDataFrame(
        [
            (1, "g1", "aaa aaa aaa common"),
            (2, "g1", "aaa common"),
            (3, "g2", "bbb bbb common"),
            (4, "g2", "bbb common"),
        ],
        "doc_id long, grp string, text string",
    )
    out = textprep.tfidf_topk(df, "text", "doc_id", "grp", k=1).collect()
    best = {r["grp"]: r["token"] for r in out}
    # 'common' appears in every doc (df=4) and loses to the group terms
    assert best == {"g1": "aaa", "g2": "bbb"}


# ---------------------------------------------------------------- sampling


def test_hash_split_is_stable_under_corpus_growth(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    full = sampling.hash_split(docs, "doc_id").select("doc_id", "split")
    half = sampling.hash_split(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id"
    ).select("doc_id", "split")
    # assignments of the subset rows are identical to their full-corpus ones
    moved = (
        full.alias("f")
        .join(half.alias("h"), "doc_id")
        .where(F.col("f.split") != F.col("h.split"))
        .count()
    )
    assert moved == 0
    counts = dict(full.groupBy("split").count().collect())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_cluster_split_never_straddles(spark):
    # two clusters (1-2-3 chained, 5-6) plus singletons 4 and 7
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    from etl_pipline_ibrd_loan_system_spark.operators import dedup

    clusters = dedup.connected_components(pairs)
    out = sampling.cluster_split(docs, clusters, "doc_id")
    rows = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out.collect()}
    assert len(rows) == 7
    # every cluster occupies exactly one split
    assert rows[1] == rows[2] == rows[3]
    assert rows[5] == rows[6]
    # singletons fall back to their own id as the cluster key
    assert rows[4][0] == 4 and rows[7][0] == 7
    # cluster members get the split of their CLUSTER id: member 3's
    # bucket equals what a plain hash_split would give id 1
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(docs, "doc_id").collect()
    }
    assert rows[3][1] == plain[1]
    assert rows[6][1] == plain[5]


def test_hash_split_rejects_bad_percents(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        sampling.hash_split(df, "id", {"train": 60, "test": 30})


def test_stratified_sample_fraction_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        docs, "lang", {"en": 0.25, "de": 0.5}, "doc_id", default_frac=0.75
    )
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert a == b  # rerun-identical set
    totals = dict(docs.groupBy("lang").count().collect())
    kept = dict(out.groupBy("lang").count().collect())
    # realized fraction near target (hash-uniform Bernoulli, small n: wide tol)
    for lang, frac in (("en", 0.25), ("de", 0.5)):
        if totals.get(lang, 0) >= 50:
            assert abs(kept.get(lang, 0) / totals[lang] - frac) < 0.2


def test_pack_sequences_budget_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    budget = 256
    base = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("n_tokens"),
    )
    out = sampling.pack_sequences(base, "doc_id", "n_tokens", budget, n_buckets=4)
    seqs = (
        out.groupBy("pack_bucket", "seq_id")
        .agg(F.sum("n_tokens").alias("total"), F.max("n_tokens").alias("biggest"))
        .collect()
    )
    assert seqs
    for r in seqs:
        # greedy concat-and-cut: a sequence overhangs the budget by less
        # than its last document, never more
        assert r["total"] < budget + r["biggest"]
    # every doc packed exactly once
    assert out.count() == base.count()
    # seq ids dense from 0 within each bucket
    per_bucket = out.groupBy("pack_bucket").agg(
        F.min("seq_id").alias("lo"), F.countDistinct("seq_id").alias("n"),
        F.max("seq_id").alias("hi"),
    )
    for r in per_bucket.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


# ---------------------------------------------------------------- rangejoin


def test_binned_range_join_matches_theta_join(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bands = spark.createDataFrame(
        [(0, 0.0, 10_000.0), (1, 5_000.0, 25_000.0), (2, 100.0, 1_000.0)],
        "band_id bigint, lo double, hi double",
    )
    binned = rangejoin.binned_range_join(
        lineitem, "l_extendedprice", bands, "lo", "hi", bin_width=4096.0
    )
    naive = lineitem.join(
        bands,
        (F.col("l_extendedprice") >= F.col("lo"))
        & (F.col("l_extendedprice") < F.col("hi")),
    )
    got = {
        (r["band_id"], r["n"]) for r in
        binned.groupBy("band_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        (r["band_id"], r["n"]) for r in
        naive.groupBy("band_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want and got


def test_binned_range_join_plans_as_hash_join(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bands = spark.createDataFrame(
        [(0, 0.0, 10_000.0), (1, 5_000.0, 25_000.0)],
        "band_id bigint, lo double, hi double",
    )
    plan = _plan(
        rangejoin.binned_range_join(
            lineitem, "l_extendedprice", bands, "lo", "hi", bin_width=8192.0
        )
    )
    # the whole point: an equi-join on the bin key, never a nested loop
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_binned_range_join_rejects_bad_width(spark):
    df = spark.range(1).withColumn("v", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        rangejoin.binned_range_join(df, "v", df, "id", "v", bin_width=0)


# ------------------------------------------------------------- mixing/encode


def test_mix_sources_proportions_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.mix_sources(
        docs, "source", "doc_id", {"src0": 3.0, "src2": 0.5}
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    # sorting by interleave_key: among the first K rows, weight-3 src0
    # appears ~3x as often as a weight-1 source
    ordered = sorted(rows, key=lambda r: (r["interleave_key"], r["source"]))
    head = ordered[:80]
    n_src0 = sum(r["source"] == "src0" for r in head)
    n_src1 = sum(r["source"] == "src1" for r in head)
    n_src2 = sum(r["source"] == "src2" for r in head)
    assert n_src0 > n_src1 > n_src2
    # deterministic across replans
    again = sorted(
        out.collect(), key=lambda r: (r["interleave_key"], r["source"])
    )
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in ordered]


def test_token_budget_select_respects_budget(spark):
    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        [
            (1, "a", 100, 0.9),
            (2, "a", 100, 0.8),
            (3, "a", 100, 0.7),
            (4, "b", 250, 0.5),
            (5, "b", 100, 0.4),
        ],
        "doc_id long, source string, n_tokens long, quality double",
    )
    out = sampling.token_budget_select(
        df, "source", "doc_id", "n_tokens", "quality", budget=250
    )
    kept = {r["doc_id"]: r for r in out.collect()}
    # source a: docs 1,2 fit (200 <= 250), doc 3 would exceed
    # source b: doc 4 alone fills the budget exactly; doc 5 would exceed
    assert set(kept) == {1, 2, 4}
    assert kept[2]["cum_tokens"] == 200 and kept[4]["cum_tokens"] == 250
    per_source = (
        out.groupBy("source").agg(SF.sum("n_tokens").alias("t")).collect()
    )
    assert all(r["t"] <= 250 for r in per_source)


def test_vocab_encode_ids_and_unk(spark):
    from etl_pipline_ibrd_loan_system_spark.operators.textstats import vocab_topk

    df = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa zz")],
        "doc_id long, text string",
    )
    vocab = vocab_topk(df, "text", k=2)  # aa(3), bb/cc/zz tie -> bb by token
    out = textprep.vocab_encode(df, "text", "doc_id", vocab).collect()
    by_key = {(r["doc_id"], r["pos"]): (r["token"], r["token_id"]) for r in out}
    assert by_key[(1, 0)] == ("aa", 1)
    assert by_key[(1, 1)] == ("bb", 2)
    assert by_key[(1, 3)] == ("cc", 0)  # out-of-vocab -> UNK
    assert by_key[(2, 1)] == ("zz", 0)
    # positions dense per doc, every occurrence encoded
    assert sorted(p for d, p in by_key if d == 1) == [0, 1, 2, 3]


def test_vocab_encode_plans_as_broadcast_join(spark, sf_dir):
    from etl_pipline_ibrd_loan_system_spark.operators.textstats import vocab_topk

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(
        textprep.vocab_encode(
            docs, "text", "doc_id", vocab_topk(docs, "text", k=50)
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "token stream is being shuffled"


def test_ngram_decontaminate_drops_overlapping_docs(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "xx alpha beta gamma delta yy"),   # contains a bench 4-gram
            (2, "alpha beta zz gamma delta"),      # shared words, no 4-gram
            (3, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    out = textprep.ngram_decontaminate(train, bench, "text", "doc_id", n=4)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]


def test_chunk_boilerplate_filter_flags_shared_spans(spark):
    """A 4-token banner shared by 3 docs is boilerplate; unique text is
    not; a doc that is ALL boilerplate fails the keep verdict."""
    banner = "terms of service apply"
    rows = [
        (1, banner + " unique words one two three four five six"),  # 3 chunks, 1 boiler
        (2, banner + " other rare words seven eight nine ten wow"),  # 3 chunks, 1 boiler
        (3, banner),                               # 1 chunk, all boiler
        (4, "entirely original text with no repeats"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textprep.chunk_boilerplate_filter(
            df, "text", "doc_id", chunk=4, min_docs=3
        ).collect()
    }
    assert out[1]["n_boilerplate_chunks"] == 1 and out[1]["keep"]
    assert out[2]["n_boilerplate_chunks"] == 1 and out[2]["keep"]
    assert out[3]["boilerplate_frac"] == 1.0 and not out[3]["keep"]
    assert out[4]["n_boilerplate_chunks"] == 0 and out[4]["keep"]


# ------------------------------------------------------- aho-corasick tier


def test_aho_corasick_failure_link_outputs():
    # 'hers' is reachable only through the failure chain of 'ushers' --
    # the classic case that breaks naive trie matching
    goto, fail, term = textprep._aho_corasick(["he", "she", "his", "hers"])
    assert textprep._ac_contains_any("ushers", goto, fail, term)
    assert textprep._ac_contains_any("this", goto, fail, term)
    assert textprep._ac_contains_any("she", goto, fail, term)
    assert not textprep._ac_contains_any("ut hat sit", goto, fail, term)


def test_aho_corasick_negative_and_prefix_cases():
    goto, fail, term = textprep._aho_corasick(["abcd", "bc"])
    assert textprep._ac_contains_any("xxbcxx", goto, fail, term)
    assert textprep._ac_contains_any("abcd", goto, fail, term)
    assert not textprep._ac_contains_any("abd bd acd", goto, fail, term)
    assert not textprep._ac_contains_any("", goto, fail, term)


def test_substring_decontaminate_tiers_agree(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    spans = docs.where(F.col("doc_id") % 29 == 0).select(
        F.substring("text", 5, 24).alias("span")
    )
    anti = textprep.substring_decontaminate(docs, spans, "text", "doc_id")
    ac = textprep.substring_decontaminate_ac(docs, spans, "text", "doc_id")
    a = {r["doc_id"] for r in anti.select("doc_id").collect()}
    b = {r["doc_id"] for r in ac.select("doc_id").collect()}
    assert a == b and len(a) < docs.count()


def test_exact_stratified_sample_sizes(spark):
    rows = [(i, "big") for i in range(200)] + [(1000 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.exact_stratified_sample(df, "lang", 10, "doc_id")
    sizes = dict(out.groupBy("lang").count().collect())
    # exactly k where the stratum has >= k rows, all rows otherwise
    assert sizes == {"big": 10, "small": 3}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b
    ranks = sorted(
        r["sample_rank"] for r in out.where(F.col("lang") == "big").collect()
    )
    assert ranks == list(range(1, 11))


# ------------------------------------------------- temperature_flatten


def _temp_corpus(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, src string")


def test_temperature_flatten_smallest_source_keeps_everything(spark):
    df = _temp_corpus(spark, {"big": 400, "small": 25})
    out = sampling.temperature_flatten(df, "src", "doc_id", temperature=2)
    kept = {r["src"]: r["n"] for r in
            out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert kept["small"] == 25  # rate = (25/25)^0.5 = 1: nothing dropped
    # big keeps ~sqrt(25*400)=100 in expectation (binomial, sd~9.5)
    assert 60 <= kept["big"] <= 140


def test_temperature_flatten_orders_by_temperature(spark):
    df = _temp_corpus(spark, {"big": 400, "small": 25})

    def kept_big(t):
        out = sampling.temperature_flatten(df, "src", "doc_id", temperature=t)
        return out.where(F.col("src") == "big").count()

    t1, t2, t4, tinf = kept_big(1), kept_big(2), kept_big(4), kept_big(None)
    assert t1 == 400  # identity: natural distribution untouched
    # monotone flattening: higher temperature thins large sources more
    assert t1 > t2 > t4 > tinf
    # uniform cap lands near n_min (rate = 25/400, expectation 25, sd~4.9)
    assert 5 <= tinf <= 45


def test_temperature_flatten_is_deterministic_and_validates(spark):
    df = _temp_corpus(spark, {"a": 100, "b": 10})
    one = sorted(r["doc_id"] for r in
                 sampling.temperature_flatten(df, "src", "doc_id").collect())
    two = sorted(r["doc_id"] for r in
                 sampling.temperature_flatten(df, "src", "doc_id").collect())
    assert one == two  # pure hash function of the id: rerun-stable
    with pytest.raises(ValueError, match="temperature"):
        sampling.temperature_flatten(df, "src", "doc_id", temperature=3)


def test_temperature_flatten_plan_never_shuffles_the_corpus(spark):
    df = _temp_corpus(spark, {"a": 50, "b": 5})
    plan = _plan(sampling.temperature_flatten(df, "src", "doc_id"))
    # rate table joins back as a broadcast: the corpus-side scan must not
    # hit an Exchange hashpartitioning on the way to the filter
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------- c4_line_filter


def test_c4_line_filter_full_rule_set(spark):
    """Terminal punctuation, word-count floor, line blocklist, doc-level
    blocklist and min-kept-lines — each rule exercised on a crafted doc
    (the oracle query tx33 covers the word-count/blocklist rules on the
    corpus, which has no punctuation to trigger the rest)."""
    docs = spark.createDataFrame(
        [
            (
                1,
                "A good sentence ends with a period.\n"
                "too short.\n"
                "Enable javascript to view this page.\n"
                "no terminal punctuation here\n"
                "Another proper sentence stays in place.\n"
                "And a third one survives as well.",
            ),
            (2, "This page uses lorem ipsum filler text everywhere.\n"
                "A perfectly fine sentence number two.\n"
                "A perfectly fine sentence number three.\n"
                "A perfectly fine sentence number four."),
            (3, "if (x) { return; }\n"
                "Sentence one is quite alright.\n"
                "Sentence two is quite alright.\n"
                "Sentence three is quite alright."),
            (4, "Only one surviving line in this document."),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in textprep.c4_line_filter(docs, "text", "doc_id").collect()
    }
    # doc 1: 6 lines -> period-ended, >=3-word, non-js lines survive
    assert out[1].n_lines == 6 and out[1].n_kept_lines == 3
    assert out[1].doc_kept  # 3 kept lines, no doc-level hit
    assert "javascript" not in out[1].clean_text
    assert "no terminal punctuation" not in out[1].clean_text
    assert "too short." not in out[1].clean_text  # 2 words < 3
    # doc 2: all 4 lines pass the LINE rules (the lorem line is a valid
    # sentence), but the doc-level 'lorem ipsum' rule kills the document
    assert out[2].n_kept_lines == 4 and not out[2].doc_kept
    # doc 3: brace kills the document
    assert not out[3].doc_kept
    # doc 4: clean line but below min_kept_lines
    assert out[4].n_kept_lines == 1 and not out[4].doc_kept


def test_c4_line_filter_is_pure_projection(spark):
    docs = spark.createDataFrame([(1, "One fine sentence here.")],
                                 "doc_id long, text string")
    plan = _plan(textprep.c4_line_filter(docs, "text", "doc_id"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ----------------------------------------------------------- apportionment


def test_apportion_budget_sums_exactly_and_favors_weight(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 23), ("b", 7), ("c", 1), ("d", 59)],
        "source string, w long",
    )
    out = {
        r["source"]: r
        for r in sampling.apportion_budget(df, "source", "w", budget=17).collect()
    }
    # exact-sum invariant: Hamilton never over- or under-allocates
    assert sum(r["alloc"] for r in out.values()) == 17
    # every group: floor <= alloc <= floor + 1
    for r in out.values():
        assert r["alloc"] in (r["floor_alloc"], r["floor_alloc"] + 1)
    # weights: a=33, b=7, c=1, d=59 (W=100); quotas 5.61, 1.19, 0.17, 10.03
    assert out["a"]["floor_alloc"] == 5
    assert out["d"]["floor_alloc"] == 10
    # leftover = 17 - 16 = 1 unit -> largest remainder (a, 0.61)
    assert out["a"]["alloc"] == 6
    assert out["b"]["alloc"] == 1
    assert out["c"]["alloc"] == 0
    assert out["d"]["alloc"] == 10


def test_apportion_budget_zero_leftover(spark):
    # weights divide the budget exactly: no extras anywhere
    df = spark.createDataFrame(
        [("x", 1), ("y", 3)], "source string, w long"
    )
    out = {
        r["source"]: r
        for r in sampling.apportion_budget(df, "source", "w", budget=8).collect()
    }
    assert out["x"]["alloc"] == 2 and out["x"]["extra"] == 0
    assert out["y"]["alloc"] == 6 and out["y"]["extra"] == 0


def test_priority_sample_fixed_size_and_estimates(spark):
    df = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(100)], "id long, w long"
    )
    rows = sampling.priority_sample(df, "id", "w", k=10).collect()
    assert len(rows) == 10
    tau = rows[0]["tau"]
    assert all(r["tau"] == tau for r in rows)  # one global threshold
    for r in rows:
        # every sampled priority clears tau; estimate = max(w, tau)
        assert r["priority"] >= tau
        assert r["est_weight"] == max(float(r["weight"]), tau)


def test_priority_sample_population_within_k(spark):
    # n <= k: everything sampled, tau = 0, estimates = true weights
    df = spark.createDataFrame(
        [(1, 5), (2, 9)], "id long, w long"
    )
    rows = sampling.priority_sample(df, "id", "w", k=10).collect()
    assert len(rows) == 2
    assert all(r["tau"] == 0.0 for r in rows)
    assert all(r["est_weight"] == float(r["weight"]) for r in rows)


def test_ffd_pack_matches_reference_and_respects_budget(spark):
    rows = [(i, (i * 37) % 300 + 1) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = sampling.ffd_pack(df, "doc_id", "n", budget=256, n_buckets=4)
    got = {(r["doc_id"]): (r["pack_bucket"], r["bin_id"]) for r in out.collect()}
    assert len(got) == len(rows)

    # replay FFD in pure Python per bucket using the SAME hash buckets
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for doc_id, _ in rows:
        bkt = got[doc_id][0]
        by_bucket.setdefault(bkt, []).append(
            (doc_id, dict(rows)[doc_id])
        )
    for bkt, docs in by_bucket.items():
        bins: list[int] = []
        expect: dict[int, int] = {}
        for doc_id, n in sorted(docs, key=lambda t: (-t[1], t[0])):
            for j, load in enumerate(bins):
                if load + n <= 256:
                    bins[j] += n
                    expect[doc_id] = j
                    break
            else:
                bins.append(n)
                expect[doc_id] = len(bins) - 1
        for doc_id, bin_id in expect.items():
            assert got[doc_id] == (bkt, bin_id), f"doc {doc_id}"
        # a bin only exceeds the budget when a single oversized doc
        # (n > 256 exists in this fixture: sizes reach 300) opened it
        loads: dict[int, list[int]] = {}
        for doc_id, n in docs:
            loads.setdefault(expect[doc_id], []).append(n)
        for j, members in loads.items():
            assert sum(members) <= 256 or (
                len(members) == 1 and members[0] > 256
            )


def test_ffd_never_worse_than_next_fit(spark):
    # FFD bin count <= pack_sequences' next-fit bin count per bucket
    rows = [(i, 200 if i % 2 else 56) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    ffd = sampling.ffd_pack(df, "doc_id", "n", budget=256, n_buckets=1)
    n_ffd = ffd.agg(F.countDistinct("bin_id")).collect()[0][0]
    total = sum(n for _, n in rows)
    assert n_ffd >= -(-total // 256)  # >= lower bound
    # alternating 200/56 packs perfectly under FFD (200+56=256)
    assert n_ffd == -(-total // 256)


def test_ffd_engines_agree(spark):
    rows = [(i, (i * 91) % 310 + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    a = {
        (r["doc_id"], r["pack_bucket"], r["bin_id"])
        for r in sampling.ffd_pack(
            df, "doc_id", "n", budget=256, n_buckets=4, engine="arrow"
        ).collect()
    }
    b = {
        (r["doc_id"], r["pack_bucket"], r["bin_id"])
        for r in sampling.ffd_pack(
            df, "doc_id", "n", budget=256, n_buckets=4, engine="fold"
        ).collect()
    }
    assert a == b


def test_poisson_bootstrap_weights_properties(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = sampling.poisson_bootstrap_weights(df, "doc_id", n_replicates=2)
    rows = out.collect()
    again = {
        (r["doc_id"], r["w0"], r["w1"])
        for r in sampling.poisson_bootstrap_weights(
            df, "doc_id", n_replicates=2
        ).collect()
    }
    assert {(r["doc_id"], r["w0"], r["w1"]) for r in rows} == again  # rerun-stable
    n = len(rows)
    for col in ("w0", "w1"):
        ws = [r[col] for r in rows]
        assert all(0 <= w <= 6 for w in ws)
        assert abs(sum(ws) / n - 1.0) < 0.08  # E[w] = 1
        assert sum(1 for w in ws if w == 0) / n == pytest.approx(
            0.3679, abs=0.05
        )  # P(0) = e^-1
    # replicates decorrelated: joint (0,0) frequency near e^-2
    both0 = sum(1 for r in rows if r["w0"] == 0 and r["w1"] == 0) / n
    assert both0 == pytest.approx(0.1353, abs=0.04)


def test_apportion_budget_guards_and_zero_weight_safety(spark):
    with pytest.raises(ValueError):
        sampling.apportion_budget(
            spark.createDataFrame([("a", -1)], "source string, w long"),
            "source", "w", budget=10,
        )
    with pytest.raises(ValueError):
        sampling.apportion_budget(
            spark.createDataFrame([("a", 1)], "source string, w long"),
            "source", "w", budget=-1,
        )
    # zero-weight groups never receive an extra unit
    df = spark.createDataFrame(
        [("a", 0), ("b", 3), ("c", 5)], "source string, w long"
    )
    out = {r["source"]: r for r in
           sampling.apportion_budget(df, "source", "w", budget=7).collect()}
    assert out["a"]["alloc"] == 0
    assert sum(r["alloc"] for r in out.values()) == 7


def test_dsir_importance_shifts_toward_target_vocab(spark):
    """Docs written in the target domain's vocabulary must score higher
    than off-domain docs; scores are exact integers over scale."""
    import pytest

    from etl_pipline_ibrd_loan_system_spark.operators import sampling
    from pyspark.sql import functions as F

    target_text = "loan credit repay balance interest principal term rate"
    other_text = "volcano glacier nebula quasar tundra basalt magma comet"
    rows = (
        [(i, target_text, True) for i in range(8)]
        + [(100 + i, other_text, False) for i in range(8)]
        # held-out docs, one per vocabulary, NOT in the target set
        + [(200, target_text, False), (201, other_text, False)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {
        r.doc_id: (r.score_micro, r.dsir_score)
        for r in sampling.dsir_importance(
            df, "text", "doc_id", is_target=F.col("tgt"), n_buckets=64
        ).collect()
    }
    # the held-out target-vocab doc outranks the off-domain one
    assert out[200][0] > out[201][0]
    # identical text => identical exact integer score
    assert out[200][0] == out[0][0]
    # dsir_score is exactly score_micro / scale
    for micro, score in out.values():
        assert score == micro / 1_000_000

    # the rounding-boundary guard refuses half-integer quantizations
    with pytest.raises(ValueError, match="rounding boundary"):
        sampling.guarded_log_qround(2.5, "weight[test]")
    assert sampling.guarded_log_qround(2.4999, "w") == 2


def test_woe_encoding_sign_and_iv_nonnegative(spark, sf_dir):
    """WOE sign tracks the good-share vs bad-share direction, so every
    IV contribution is non-negative (both factors share sign); counts
    partition the order population."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table

    rows = entry.queries()["fv6_woe_encoding"](spark, sf_dir).collect()
    assert len(rows) == 5  # the five order priorities
    orders = load_table(spark, sf_dir, "orders")
    assert sum(r.n_good + r.n_bad for r in rows) == orders.count()
    g = sum(r.n_good for r in rows)
    b = sum(r.n_bad for r in rows)
    for r in rows:
        share_gap = r.n_good / g - r.n_bad / b
        if abs(r.woe_micro) > 1:  # away from rounding noise
            assert (r.woe_micro > 0) == (share_gap > 0)
        assert r.iv_contrib >= -1e-12
        assert r.woe == r.woe_micro / 1_000_000


def test_mx6_epoch_upsampling_char_accounting(spark, sf_dir):
    """Per domain, emitted characters (sum n_repeats * n_chars) must
    land within ONE document of the apportioned target, and the
    apportioned targets must sum to exactly the 3x-corpus budget —
    the two invariants that make repetition-based mixing exact."""
    from pyspark.sql import functions as F

    from etl_pipline_ibrd_loan_system_spark.catalog import load_table
    from etl_pipline_ibrd_loan_system_spark.queries import load_registry

    qs, _ = load_registry()
    docs = load_table(spark, sf_dir, "documents")
    out = qs["mx6_epoch_upsampling"](spark, sf_dir)
    joined = out.join(docs.select("doc_id", "n_chars"), "doc_id")
    emitted = {
        r.source: (r.emitted, r.max_chars)
        for r in joined.groupBy("source")
        .agg(
            F.sum(F.col("n_repeats") * F.col("n_chars")).alias("emitted"),
            F.max("n_chars").alias("max_chars"),
        )
        .collect()
    }
    # recompute the apportioned targets independently
    per = {
        r.source: (r.w, r.chars)
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("w"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    budget = 3 * sum(c for _, c in per.values())
    tot_w = sum(w for w, _ in per.values())
    floors = {s: (budget * w) // tot_w for s, (w, _) in per.items()}
    rems = {s: (budget * w) % tot_w for s, (w, _) in per.items()}
    leftover = budget - sum(floors.values())
    order = sorted(per, key=lambda s: (-rems[s], s))
    target = {
        s: floors[s] + (1 if i < leftover else 0)
        for i, s in enumerate(order)
    }
    assert sum(target.values()) == budget
    for s, (em, mx) in emitted.items():
        t = target[s]
        assert t - mx <= em <= t + mx, (s, em, t, mx)
        assert em >= 0
