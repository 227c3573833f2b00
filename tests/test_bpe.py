"""BPE tokenizer (operators/textprep.py): distributed training over the
word-frequency table and the memoized Arrow encode kernel.

The encode is iterative greedy ranking (not single-pass-SQL-expressible,
so no oracle pair): these tests pin the serial-algorithm semantics —
reconstruction, merge-rank priority, train/apply agreement, and
partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.operators.textprep import (
    bpe_encode,
    bpe_train,
)


def _docs(spark, texts, n_parts=1):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    ).repartition(n_parts)


def test_train_learns_most_frequent_pair_first(spark):
    # "ll" dominates: hello (1),全ll words
    docs = _docs(spark, ["hello hello hello yellow", "ball ball"])
    merges = bpe_train(docs, "text", 1)
    assert merges == [("l", "l")]


def test_train_merge_sequence_hand_checked(spark):
    # corpus: "aaab" x3  ->  chars a,a,a,b per word
    # iter1: (a,a) count 2*3=6 beats (a,b) 3 -> words become [aa, a, b]
    # iter2: pairs (aa,a)=3, (a,b)=3 tie -> lexicographic 'a','b' < 'aa','a'
    #        (total order: count DESC, then a, then b): 'a'<'aa' so (a,b) wins
    docs = _docs(spark, ["aaab aaab aaab"])
    merges = bpe_train(docs, "text", 2)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("a", "b")


def test_encode_reconstructs_words(spark):
    docs = _docs(spark, ["the cat sat on the mat", "a stitch in time"])
    merges = bpe_train(docs, "text", 10)
    rows = bpe_encode(docs, "text", "doc_id", merges).collect()
    originals = {0: "the cat sat on the mat", 1: "a stitch in time"}
    for r in rows:
        assert "".join(r.tokens) == originals[r.doc_id].replace(" ", "")
        assert r.n_tokens == len(r.tokens)


def test_encode_no_merges_is_characters(spark):
    docs = _docs(spark, ["ab c"])
    [row] = bpe_encode(docs, "text", "doc_id", []).collect()
    assert row.tokens == ["a", "b", "c"]


def test_encode_rank_priority(spark):
    # merges: rank0 (b,c), rank1 (a,b). On "abc": lowest rank first ->
    # (b,c) merges even though (a,b) appears earlier in the word.
    docs = _docs(spark, ["abc"])
    [row] = bpe_encode(docs, "text", "doc_id", [("b", "c"), ("a", "b")]).collect()
    assert row.tokens == ["a", "bc"]
    # reversed ranks: (a,b) wins, then nothing applies
    [row] = bpe_encode(docs, "text", "doc_id", [("a", "b"), ("b", "c")]).collect()
    assert row.tokens == ["ab", "c"]


def test_train_apply_agreement_on_training_corpus(spark):
    """Encoding the training corpus with the learned merges must equal
    the training loop's own final symbol arrays (sequential-application
    == rank-greedy application)."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quicker the better the barter",
        "pack my box with five dozen liquor jugs",
    ]
    docs = _docs(spark, texts, n_parts=3)
    merges = bpe_train(docs, "text", 15)

    # replay the training fold serially in python
    def fold(syms, a, b):
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    expect = {}
    for i, t in enumerate(texts):
        toks = []
        for w in t.lower().split():
            syms = list(w)
            for a, b in merges:
                syms = fold(syms, a, b)
            toks += syms
        expect[i] = toks

    rows = bpe_encode(docs, "text", "doc_id", merges).collect()
    for r in rows:
        assert r.tokens == expect[r.doc_id], f"doc {r.doc_id}"


def test_encode_partition_invariance(spark):
    texts = ["alpha beta gamma delta"] * 7 + ["epsilon zeta eta theta"] * 5
    merges = bpe_train(_docs(spark, texts), "text", 8)
    one = {
        r.doc_id: r.tokens
        for r in bpe_encode(_docs(spark, texts, 1), "text", "doc_id", merges).collect()
    }
    many = {
        r.doc_id: r.tokens
        for r in bpe_encode(_docs(spark, texts, 8), "text", "doc_id", merges).collect()
    }
    assert one == many
