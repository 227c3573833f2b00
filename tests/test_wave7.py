"""Property tests for the round-6 seventh-wave operators, beyond the
oracle hash checks: CDC edit locality, MMR diversity, negative-sample
soundness, running-distinct consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.operators import (
    sampling,
    similarity,
    textprep,
)

SF = "/root/testdata/sf0.001"


def _chunks(spark, text: str):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = textprep.content_defined_chunks(df, "text", "doc_id").collect()
    return [r["chunk_md5"] for r in sorted(rows, key=lambda r: r["chunk_idx"])]


def test_cdc_edit_locality(spark):
    """The content-defined selling point: a one-char edit re-chunks only
    its neighborhood, while fixed-size blocking shifts every downstream
    block. The shared-suffix length must be large."""
    base = ("the quick brown fox jumps over the lazy dog " * 12).strip()
    edited = base[:10] + "X" + base[10:]  # INSERTION: shifts all downstream bytes
    a, b = _chunks(spark, base), _chunks(spark, edited)
    # suffix chunks realign after the edited neighborhood
    suffix = 0
    while suffix < min(len(a), len(b)) and a[-1 - suffix] == b[-1 - suffix]:
        suffix += 1
    assert suffix >= len(a) - 3, (len(a), len(b), suffix)
    # fixed 32-char blocks would NOT realign: every block after the edit
    # shifts by one char. Sanity-check the contrast.
    fixed_a = {base[i : i + 32] for i in range(0, len(base), 32)}
    fixed_b = {edited[i : i + 32] for i in range(0, len(edited), 32)}
    assert len(fixed_a & fixed_b) <= 1


def test_cdc_identical_passage_same_chunks(spark):
    """The same passage embedded at different offsets yields the same
    interior chunk hashes (what makes the md5 stream a dedup key)."""
    # aperiodic passage: a periodic one can miss every boundary residue
    passage = " ".join(f"w{(i * i) % 97}x{i}" for i in range(80))
    a = _chunks(spark, "PREFIX-A " + passage + " SUFFIX-A")
    b = _chunks(spark, "a totally different and much longer prefix text " + passage + " other tail")
    shared = set(a) & set(b)
    assert len(shared) >= max(len(a), len(b)) // 3, (len(a), len(b), len(shared))


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_mmr_diversity_vs_topk(spark, emb):
    """MMR's selected set must be no MORE redundant than plain top-k:
    its average pairwise cosine is <= the top-k baseline's (strict on
    corpora with near-dup neighbors; equality allowed when top-k is
    already diverse)."""
    corpus = emb.where(F.col("vec_id") >= 10)
    queries = emb.where(F.col("vec_id") < 1)
    k = 5
    mmr = similarity.mmr_topk(corpus, queries, "vec_id", "embedding", k=k)
    top = similarity.cosine_topk(corpus, queries, "vec_id", "embedding", k=k)
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in corpus.select("vec_id", "embedding").collect()
    }

    def avg_pairwise(ids):
        import math

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return dot / (na * nb)

        sims = [
            cos(vecs[x], vecs[y])
            for i, x in enumerate(ids)
            for y in ids[i + 1 :]
        ]
        return sum(sims) / len(sims)

    mmr_ids = [r["vec_id"] for r in mmr.collect()]
    top_ids = [r["neighbor_id"] for r in top.collect()]
    assert avg_pairwise(mmr_ids) <= avg_pairwise(top_ids) + 1e-12


def test_negative_sample_sound(spark):
    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12)], "u bigint, i bigint"
    )
    out = sampling.negative_sample(pos, "u", "i", n_items=F.lit(20), m=8)
    rows = out.collect()
    positives = {(r["user_id"], r["item_id"]) for r in rows if r["label"] == 1}
    negatives = {(r["user_id"], r["item_id"]) for r in rows if r["label"] == 0}
    assert positives == {(1, 10), (1, 11), (2, 10), (2, 12)}
    assert not (positives & negatives)
    assert all(1 <= i <= 20 for _, i in negatives)
    # determinism: a second run regenerates the identical sample
    again = {
        (r["user_id"], r["item_id"], r["label"])
        for r in sampling.negative_sample(
            pos, "u", "i", n_items=F.lit(20), m=8
        ).collect()
    }
    assert again == {(r["user_id"], r["item_id"], r["label"]) for r in rows}


def test_running_distinct_consistency(spark):
    """e20's final per-user value must equal the plain distinct count."""
    from etl_pipline_ibrd_loan_system_spark.queries import load_registry

    q, _ = load_registry()
    out = q["e20_running_distinct"](spark, SF)
    final = out.groupBy("user_id").agg(F.max("n_types_seen").alias("got"))
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("want")
    )
    bad = final.join(want, "user_id").where(F.col("got") != F.col("want"))
    assert bad.count() == 0
