"""End-to-end corpus-preparation plan (plans/corpus_pipeline.py):
row accounting through every stage, planted near-dups collapse to one
representative, planted benchmark contamination is removed, splits are
disjoint/exhaustive and leakage-free, packed sequences respect budget."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.plans.corpus_pipeline import (
    run_corpus_pipeline,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stages(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # benchmark = two real corpus documents -> their training twins (and
    # near-verbatim dups) MUST be decontaminated away
    bench = docs.where(F.col("doc_id").isin(7, 13)).select("doc_id", "text")
    out = run_corpus_pipeline(docs, bench, decontaminate_n=5)
    counts = {k: v.count() for k, v in out.items() if k != "quality_flags"}
    return out, counts


def test_row_accounting_monotone(stages):
    out, c = stages
    assert c["normalized"] == out["normalized"].select("doc_id").distinct().count()
    assert c["quality_kept"] <= c["normalized"]
    assert c["deduped"] <= c["quality_kept"]
    assert c["decontaminated"] <= c["deduped"]
    assert c["split"] == c["decontaminated"]
    assert c["quality_kept"] > 0 and c["decontaminated"] > 0


def test_dedup_collapses_clusters(stages):
    out, c = stages
    # every near-dup cluster with >1 member loses all but one doc
    clustered = out["clusters"].groupBy("cluster_id").count().where("count > 1")
    n_extra = clustered.agg(
        F.sum(F.col("count") - 1).alias("extra")
    ).collect()[0]["extra"]
    if n_extra:
        assert c["deduped"] <= c["quality_kept"] - n_extra + 1


def test_contaminated_docs_removed(stages, spark):
    out, _ = stages
    # the benchmark docs themselves (if they survived dedup+quality)
    # must NOT appear in the decontaminated corpus
    survivors = {
        r["doc_id"]
        for r in out["decontaminated"].select("doc_id").collect()
    }
    assert 7 not in survivors and 13 not in survivors


def test_split_disjoint_exhaustive_and_leakage_free(stages):
    out, c = stages
    split = out["split"]
    by = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(by.values()) == c["split"]
    # leakage-free: every doc in a cluster shares its cluster's split
    leak = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("ns"))
        .where("ns > 1")
    )
    assert leak.count() == 0


def test_packed_sequences_respect_budget(stages):
    out, _ = stages
    packed = out["packed"]
    over = (
        packed.groupBy("pack_bucket", "seq_id")
        .agg(F.sum("n_tokens").alias("tot"))
        # greedy packing may overflow by less than one document
        .where(F.col("tot") >= 256 * 2)
    )
    assert over.count() == 0
    assert packed.count() > 0
