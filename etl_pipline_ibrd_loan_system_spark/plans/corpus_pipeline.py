"""End-to-end pretraining-corpus preparation plan — the LLM-pipeline
counterpart of plans/loan_pipeline.py: one composed lineage through the
operator families the registry proves individually.

    raw documents
      -> Unicode NFC normalization          (textprep.unicode_normalize)
      -> Gopher quality gate                (textprep.gopher_rules)
      -> MinHash near-dup pairs             (dedup.minhash_dedup_pairs)
         -> connected components            (dedup.connected_components)
         -> one representative per cluster  (dedup.select_representatives)
      -> benchmark n-gram decontamination   (textprep.ngram_decontaminate)
      -> leakage-free cluster-aware split   (sampling.cluster_split)
      -> token-budget sequence packing      (sampling.pack_sequences,
                                             train split only)

Everything stays ONE lazy DataFrame lineage until the caller acts — the
same single-lifecycle discipline the loan pipeline applies to the
reference's XCom-fragmented DAG (SURVEY §3.1). Plan-shape inventory at
100 TB: two Arrow kernel passes (normalize) and three pure projections
(quality, split, packing buckets) that pipeline into the scan; the only
shuffles are the dedup family's banded joins and the (tiny) cluster-map
joins; the benchmark gram set broadcasts. Every stage's operator is
oracle-checked on its own registry query (tx18, tx19, dd3, dd8, dd10,
dc1, sp4, pk1) — the plan adds the COMPOSITION, tested end-to-end with
row accounting in tests/test_corpus_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup, sampling, textprep

__all__ = ["run_corpus_pipeline"]


def run_corpus_pipeline(
    docs: DataFrame,
    bench: DataFrame,
    *,
    minhash_threshold: float = 0.8,
    decontaminate_n: int = 5,
    pack_budget: int = 256,
    pack_buckets: int = 8,
) -> dict[str, DataFrame]:
    """Compose the corpus-prep stages over a `documents`-shaped frame
    (doc_id, text, lang, source, n_chars) and a benchmark frame
    (doc_id, text). Returns every stage's DataFrame so callers can
    persist, count, or extend any point of the lineage:

    normalized / quality_flags / quality_kept / neardup_pairs /
    clusters / deduped / decontaminated / split / packed
    """
    normalized = textprep.unicode_normalize(docs, "text", form="NFC")

    flags = textprep.gopher_rules(normalized, "text", "doc_id")
    quality_kept = normalized.join(
        flags.where(F.col("keep")).select("doc_id"), "doc_id"
    )

    pairs = dedup.minhash_dedup_pairs(
        quality_kept,
        "text",
        "doc_id",
        n=3,
        k=64,
        bands=16,
        rows_per_band=4,
        threshold=minhash_threshold,
    )
    clusters = dedup.connected_components(pairs)
    reps = dedup.select_representatives(
        quality_kept, clusters, "doc_id", quality_col="n_chars"
    )
    deduped = quality_kept.join(
        reps.select(F.col("rep_doc_id").alias("doc_id")), "doc_id"
    )

    decontaminated = textprep.ngram_decontaminate(
        deduped, bench, "text", "doc_id", n=decontaminate_n
    )

    split = sampling.cluster_split(decontaminated, clusters, "doc_id")

    train = split.where(F.col("split") == "train").select(
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    packed = sampling.pack_sequences(
        train, "doc_id", "n_tokens", budget=pack_budget, n_buckets=pack_buckets
    )

    return {
        "normalized": normalized,
        "quality_flags": flags,
        "quality_kept": quality_kept,
        "neardup_pairs": pairs,
        "clusters": clusters,
        "deduped": deduped,
        "decontaminated": decontaminated,
        "split": split,
        "packed": packed,
    }
