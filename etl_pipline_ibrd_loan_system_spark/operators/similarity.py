"""Similarity search over embedding columns (array<float>).

Not reference-derived — the ANN family a training-data pipeline needs.
Two paths, both pure DataFrame ops (cosine via zip_with/aggregate
higher-order functions, JVM-side; no UDFs):

- cosine_topk      brute-force exact top-k: broadcast the (small) query
                   set against the (huge) corpus — ONE corpus scan, then
                   a single shuffle of (qid, cid, score) triples for the
                   per-query window. The corpus side never re-partitions.
- ivf_topk         inverted-file ANN: deterministic seeded centroids,
                   map-side-combined argmax assignment (min-struct trick,
                   no window over the corpus), probe `nprobe` cells per
                   query, exact re-rank inside candidates only. At 100 TB
                   the corpus->centroid agg is the only full pass; search
                   touches ~nprobe/C of the data.

Tie-breaking is pinned (score desc, id asc) so results are deterministic
and oracle-replayable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cos_sim)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign each corpus vector to its argmax-cosine centroid via
    groupBy(min(struct(-cos, cent_id))) — partial aggregation runs
    map-side, so the shuffle carries one row per corpus vector."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cent = centroids.select(
        F.col("cent_id"), F.col(vec_col).cast("array<double>").alias("cw")
    )
    scored = c.join(F.broadcast(cent)).select(
        id_col, "v", "cent_id", cosine(F.col("v"), F.col("cw")).alias("cos")
    )
    best = (
        scored.groupBy(id_col)
        .agg(F.min(F.struct((-F.col("cos")).alias("neg"), F.col("cent_id"))).alias("b"))
        .select(F.col(id_col), F.col("b.cent_id").alias("cent_id"))
    )
    return best


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN: centroids seeded from the first `n_centroids` corpus
    vectors by id (deterministic; a production build would run Lloyd
    iterations — the dataflow is identical, each iteration is one more
    map-side-combined assignment pass)."""
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col))
    )
    assign = ivf_assign(corpus, centroids, id_col, vec_col)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    cent = centroids.select(
        "cent_id", F.col(vec_col).cast("array<double>").alias("cw")
    )
    qw = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cent_id"))
    probes = (
        q.join(F.broadcast(cent))
        .select("query_id", "qv", "cent_id", cosine(F.col("qv"), F.col("cw")).alias("qcos"))
        .withColumn("prn", F.row_number().over(qw))
        .where(F.col("prn") <= nprobe)
        .select("query_id", "qv", "cent_id")
    )

    cand = assign.join(
        F.broadcast(probes), "cent_id"
    )  # corpus side stays put; probes are tiny
    cv = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("cv")
    )
    scored = cand.join(cv, id_col).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
