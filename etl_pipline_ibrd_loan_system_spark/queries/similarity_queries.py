"""Similarity-search query catalog over `embeddings`.

Query set = vec_id < 10; corpus = vec_id >= 10 (disjoint, deterministic).
The IVF oracle replays the exact IVF dataflow (seeded centroids, argmax
assignment, nprobe probing, candidate re-rank) in SQL — the check proves
the distributed plan computes the same ANN answer, not that ANN equals
brute force (recall < 1 is inherent and the two queries' results can be
diffed to measure it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import similarity
from . import query


def _cos(a: str, b: str) -> str:
    return f"""
      list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))
       * sqrt(list_sum(list_transform(range(1, 65), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE))))
    """


@query(
    "sm1_cosine_topk",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE vec_id >= 10),
    scored AS (
      SELECT query_id, neighbor_id, {_cos('qv', 'cv')} AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY {_cos('qv', 'cv')} DESC, neighbor_id ASC
             ) AS rank
      FROM q CROSS JOIN c
    )
    SELECT query_id, neighbor_id, cos_sim, rank::INT AS rank
    FROM scored WHERE rank <= 5
    """,
)
def sm1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(
        emb.where(F.col("vec_id") >= 10), emb.where(F.col("vec_id") < 10),
        "vec_id", "embedding", k=5,
    )


_LLOYD_CTES, _LLOYD_FINAL = similarity.lloyd_oracle_ctes(
    "c", "vec_id", _cos, dims=64, n_centroids=8, iters=2
)


@query(
    "sm2_ivf_topk",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id >= 10),
    {_LLOYD_CTES},
    centroids AS (SELECT cent_id, cw FROM {_LLOYD_FINAL}),
    assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT c.vec_id, cent_id,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {similarity.nan_guard_sql(_cos('cv', 'cw'))} DESC, cent_id ASC
               ) AS rn
        FROM c CROSS JOIN centroids
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, cent_id FROM (
        SELECT query_id, qv, cent_id,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY {similarity.nan_guard_sql(_cos('qv', 'cw'))} DESC, cent_id ASC
               ) AS prn
        FROM q CROSS JOIN centroids
      ) WHERE prn <= 2
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, {_cos('p.qv', 'c.cv')} AS cos_sim,
             row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY {_cos('p.qv', 'c.cv')} DESC, a.vec_id ASC
             ) AS rank
      FROM probes p JOIN assign a USING (cent_id) JOIN c ON c.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank::INT AS rank
    FROM scored WHERE rank <= 5
    """,
)
def sm2_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with 2 Lloyd refinement passes; the oracle replays seed +
    both passes CTE-by-CTE (lloyd_oracle_ctes — generated from the same
    Python as the Spark expressions, integer-quantized centroid sums so
    neither engine's float reduction order can leak into the result)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb.where(F.col("vec_id") >= 10), emb.where(F.col("vec_id") < 10),
        "vec_id", "embedding", k=5, n_centroids=8, nprobe=2,
        lloyd_iters=2, dims=64,
    )


_NORM = "list_transform({v}, x -> x::DOUBLE / sqrt(list_sum(list_transform({v}, y -> y::DOUBLE * y::DOUBLE))))"
_CODE = (
    "list_transform(nv, x -> "
    "GREATEST(LEAST(floor(x * 127.0 / g), 127), -127)::BIGINT)"
)


@query(
    "sm3_int8_topk",
    sql=f"""
    WITH qn AS (SELECT vec_id AS query_id, {_NORM.format(v='embedding')} AS nv
                FROM embeddings WHERE vec_id < 10),
    cn AS (SELECT vec_id AS neighbor_id, {_NORM.format(v='embedding')} AS nv
           FROM embeddings WHERE vec_id >= 10),
    gs AS (SELECT MAX(list_max(list_transform(nv, x -> abs(x)))) AS g FROM cn),
    qc AS (SELECT neighbor_id, {_CODE} AS cq FROM cn, gs),
    qq AS (SELECT query_id, {_CODE} AS qv8 FROM qn, gs),
    scored AS (
      SELECT query_id, neighbor_id,
             list_sum(list_transform(range(1, 65), i -> qv8[i] * cq[i]))::BIGINT
               AS int_score,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_sum(list_transform(range(1, 65), i -> qv8[i] * cq[i])) DESC,
                        neighbor_id ASC
             ) AS rank
      FROM qq CROSS JOIN qc
    )
    SELECT query_id, neighbor_id, int_score, rank::INT AS rank
    FROM scored WHERE rank <= 5
    """,
)
def sm3_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized similarity search: symmetric int8 codes over
    L2-normalized vectors + integer dot-product ranking
    (similarity.int8_topk). The integer scores make the oracle
    comparison trivially exact — and diffing sm3 against sm1 measures
    the quantization recall loss the same way sm2 measures IVF recall
    (tests/test_similarity.py pins recall >= 0.9)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.int8_topk(
        emb.where(F.col("vec_id") >= 10), emb.where(F.col("vec_id") < 10),
        "vec_id", "embedding", k=5,
    )
