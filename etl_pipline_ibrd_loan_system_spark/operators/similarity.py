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
    corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str,
    keep_vec: bool = False,
) -> DataFrame:
    """Assign each corpus vector to its argmax-cosine centroid via
    groupBy(min(struct(-cos, cent_id))) — partial aggregation runs
    map-side, so the shuffle carries one row per corpus vector.
    `centroids` must expose (cent_id, cw: array<double>).
    `keep_vec=True` also carries the vector through (for Lloyd updates),
    avoiding a second join back to the corpus."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cent = centroids.select("cent_id", "cw")
    scored = c.join(F.broadcast(cent)).select(
        id_col, "v", "cent_id", cosine(F.col("v"), F.col("cw")).alias("cos")
    )
    aggs = [
        F.min(F.struct((-F.col("cos")).alias("neg"), F.col("cent_id"))).alias("b")
    ]
    if keep_vec:
        aggs.append(F.first("v").alias("v"))  # constant within the group
    best = scored.groupBy(id_col).agg(*aggs)
    cols = [F.col(id_col), F.col("b.cent_id").alias("cent_id")]
    if keep_vec:
        cols.append(F.col("v"))
    return best.select(*cols)


# Lloyd centroid updates, cross-engine exact. A float mean would make the
# result depend on each engine's reduction ORDER; instead the new centroid
# is the element-wise INTEGER sum of FLOOR(x * 2^20) over the cell's
# members: floor has no rounding tie to break (unlike double->decimal
# casts, where Spark rounds HALF_UP and DuckDB half-even), integer sums
# are associative, and cosine is scale-invariant so the un-normalized sum
# ranks identically to the mean. Quantization is 2^-20 per component —
# irrelevant for clustering, identical in both engines.
LLOYD_SCALE = 1 << 20


def _lloyd_sum_expr(dims: int) -> str:
    """ONE parsed expression (py4j-cheap): array of per-dim integer sums."""
    terms = ", ".join(
        f"CAST(SUM(FLOOR(element_at(v, {i + 1}) * {LLOYD_SCALE}.0)) AS DOUBLE)"
        for i in range(dims)
    )
    return f"array({terms})"


def _lloyd_sum_sql(dims: int) -> str:
    """DuckDB replay of _lloyd_sum_expr (FLOOR yields DOUBLE there, so cast
    to BIGINT pre-sum to keep the reduction in integer space)."""
    terms = ", ".join(
        f"CAST(SUM(CAST(FLOOR(cv[{i + 1}]::DOUBLE * {LLOYD_SCALE}.0) AS BIGINT)) AS DOUBLE)"
        for i in range(dims)
    )
    return f"[{terms}]"


def lloyd_iterate(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    dims: int,
    iters: int = 1,
) -> DataFrame:
    """Refine (cent_id, cw) centroids with `iters` k-means passes. Each
    pass is one broadcast-join assignment (map-side-combined argmax) plus
    one `dims`-wide aggregation — no collect, no window over the corpus.
    A cell that captures no vectors keeps its previous centroid."""
    cent = centroids
    for _ in range(iters):
        assigned = ivf_assign(corpus, cent, id_col, "v", keep_vec=True)
        sums = assigned.groupBy("cent_id").agg(
            F.expr(_lloyd_sum_expr(dims)).alias("sw")
        )
        cent = cent.join(sums, "cent_id", "left").select(
            "cent_id", F.coalesce(F.col("sw"), F.col("cw")).alias("cw")
        )
        # pin each pass (a k-row table): otherwise pass t+1's broadcast
        # re-executes pass t's whole assignment, and the final downstream
        # consumers re-execute the entire chain once per use
        cent = cent.localCheckpoint(eager=True)
    return cent


def lloyd_oracle_ctes(
    corpus_cte: str,
    id_col: str,
    cos_fn,
    dims: int,
    n_centroids: int,
    iters: int,
) -> tuple[str, str]:
    """DuckDB CTE chain replaying seed + `iters` Lloyd passes — generated
    from the same loop shape as lloyd_iterate so the two engines cannot
    drift. Returns (ctes_sql, final_centroid_cte_name); `corpus_cte` must
    expose ({id_col}, cv)."""
    ctes = [
        f"""cent_0 AS (
      SELECT {id_col} AS cent_id, list_transform(cv, x -> x::DOUBLE) AS cw
      FROM {corpus_cte} ORDER BY {id_col} LIMIT {n_centroids}
    )"""
    ]
    for t in range(iters):
        prev, nxt = f"cent_{t}", f"cent_{t + 1}"
        ctes.append(f"""assign_{t} AS (
      SELECT {id_col}, cv, cent_id FROM (
        SELECT c.{id_col}, c.cv, p.cent_id,
               row_number() OVER (
                 PARTITION BY c.{id_col}
                 ORDER BY {cos_fn('c.cv', 'p.cw')} DESC, p.cent_id ASC
               ) AS rn
        FROM {corpus_cte} c CROSS JOIN {prev} p
      ) WHERE rn = 1
    )""")
        ctes.append(f"""sums_{t} AS (
      SELECT cent_id, {_lloyd_sum_sql(dims)} AS sw
      FROM assign_{t} GROUP BY cent_id
    )""")
        ctes.append(f"""{nxt} AS (
      SELECT p.cent_id, COALESCE(s.sw, p.cw) AS cw
      FROM {prev} p LEFT JOIN sums_{t} s USING (cent_id)
    )""")
    return ",\n    ".join(ctes), f"cent_{iters}"


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    lloyd_iters: int = 0,
    dims: int = 64,
) -> DataFrame:
    """IVF ANN: centroids seeded from the first `n_centroids` corpus
    vectors by id (deterministic), then refined with `lloyd_iters`
    k-means passes (lloyd_iterate — each pass is one more
    map-side-combined assignment, still collect-free). Seed-only
    (lloyd_iters=0) keeps the old degenerate behavior for comparison."""
    corpus_v = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cent = (
        corpus_v.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col("v").alias("cw"))
    )
    if lloyd_iters:
        # lloyd_iterate pins each pass, so the two downstream broadcasts
        # read a k-row checkpoint instead of replaying the passes
        cent = lloyd_iterate(corpus_v, cent, id_col, dims, lloyd_iters)
    assign = ivf_assign(corpus_v, cent, id_col, "v")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
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
