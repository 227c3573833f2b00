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


_RP_COORDS = ",\n           ".join(
    f"{similarity.rp_oracle_expr(j, 64, 'embedding', 16)} AS c{j}"
    for j in range(16)
)


@query(
    "rp1_random_projection",
    sql=f"""
    WITH proj AS (
      SELECT vec_id,
           {_RP_COORDS}
      FROM embeddings
    )
    SELECT vec_id, dim::BIGINT AS dim, rp_value
    FROM proj
    UNPIVOT (rp_value FOR dim IN ({", ".join(f"c{j} AS '{j}'" for j in range(16))}))
    """,
)
def rp1_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss 64->16 compression of the embedding corpus,
    exploded to (vec_id, dim, rp_value) rows so the gate hashes scalar
    doubles. The oracle regenerates the SAME ±1 matrix from the md5 salt
    and replays each coordinate's left-to-right signed fold — the check
    is bit-exact, not approximate; the JL distance-preservation bound is
    property-tested in tests/test_similarity.py against sm1's exact
    neighbors. Zero shuffle: the projection is a per-row expression and
    the matrix lives in the plan as literals."""
    emb = load_table(spark, sf_dir, "embeddings")
    reduced = similarity.random_project(emb, "vec_id", "embedding", 64, 16)
    return reduced.select(
        "vec_id", F.posexplode("rp_vec").alias("dim", "rp_value")
    ).select(F.col("vec_id"), F.col("dim").cast("bigint").alias("dim"), "rp_value")


def _cosn(a: str, b: str, n: int) -> str:
    """Cosine over n-dim DOUBLE lists — same fold order as dedup.cosine."""
    return f"""
      list_sum(list_transform(range(1, {n + 1}), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(range(1, {n + 1}), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))
       * sqrt(list_sum(list_transform(range(1, {n + 1}), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE))))
    """


def _rp_list(vec: str, d_out: int) -> str:
    """The full reduced vector as a DuckDB list literal of rp coordinates."""
    return "[" + ", ".join(
        similarity.rp_oracle_expr(j, 64, vec, d_out) for j in range(d_out)
    ) + "]"


@query(
    "rp2_jl_rerank_topk",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE vec_id >= 10),
    qp AS (SELECT query_id, qv, {_rp_list('qv', 32)} AS qr FROM q),
    cp AS (SELECT neighbor_id, cv, {_rp_list('cv', 32)} AS cr FROM c),
    short AS (
      SELECT query_id, neighbor_id, qv, cv,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY {_cosn('qr', 'cr', 32)} DESC, neighbor_id ASC
             ) AS srank
      FROM qp CROSS JOIN cp
    ),
    rer AS (
      SELECT query_id, neighbor_id, {_cos('qv', 'cv')} AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY {_cos('qv', 'cv')} DESC, neighbor_id ASC
             ) AS rank
      FROM short WHERE srank <= 100
    )
    SELECT query_id, neighbor_id, cos_sim, rank::INT AS rank
    FROM rer WHERE rank <= 5
    """,
)
def rp2_jl_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL shrink-then-verify ANN: 100-candidate shortlist per query in
    32-dim hash-projected space, exact 64-dim cosine re-rank of the
    candidates. The oracle replays the ENTIRE dataflow — the same ±1
    matrix regenerated from the md5 salt, the same reduced-space ranking,
    the same re-rank — so the check proves the distributed plan computes
    this ANN answer exactly (like sm2's IVF replay); recall vs the exact
    sm1 answer is the property test's job (0.80 on structureless random
    vectors at sf0.01, deterministic because nothing is sampled at
    runtime)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.rp_shortlist_topk(
        emb.where(F.col("vec_id") >= 10), emb.where(F.col("vec_id") < 10),
        "vec_id", "embedding", k=5, d_out=32, shortlist=100,
    )


def _mmr_oracle(k: int = 5, shortlist: int = 20) -> str:
    """Unrolled greedy MMR as k CTE stages (the g5 unrolled-frontier
    recipe): stage i picks argmax of 0.7*rel - 0.3*max(sim to the i-1
    already-selected) among the not-yet-selected shortlist, ties on
    ascending id. Literal weights 0.7/0.3 match the operator's explicit
    lam/mu (1-0.7 would round differently)."""
    parts = [f"""
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id AS nid, embedding AS cv
          FROM embeddings WHERE vec_id >= 10),
    scored AS (SELECT query_id, nid, {_cos('qv', 'cv')} AS rel FROM q, c),
    sl AS (SELECT query_id, nid, rel FROM (
             SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY rel DESC, nid ASC) AS rn
             FROM scored) WHERE rn <= {shortlist}),
    sim AS (SELECT s1.query_id, s1.nid AS aid, s2.nid AS bid,
                   {_cos('ca.cv', 'cb.cv')} AS s
            FROM sl s1
            JOIN sl s2 ON s1.query_id = s2.query_id AND s1.nid < s2.nid
            JOIN c ca ON ca.nid = s1.nid
            JOIN c cb ON cb.nid = s2.nid),
    sel1 AS (SELECT query_id, nid, 1 AS rank, rel AS mmr_score FROM (
               SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY rel DESC, nid ASC) AS rn
               FROM sl) WHERE rn = 1)"""]
    for i in range(2, k + 1):
        parts.append(f"""
    mmr{i} AS (
      SELECT sl.query_id, sl.nid, sl.rel, MAX(sim.s) AS maxsim
      FROM sl
      JOIN sel{i - 1} sp ON sp.query_id = sl.query_id
      JOIN sim ON sim.query_id = sl.query_id
        AND ((sim.aid = sl.nid AND sim.bid = sp.nid)
          OR (sim.aid = sp.nid AND sim.bid = sl.nid))
      WHERE sl.nid NOT IN (SELECT nid FROM sel{i - 1} x
                           WHERE x.query_id = sl.query_id)
      GROUP BY sl.query_id, sl.nid, sl.rel
    ),
    pick{i} AS (
      SELECT query_id, nid, {i} AS rank,
             0.7 * rel - 0.3 * maxsim AS mmr_score
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY 0.7 * rel - 0.3 * maxsim DESC, nid ASC) AS rn
            FROM mmr{i}) WHERE rn = 1
    ),
    sel{i} AS (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM pick{i})""")
    return (
        "WITH " + ",".join(parts)
        + f"""
    SELECT query_id, rank::INTEGER AS rank, nid AS vec_id, mmr_score
    FROM sel{k}"""
    )


@query("sm4_mmr_diversified_topk", sql=_mmr_oracle(k=5, shortlist=20))
def sm4_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified retrieval (similarity.mmr_topk): exact cosine
    shortlist per query, then the greedy redundancy-penalized selection
    over ≤ q·s² Spark-computed doubles (bounded driver state; corpus
    never collected). The oracle unrolls all five greedy stages in SQL
    and must agree on every selected id AND score bit-for-bit — any
    divergence in fold order, tie-breaking, or weight literals fails
    the hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.mmr_topk(
        emb.where(F.col("vec_id") >= 10),
        emb.where(F.col("vec_id") < 3),
        "vec_id",
        "embedding",
        k=5,
        shortlist=20,
    )


@query(
    "sm6_knn_classify",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label
          FROM embeddings WHERE vec_id >= 10),
    scored AS (
      SELECT query_id, neighbor_id, label,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY {_cos('qv', 'cv')} DESC, neighbor_id ASC
             ) AS rank
      FROM q CROSS JOIN c
    ),
    votes AS (
      SELECT query_id, label, COUNT(*)::BIGINT AS votes
      FROM scored WHERE rank <= 5
      GROUP BY query_id, label
    ),
    best AS (
      SELECT query_id,
             MAX({{'votes': votes, 'neglabel': -label}}) AS b
      FROM votes GROUP BY query_id
    )
    SELECT query_id,
           CAST(-b.neglabel AS INT) AS predicted_label,
           b.votes AS votes
    FROM best
    """,
)
def sm6_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification (k=5, cosine, majority vote) of the query
    vectors against the labeled corpus — the inference layer on top of
    sm1's exact retrieval: neighbors vote with their `label`, ties
    break to the smallest label. The standard quality-of-embedding
    probe (and the label-propagation primitive) a training pipeline
    runs after every embedding refresh.

    Exactness: membership of the top-5 comes from the same
    deterministically-ranked cosine as sm1 (fixed fold order, id
    tie-break); votes are integers and the winner is a lexicographic
    struct max. Scale: retrieval inherits sm1's brute-force
    score-partitioned shape (sm2's IVF is the drop-in at corpus scale);
    the vote is a k-row-per-query aggregate, and labels ride the
    corpus rows — no extra join against the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 10)
    queries = emb.where(F.col("vec_id") < 10)
    topk = similarity.cosine_topk(
        corpus, queries, "vec_id", "embedding", k=5
    )
    labels = corpus.select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    votes = (
        topk.join(F.broadcast(labels), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = votes.groupBy("query_id").agg(
        F.max(
            F.struct(F.col("votes"), (-F.col("label")).alias("neglabel"))
        ).alias("b")
    )
    return best.select(
        "query_id",
        (-F.col("b.neglabel")).cast("int").alias("predicted_label"),
        F.col("b.votes").alias("votes"),
    )


_SD_LLOYD, _SD_FINAL = similarity.lloyd_oracle_ctes(
    "c", "vec_id", _cos, dims=64, n_centroids=8, iters=2
)


@query(
    "sm7_semantic_dedup",
    sql=f"""
    WITH c AS (
      SELECT vec_id, embedding AS cv FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    {_SD_LLOYD},
    assign AS (
      SELECT vec_id, cv, cent_id FROM (
        SELECT c.vec_id, c.cv, p.cent_id,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {similarity.nan_guard_sql(_cos('c.cv', 'p.cw'))} DESC,
                          p.cent_id ASC
               ) AS rn
        FROM c CROSS JOIN {_SD_FINAL} p
      ) WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id FROM assign a
      JOIN assign b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      WHERE {_cos('a.cv', 'b.cv')} >= 0.95
    )
    SELECT a.vec_id, a.cent_id,
           (d.vec_id IS NULL) AS keep
    FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """,
)
def sm7_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (r7): k-means-cluster the embedding corpus (shared IVF
    build, oracle-replayed Lloyd passes), compare pairs only WITHIN a
    cluster, drop any vector with a smaller-id neighbor at cos >= 0.95.
    Same planted-duplicate fixture as dd7 (every 10th vector re-added
    under vec_id+1e6) so the dedup has true positives; clustering
    bounds the quadratic to cluster size — the SemDeDup scaling
    argument, here value-checked end to end: seed, both Lloyd passes,
    the argmin assignment (NaN-guarded identically), the within-cluster
    pair screen, and every keep verdict."""
    emb = load_table(spark, sf_dir, "embeddings")
    dup = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(dup)
    return similarity.semantic_dedup(
        aug, "vec_id", "embedding", n_centroids=8, lloyd_iters=2,
        threshold=0.95, dims=64,
    )


@query(
    "sm8_ann_recall",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id >= 10),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY {_cos('qv', 'cv')} DESC, c.vec_id ASC
               ) AS rank
        FROM q CROSS JOIN c
      ) WHERE rank <= 5
    ),
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
    approx AS (
      SELECT query_id, neighbor_id, 1 AS hit FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY {_cos('p.qv', 'c.cv')} DESC, a.vec_id ASC
               ) AS rank
        FROM probes p JOIN assign a USING (cent_id) JOIN c ON c.vec_id = a.vec_id
      ) WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(ap.hit) AS BIGINT) AS n_hits,
           COUNT(ap.hit)::DOUBLE / COUNT(*) AS recall
    FROM exact e LEFT JOIN approx ap
      ON ap.query_id = e.query_id AND ap.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def sm8_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN self-evaluation: recall@5 of the IVF index (sm2's exact
    configuration) against the brute-force cosine ground truth (sm1),
    per query point — the accept/reject gate an embedding pipeline
    runs before trusting an index at corpus scale. Recall is the only
    new arithmetic (one integer count ratio, single final division);
    the oracle replays BOTH retrieval pipelines CTE-by-CTE, so a drift
    in either arm or in the overlap join shows as a value mismatch.

    Scale shape: ground truth is the one genuinely quadratic piece —
    evaluate on a SAMPLED query set (here the 10 held-out vectors, the
    sm1/sm2 contract), never the full corpus; the overlap join is
    query-grain bounded (k rows per query per side)."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 10)
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(
        corpus, queries, "vec_id", "embedding", k=5
    ).select("query_id", "neighbor_id")
    approx = similarity.ivf_topk(
        corpus, queries, "vec_id", "embedding", k=5, n_centroids=8,
        nprobe=2, lloyd_iters=2, dims=64,
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    j = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("__hit").alias("n_hits"),
        (F.count("__hit").cast("double") / F.count(F.lit(1))).alias(
            "recall"
        ),
    )


@query(
    "sm9_mutual_top1_alignment",
    sql=f"""
    WITH a AS (SELECT vec_id AS aid, embedding AS av FROM embeddings WHERE label = 0),
    b AS (SELECT vec_id AS bid, embedding AS bv FROM embeddings WHERE label = 1),
    atop AS (
      SELECT aid, bid, cos_ab FROM (
        SELECT aid, bid, {_cos('av', 'bv')} AS cos_ab,
               row_number() OVER (
                 PARTITION BY aid ORDER BY {_cos('av', 'bv')} DESC, bid ASC
               ) AS rn
        FROM a CROSS JOIN b
      ) WHERE rn = 1
    ),
    btop AS (
      SELECT bid, aid FROM (
        SELECT bid, aid,
               row_number() OVER (
                 PARTITION BY bid ORDER BY {_cos('av', 'bv')} DESC, aid ASC
               ) AS rn
        FROM b CROSS JOIN a
      ) WHERE rn = 1
    )
    SELECT atop.aid AS src_id, atop.bid AS dst_id, atop.cos_ab AS cos_sim
    FROM atop JOIN btop ON btop.bid = atop.bid AND btop.aid = atop.aid
    """,
)
def sm9_mutual_top1_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual top-1 embedding alignment between two populations (label
    0 vs label 1) — the bitext-mining shape (LASER/CCMatrix): keep a
    candidate pair only when each side is the OTHER side's nearest
    neighbor, the standard precision filter before margin scoring.
    Composed from two cosine_topk(k=1) passes joined on agreement;
    the oracle replays both directions and the handshake.

    Scale shape: each direction is the sm1 broadcast-probe pattern
    (queries broadcast against the corpus scan, per-query top-1 heap
    via rank window on query-grain partitions); the handshake join is
    top1-grain (|A| + |B| rows). At corpus scale the cross pass swaps
    in IVF/LSH blocking (sm2/dd7) — this exact form is the oracle-
    checkable ground-truth twin."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.where(F.col("label") == 0)
    b = emb.where(F.col("label") == 1)
    atop = similarity.cosine_topk(b, a, "vec_id", "embedding", k=1).select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("dst_id"),
        F.col("cos_sim"),
    )
    btop = similarity.cosine_topk(a, b, "vec_id", "embedding", k=1).select(
        F.col("query_id").alias("dst_id2"),
        F.col("neighbor_id").alias("src_id2"),
    )
    return atop.join(
        btop,
        (F.col("src_id") == F.col("src_id2"))
        & (F.col("dst_id") == F.col("dst_id2")),
    ).select("src_id", "dst_id", "cos_sim")


@query(
    "sm10_hard_negatives",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, label AS anchor_label, embedding AS qv
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id AS neighbor_id, label AS neg_label, embedding AS cv
          FROM embeddings WHERE vec_id >= 50)
    SELECT query_id, anchor_label, neighbor_id, neg_label, cos_sim,
           rank::INT AS rank
    FROM (
      SELECT query_id, anchor_label, neighbor_id, neg_label,
             {_cos('qv', 'cv')} AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY {_cos('qv', 'cv')} DESC, neighbor_id ASC
             ) AS rank
      FROM q CROSS JOIN c
      WHERE anchor_label != neg_label
    ) WHERE rank <= 3
    """,
)
def sm10_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor (the
    50 held-out vectors), the 3 highest-cosine vectors of a DIFFERENT
    label — the semantically-confusable negatives a contrastive batch
    builder pairs with each anchor (the complement of sp7's hash-uniform
    random negatives). Label filter BEFORE ranking, so rank counts only
    eligible negatives; oracle replays filter, scores and window."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    corpus = emb.where(F.col("vec_id") >= 50).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    from pyspark.sql import Window as _W

    scored = (
        corpus.join(F.broadcast(anchors))
        .where(F.col("anchor_label") != F.col("neg_label"))
        .select(
            "query_id",
            "anchor_label",
            "neighbor_id",
            "neg_label",
            similarity.cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = _W.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "query_id", "anchor_label", "neighbor_id", "neg_label",
            "cos_sim", F.col("rank").cast("int").alias("rank"),
        )
    )


@query(
    "sm11_pq_adc_topk",
    sql=f"""
    WITH qn AS (SELECT vec_id AS query_id, {_NORM.format(v='embedding')} AS nv
                FROM embeddings WHERE vec_id < 10),
    cn AS (SELECT vec_id AS neighbor_id, {_NORM.format(v='embedding')} AS nv
           FROM embeddings WHERE vec_id >= 10),
    gs AS (SELECT MAX(list_max(list_transform(nv, x -> abs(x)))) AS g FROM cn),
    qc AS (SELECT neighbor_id, {_CODE} AS cq FROM cn, gs),
    qq8 AS (SELECT query_id, {_CODE} AS q8 FROM qn, gs),
    craw AS (SELECT vec_id AS neighbor_id, embedding AS cv
             FROM embeddings WHERE vec_id >= 10),
    qraw AS (SELECT vec_id AS query_id, embedding AS qv
             FROM embeddings WHERE vec_id < 10),
    {similarity.pq_oracle_ctes(m_sub=16, n_codes=16, sub=4, k=5,
                               lloyd_iters=2, shortlist=50, cos_fn=_cos)}
    SELECT query_id, neighbor_id, cos_sim, rank FROM pqfinal
    """,
)
def sm11_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (similarity.pq_adc_topk): 16 subspaces
    x 16 integer codewords trained with two integer Lloyd passes on
    the sm3 int8 codes (Knuth-hash-spread seeds), queries scored
    through per-subspace ADC lookup tables, then the top-50 ADC
    candidates re-ranked by exact cosine (the rp2 pattern — how PQ is
    deployed: codes prune, floats decide; the inner loop of IVF-PQ
    when composed with sm2's probes). Training/encoding/LUT/pruning
    are integer and replay bit-for-bit in the oracle (pq_oracle_ctes);
    the rerank reuses sm1's pinned-order cosine. Recall vs sm1 is
    pinned in tests/test_similarity.py, the sm2/sm3 discipline."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(
        emb.where(F.col("vec_id") >= 10), emb.where(F.col("vec_id") < 10),
        "vec_id", "embedding", k=5, m_sub=16, n_codes=16, dims=64,
        lloyd_iters=2, shortlist=50,
    )


@query(
    "sm12_ivfpq_topk",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id >= 10),
    {_LLOYD_CTES},
    centroids AS (SELECT cent_id, cw FROM {_LLOYD_FINAL}),
    ivfassign AS (
      SELECT vec_id, cent_id FROM (
        SELECT c.vec_id, cent_id,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {similarity.nan_guard_sql(_cos('cv', 'cw'))} DESC, cent_id ASC
               ) AS rn
        FROM c CROSS JOIN centroids
      ) WHERE rn = 1
    ),
    ivfprobes AS (
      SELECT query_id, cent_id FROM (
        SELECT query_id, cent_id,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY {similarity.nan_guard_sql(_cos('qv', 'cw'))} DESC, cent_id ASC
               ) AS prn
        FROM q CROSS JOIN centroids
      ) WHERE prn <= 2
    ),
    ivfcand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM ivfprobes p JOIN ivfassign a USING (cent_id)
    ),
    qn AS (SELECT vec_id AS query_id, {_NORM.format(v='embedding')} AS nv
           FROM embeddings WHERE vec_id < 10),
    cn AS (SELECT vec_id AS neighbor_id, {_NORM.format(v='embedding')} AS nv
           FROM embeddings WHERE vec_id >= 10),
    gs AS (SELECT MAX(list_max(list_transform(nv, x -> abs(x)))) AS g FROM cn),
    qc AS (SELECT neighbor_id, {_CODE} AS cq FROM cn, gs),
    qq8 AS (SELECT query_id, {_CODE} AS q8 FROM qn, gs),
    craw AS (SELECT vec_id AS neighbor_id, embedding AS cv
             FROM embeddings WHERE vec_id >= 10),
    qraw AS (SELECT query_id, qv FROM q),
    {similarity.pq_oracle_ctes(m_sub=16, n_codes=16, sub=4, k=5,
                               lloyd_iters=2, shortlist=50, cos_fn=_cos,
                               candidates_cte='ivfcand')}
    SELECT query_id, neighbor_id, cos_sim, rank FROM pqfinal
    """,
)
def sm12_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (similarity.ivfpq_topk): the production ANN index
    composed end-to-end from the engine's registered halves — sm2's
    IVF cells prune WHICH candidates get scored (2 of 8 Lloyd-refined
    cells per query), sm11's PQ codes prune WHAT scoring costs
    (16x16 integer codebooks + broadcast ADC lookup tables), and the
    ADC top-50 is re-ranked by exact cosine. The oracle composes the
    two CTE chains verbatim with the candidate restriction injected
    into the ADC scoring join, so the whole index — centroids, cells,
    probes, codebooks, codes, LUTs, pruned scores, rerank — replays
    bit-for-bit. Recall vs sm1 is pinned in tests next to sm2/sm3/
    sm11 (the pruned composition trades recall for the multiplied
    cost cuts; both factors are measured)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivfpq_topk(
        emb.where(F.col("vec_id") >= 10), emb.where(F.col("vec_id") < 10),
        "vec_id", "embedding", k=5, n_centroids=8, nprobe=2,
        ivf_lloyd_iters=2, m_sub=16, n_codes=16, dims=64,
        pq_lloyd_iters=2, shortlist=50,
    )


# --- sm13: batch range search (radius query) --------------------------------


@query(
    "sm13_batch_range_search",
    sql=f"""
    WITH q AS (
      SELECT vec_id + 2000000 AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id % 20 = 0
    ), c AS (
      SELECT vec_id AS match_id, embedding AS cv FROM embeddings
    )
    SELECT query_id, match_id, cos_sim FROM (
      SELECT query_id, match_id, {_cos('qv', 'cv')} AS cos_sim
      FROM q, c
    ) WHERE cos_sim >= 0.95
    """,
)
def sm13_batch_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold range search of an ingest batch against the corpus —
    'which of these new vectors already exist (or nearly exist) in the
    index': every 20th embedding re-tagged as the incoming batch
    (identical vectors -> recall structurally 1.0 at 0.95, the dd7
    argument), searched with the asymmetric LSH operator
    (dedup.embedding_lsh_range_search): corpus and batch share the
    hyperplane family, the bucket join is batch-vs-corpus so the
    corpus never self-joins, and the small batch side BROADCASTS. The
    oracle brute-forces the full batch x corpus cosine matrix — the
    check proves the bucketed plan finds exactly the over-threshold
    set.

    Scale shape: 2 signature projections (Arrow matmul, no shuffle) +
    one broadcast bucket probe + per-candidate exact verify — corpus
    cost is one scan regardless of batch size; contrast dd7b, whose
    self-join is the right tool when the QUESTION is all-pairs."""
    from ..operators import dedup

    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + F.lit(2_000_000)).alias("vec_id"), "embedding"
    )
    return dedup.embedding_lsh_range_search(
        emb.select("vec_id", "embedding"),
        batch,
        "vec_id",
        "embedding",
        threshold=0.95,
        bands=4,
        band_bits=16,
    ).orderBy("query_id", "match_id")
