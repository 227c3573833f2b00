"""Dedup query catalog over `documents` / `embeddings`.

Every oracle replays the same deterministic pipeline in DuckDB SQL — the
shared 60-bit md5 hash (operators.dedup.shared_hash60) makes even the
hash-based fingerprints (simhash) cross-engine exact. The MinHash+LSH and
hyperplane-LSH queries are oracle-checked against BRUTE-FORCE SQL: the
probabilistic candidate stage must reach recall 1.0 on the planted
duplicates for the hash to match (banding chosen so miss probability
< 1e-3; verified empirically at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup
from . import query

_SHINGLE_CTE = """
    sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(toks)-1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, lang, string_split_regex(lower(text), '\\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    )
"""


@query(
    "dd1_exact_dedup",
    sql="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, ["text"], "doc_id")


@query(
    "dd2_ngram_jaccard",
    sql=f"""
    WITH {_SHINGLE_CTE}
    SELECT * FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        -- sound prune: jaccard >= t implies t <= |A|/|B| <= 1/t
        AND len(a.s) * 2 >= len(b.s) AND len(b.s) * 2 >= len(a.s)
    ) WHERE jaccard >= 0.5
    """,
)
def dd2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact within-lang Jaccard pairs via prefix filtering (recall 1.0
    by theorem, so the brute-force oracle stays valid; 37x vs the
    all-pairs shape at sf0.1 — dedup.prefix_filtered_jaccard_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_filtered_jaccard_pairs(
        docs, "text", "doc_id", block_col="lang", n=3, threshold=0.5
    )


@query(
    "dd3_minhash_lsh",
    sql=f"""
    WITH {_SHINGLE_CTE}
    SELECT * FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        -- sound prune: jaccard >= 0.8 implies 0.8 <= |A|/|B| <= 1.25
        AND len(a.s) * 5 >= len(b.s) * 4 AND len(b.s) * 5 >= len(a.s) * 4
    ) WHERE jaccard >= 0.8
    """,
)
def dd3_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH pipeline; oracle is the brute-force O(n^2) Jaccard —
    equality additionally proves LSH recall 1.0 on this corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", n=3, k=64, bands=16, rows_per_band=4,
        threshold=0.8,
    )


@query(
    "dd3b_neardup_after_exact_collapse",
    sql="""
    WITH reps AS (
      SELECT min(doc_id) AS doc_id, text
      FROM documents GROUP BY text
    ),
    rsh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks)-1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
            FROM reps)
      WHERE len(toks) >= 3
    )
    SELECT * FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM rsh a JOIN rsh b ON a.doc_id < b.doc_id
        AND len(a.s) * 5 >= len(b.s) * 4 AND len(b.s) * 5 >= len(a.s) * 4
    ) WHERE jaccard >= 0.8
    """,
)
def dd3b_neardup_after_exact_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd3's PRODUCTION-SCALE twin (r7 sf10 decade): exact-collapse
    identical texts to their min-id representative (dedup.exact_collapse,
    one hash-grouped shuffle), THEN MinHash+LSH+verify over distinct
    content only. Semantically: every cross-copy pair dd3 emits is
    jaccard=1.0 between identical texts and recoverable from dd1's copy
    groups; the pairs that NEED the LSH machinery — near-but-not-equal
    content — are exactly what survives the collapse. Cost model: dd3's
    verified-pair mass grows as sum C(m_i, 2) over identical-copy
    clusters (measured 4.1s sf1 -> 248s sf10 on 10x copy replication);
    dd3b's grows with distinct content, flat across replication decades.
    Oracle: brute-force Jaccard over the SQL-computed representatives
    (recall-1.0 theorem unchanged)."""
    docs = load_table(spark, sf_dir, "documents")
    reps = dedup.exact_collapse(docs, "text", "doc_id")
    # grouped pair-gen: buckets are banding-bounded post-collapse (r11)
    return dedup.minhash_dedup_pairs(
        reps, "text", "doc_id", n=3, k=64, bands=16, rows_per_band=4,
        threshold=0.8, pairgen="grouped",
    )


def _simhash_sql(bits: int = 60) -> str:
    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b_{i}"
        for i in range(bits)
    )
    recombine = " + ".join(
        f"(CASE WHEN b_{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
    toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    hashes AS (
      SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
      FROM toks
    ),
    bitsums AS (
      SELECT doc_id,
             {bit_sums}
      FROM hashes GROUP BY doc_id
    ),
    fps AS (SELECT doc_id, {recombine} AS simhash FROM bitsums)
    """


@query(
    "dd4_simhash",
    sql=f"WITH {_simhash_sql()} SELECT doc_id, simhash FROM fps",
)
def dd4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_64(docs, "text", "doc_id")


@query(
    "dd5_simhash_near_pairs",
    sql=f"""
    WITH {_simhash_sql()}
    SELECT * FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    ) WHERE hamming <= 3
    """,
)
def dd5_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-simhash near-dup; max_hamming=3 with 4 bands of 15 bits is the
    pigeonhole-EXACT regime (any pair ≤3 differing bits shares a band), so
    brute-force SQL is a true oracle, not just high-probability."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(
        docs, "text", "doc_id", max_hamming=3, band_bits=15, bits=60
    )


_COSINE_SQL = """
      list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
       * sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))
"""


@query(
    "dd6_embedding_blocked_cosine",
    sql="""
    WITH n AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> x::DOUBLE /
               sqrt(list_sum(list_transform(embedding,
                             y -> y::DOUBLE * y::DOUBLE)))) AS u
      FROM embeddings
    )
    SELECT * FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, 65), i -> a.u[i] * b.u[i]))
               AS cos_sim
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.45
    """,
)
def dd6_embedding_blocked_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label cosine pairs, vectors normalized ONCE per row so the
    quadratic pair test is a single dot product (3x fewer interpreted
    ops than dot/(|a||b|) per pair — dedup.normalized_banded_pairs with
    banding off: threshold 0.45's recall bound needs band_q > 1.05,
    i.e. no useful band)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.normalized_banded_pairs(
        emb, "vec_id", "embedding", block_col="label", threshold=0.45,
        band_q=None,
    )


@query(
    "dd7_embedding_lsh_neardup",
    sql=f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding
      FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT * FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COSINE_SQL} AS cos_sim
      FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.95
    """,
)
def dd7_embedding_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup vs brute-force oracle, in the sparse-collision
    regime LSH is designed for. The synthetic corpus has no true near-dups
    (max pairwise cos ≈ 0.51), so the query plants deterministic exact
    duplicates (every 10th vector re-added under vec_id+1e6; identical in
    the oracle SQL) and detects them at threshold 0.95. Recall is
    structurally 1.0 — identical vectors yield identical sign bits, hence
    a guaranteed collision in every band — so aggressive 4x16 banding is
    safe: even in-cluster non-dup pairs (bit-agree ≈ 0.7) collide in a
    band with prob ≈ 0.7^16 ≈ 0.3%, keeping the candidate set ~100x
    smaller than the brute-force pair space instead of degenerating into
    it (which is what any banding config does if asked to reach recall
    1.0 at cos 0.4 — the previous shape of this query, 3.7x slower)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dup = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(dup)
    return dedup.embedding_lsh_pairs(
        aug,
        "vec_id",
        "embedding",
        threshold=0.95,
        bands=4,
        band_bits=16,
        # planted exact dups have signature Hamming 0, so the prefilter
        # is structurally safe here (see the operator's calibration note)
        hamming_prefilter=8,
    )


# Brute-force Jaccard pairs -> transitive closure -> min-reachable-id
# cluster labels. Shared by dd8 and the leakage-free split oracle (sp4,
# prep_queries.py), which must agree on the exact same cluster ids.
CLOSURE_CTES = f"""{_SHINGLE_CTE},
    pairs AS MATERIALIZED (
      -- MATERIALIZED: the recursive closure below must not re-inline the
      -- O(n^2) shingle join on every fixpoint iteration
      SELECT * FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s))::DOUBLE
                 / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          AND len(a.s) * 5 >= len(b.s) * 4 AND len(b.s) * 5 >= len(a.s) * 4
      ) WHERE jaccard >= 0.8
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src AS a, dst AS b FROM edges
      UNION
      SELECT e.src, r.b FROM edges e JOIN reach r ON e.dst = r.a
    ),
    cl AS (
      SELECT a AS node, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    )"""


@query(
    "dd8_dedup_clusters",
    sql=f"""
    WITH RECURSIVE {CLOSURE_CTES}
    SELECT node, cluster_id FROM cl
    """,
)
def dd8_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash pairs -> connected components
    (iterative min-label propagation). Oracle computes the transitive
    closure with a recursive CTE and takes each node's min reachable id."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.8)
    return dedup.connected_components(pairs.select("id_a", "id_b"))


@query(
    "dd7b_vector_dedup_collapsed",
    sql=f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    grp AS (
      SELECT embedding, min(vec_id) AS rep FROM aug GROUP BY embedding
    ),
    members AS (
      SELECT g.rep AS id_a, a.vec_id AS id_b, 1.0 AS cos_sim
      FROM aug a JOIN grp g USING (embedding)
      WHERE a.vec_id != g.rep
    ),
    near AS (
      SELECT * FROM (
        SELECT a.rep AS id_a, b.rep AS id_b, {_COSINE_SQL} AS cos_sim
        FROM grp a JOIN grp b ON a.rep < b.rep
      ) WHERE cos_sim >= 0.95
    )
    SELECT id_a, id_b, cos_sim FROM members
    UNION ALL
    SELECT id_a, id_b, cos_sim FROM near
    """,
)
def dd7b_vector_dedup_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd7's PRODUCTION-SCALE twin (r7 sf10 decade: dd7 went 3.6s sf1 ->
    228s sf10 purely on identical-copy mass — replicated embeddings form
    cos=1.0 clusters whose pair output is C(m,2)). Stage zero collapses
    identical vectors by xxhash64 (dedup.exact_collapse — one linear
    hash-grouped shuffle; membership resolves as (rep, member) pairs at
    cos 1.0 exactly), and hyperplane LSH runs only over DISTINCT vectors,
    so the banded path scales with unique content across any replication
    factor. Same planted-duplicate fixture as dd7; same recall-1.0
    structure (identical vectors collapse instead of colliding)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dup = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(dup)
    h = F.xxhash64("embedding")
    reps = dedup.exact_collapse(aug, "embedding", "vec_id")
    members = (
        aug.select("vec_id", h.alias("__h"))
        .join(
            reps.select(F.col("vec_id").alias("id_a"), h.alias("__h")),
            "__h",
        )
        .where(F.col("vec_id") != F.col("id_a"))
        .select(
            "id_a",
            F.col("vec_id").alias("id_b"),
            F.lit(1.0).alias("cos_sim"),
        )
    )
    near = dedup.embedding_lsh_pairs(
        reps.select("vec_id", "embedding"), "vec_id", "embedding",
        threshold=0.95, bands=4, band_bits=16, hamming_prefilter=8,
        pairgen="grouped",  # banding-bounded buckets post-collapse (r11)
    )
    return members.unionByName(near.select("id_a", "id_b", "cos_sim"))


@query(
    "dd8b_clusters_via_collapse",
    sql=f"""
    WITH RECURSIVE {CLOSURE_CTES}
    SELECT node, cluster_id FROM cl
    """,
)
def dd8b_clusters_via_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd8's PRODUCTION-SCALE twin with dd8's EXACT oracle — the
    strongest twin form: the flat path must reproduce the quadratic
    path's answer bit-for-bit. Identical texts have identical shingle
    sets, so jaccard(copy, x) == jaccard(rep, x) for every x: replacing
    dd8's per-cluster cliques (C(m,2) edges per identical-copy group,
    the measured 341s sf10 tail) with collapse STAR edges (rep ->
    member, m-1 edges) plus rep-level near-dup pairs preserves every
    connected component and therefore every (node, min-reachable-id)
    cluster label. Edge mass drops from quadratic-in-copies to linear;
    large-star/small-star runs over the same components either way."""
    docs = load_table(spark, sf_dir, "documents")
    reps = dedup.exact_collapse(docs, "text", "doc_id")
    h = F.xxhash64("text")
    members = (
        docs.select("doc_id", h.alias("__h"))
        .join(
            reps.select(F.col("doc_id").alias("id_a"), h.alias("__h")),
            "__h",
        )
        .where(F.col("doc_id") != F.col("id_a"))
        .select("id_a", F.col("doc_id").alias("id_b"))
    )
    rep_pairs = dedup.minhash_dedup_pairs(
        reps, "text", "doc_id", threshold=0.8, pairgen="grouped"
    ).select("id_a", "id_b")
    return dedup.connected_components(members.unionByName(rep_pairs))


# 16 words so the injected banner occupies exactly one non-overlapping
# 16-token chunk (stride == chunk == 16) in every tainted document
_BANNER = (
    "terms of service all rights reserved click here to subscribe "
    "cookie notice privacy policy applies site"
)

_D9_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"


@query(
    "dd9_boilerplate_chunks",
    sql=f"""
    WITH tainted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN '{_BANNER} ' || text
                  ELSE text END AS text
      FROM documents
    ), t AS (
      SELECT doc_id, {_D9_TOKS} AS toks FROM tainted
      WHERE len({_D9_TOKS}) > 0
    ), c AS (
      SELECT doc_id,
             unnest(list_transform(range(0, len(toks), 16),
                    s -> array_to_string(list_slice(toks, s + 1, s + 16), ' ')))
               AS chunk_text
      FROM t
    ), freq AS (
      SELECT chunk_text FROM (
        SELECT chunk_text, COUNT(DISTINCT doc_id) AS nd FROM c
        GROUP BY chunk_text
      ) WHERE nd >= 3
    ), per AS (
      SELECT c.doc_id,
             COUNT(*) AS n_chunks,
             SUM(CASE WHEN f.chunk_text IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_boilerplate_chunks
      FROM c LEFT JOIN freq f USING (chunk_text)
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_chunks, n_boilerplate_chunks,
           n_boilerplate_chunks::DOUBLE / n_chunks AS boilerplate_frac,
           (n_boilerplate_chunks::DOUBLE / n_chunks) < 0.5 AS keep
    FROM per
    """,
)
def dd9_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document span dedup (textprep.
    chunk_boilerplate_filter): non-overlapping 16-token chunks shared by
    >= 3 distinct documents are boilerplate; per-document boilerplate
    fraction + keep verdict. Every 5th document is tainted with a fixed
    16-token banner so the detector has real boilerplate to find; the
    oracle replays the taint and compares chunk TEXT where Spark
    compares xxhash64 (collision-free at any realistic corpus size)."""
    from ..operators import textprep

    docs = load_table(spark, sf_dir, "documents")
    tainted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.lit(_BANNER + " "), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return textprep.chunk_boilerplate_filter(
        tainted, "text", "doc_id", chunk=16, min_docs=3
    )


@query(
    "dd10_cluster_representatives",
    sql=f"""
    WITH RECURSIVE {_SHINGLE_CTE},
    pairs AS MATERIALIZED (
      SELECT * FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s))::DOUBLE
                 / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          AND len(a.s) * 5 >= len(b.s) * 4 AND len(b.s) * 5 >= len(a.s) * 4
      ) WHERE jaccard >= 0.8
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src AS a, dst AS b FROM edges
      UNION
      SELECT e.src, r.b FROM edges e JOIN reach r ON e.dst = r.a
    ),
    cl AS (
      SELECT a AS node, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    assign AS (
      SELECT COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
             d.doc_id, d.n_chars
      FROM documents d LEFT JOIN cl ON d.doc_id = cl.node
    )
    SELECT cluster_id,
           arg_max(doc_id, n_chars * 100000000 - doc_id) AS rep_doc_id,
           arg_max(n_chars, n_chars * 100000000 - doc_id) AS rep_quality,
           COUNT(*) AS cluster_size
    FROM assign GROUP BY cluster_id
    """,
)
def dd10_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup SURVIVOR SELECTION: MinHash pairs -> connected
    components -> one representative per cluster (longest text, ties to
    the lowest doc_id), singletons surviving as themselves — the final
    stage that turns near-dup detection into an actual curated corpus.
    The oracle replays the whole pipeline: brute-force Jaccard pairs,
    recursive-CTE transitive closure, then arg_max survivor choice."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.8)
    clusters = dedup.connected_components(pairs.select("id_a", "id_b"))
    return dedup.select_representatives(docs, clusters, "doc_id", "n_chars")


@query(
    "dd11_sorted_neighborhood",
    sql=f"""
    WITH {_SHINGLE_CTE},
    ordered AS (
      SELECT doc_id, s,
             row_number() OVER (
               ORDER BY substr(lower(text), 1, 24), doc_id
             ) AS rn
      FROM documents JOIN sh USING (doc_id)
    )
    SELECT * FROM (
      SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
             GREATEST(a.doc_id, b.doc_id) AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
               AS jaccard
      FROM ordered a JOIN ordered b
        ON b.rn > a.rn AND b.rn <= a.rn + 5
    ) WHERE jaccard >= 0.5
    """,
)
def dd11_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup pairs: prefix-sorted order locality
    as the blocking key (window of 5 successors), exact shingle Jaccard
    as the gate — the record-linkage complement to MinHash/SimHash
    banding. Global rank via the e1b two-pass range-bucket trick (no
    global row_number window; the oracle keeps the windowed form so
    DuckDB independently verifies the decomposition)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.sorted_neighborhood_pairs(
        docs, "text", "doc_id", key_len=24, window=5, n=3, threshold=0.5
    )


# 16 words -> exactly one all-passage 16-token window per tainted doc,
# so every tainted pair shares >= 1 verbatim gram at sf0.01 (doc freq 39,
# inside the cap) while at sf0.1 the same gram's doc freq (~385) crosses
# max_df=50 and is suppressed as boilerplate — both branches of the df
# cap are exercised across the SF decade, and the oracle replays either.
_QUOTE = (
    "in accordance with the terms set forth herein the undersigned "
    "parties hereby agree to the following provisions"
)

_DD12_HASH60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


@query(
    "dd12_verbatim_overlap",
    sql=f"""
    WITH tainted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN '{_QUOTE} ' || text
                  ELSE text END AS text
      FROM documents
    ), t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM tainted
    ), g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(toks) - 16 + 2),
               i -> {_DD12_HASH60.format(
                 x="array_to_string(list_slice(toks, i, i + 15), ' ')")}
             ))) AS g
      FROM t WHERE len(toks) >= 16
    ), keep AS (
      SELECT g FROM (SELECT g, COUNT(*) AS d FROM g GROUP BY g)
      WHERE d BETWEEN 2 AND 50
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(*) AS n_shared_grams
    FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
    JOIN keep k ON k.g = a.g
    GROUP BY a.doc_id, b.doc_id
    """,
)
def dd12_verbatim_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style verbatim 16-token-window overlap pairs
    (dedup.verbatim_overlap_pairs) over a corpus where every 13th
    document is tainted with a shared legal-boilerplate passage — the
    copied-passage signal Jaccard dilutes away. The oracle replays the
    taint, the 60-bit gram hashing, the [2, max_df] document-frequency
    cap, and the pair counts."""
    docs = load_table(spark, sf_dir, "documents")
    tainted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.lit(_QUOTE + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.verbatim_overlap_pairs(tainted, "text", "doc_id", w=16, max_df=50)


@query(
    "dd13_incremental_neardup",
    sql=f"""
    WITH {_SHINGLE_CTE}
    SELECT * FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        AND (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)
        -- sound prune: jaccard >= 0.8 implies 0.8 <= |A|/|B| <= 1.25
        AND len(a.s) * 5 >= len(b.s) * 4 AND len(b.s) * 5 >= len(a.s) * 4
    ) WHERE jaccard >= 0.8
    """,
)
def dd13_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup: documents split into an existing
    corpus (doc_id % 10 != 0) and an arriving batch (doc_id % 10 = 0);
    emit every near-dup pair with at least one NEW side — batch-vs-
    corpus AND batch-internal — by joining only the new band table
    against the (persisted-in-production) corpus bands: the corpus is
    never self-joined and never re-signed per batch
    (dedup.incremental_minhash_pairs). Oracle is the brute-force
    restricted-pair Jaccard, so equality also proves recall 1.0 of the
    banding on this corpus."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    return dedup.incremental_minhash_pairs(
        corpus, batch, "text", "doc_id",
        n=3, k=64, bands=16, rows_per_band=4, threshold=0.8,
    )


# --- dd14: phonetic (Soundex-style) blocking pairs ------------------------


def _phonetic_expr(col: str) -> str:
    """One SQL expression string computing the phonetic blocking code,
    shared VERBATIM by Spark and DuckDB (both implement lower/substr/
    upper/translate/replace/concat with identical semantics, so the
    cross-engine contract is the expression text itself).

    Variant of Soundex, deterministic by construction: consonant
    classes map to digits via translate (vowels+hwy+digits to '0'),
    zeros drop, runs collapse via three fixpoint replace passes per
    digit (exact for runs <= 8, and deterministic PERIOD — classic
    Soundex's letter-by-letter collapse needs a loop SQL doesn't have),
    code = first letter + first 3 digits zero-padded. RE2 (DuckDB) has
    no backreferences, which rules out the regexp '(\\d)\\1+' collapse —
    hence the generated replace chain."""
    digits = f"replace(translate(substr({col}, 2), "
    digits += "'bfpvcgjkqsxzdtlmnraeiouhwy0123456789', "
    digits += "'11112222222233455600000000' || repeat('0', 10)), '0', '')"
    collapsed = digits
    for d in "123456":
        for _ in range(3):
            collapsed = f"replace({collapsed}, '{d}{d}', '{d}')"
    return (
        f"upper(substr({col}, 1, 1)) || substr({collapsed} || '000', 1, 3)"
    )


# Deterministic planted misspellings (the dd9/dd12/dc2 taint pattern):
# each must land in its correct word's block; 'kustomer' deliberately
# does NOT pair with 'customer' (K235 vs C235) — the classic Soundex
# first-letter blindness, asserted as a miss in tests/test_dedup.py.
_DD14_PLANTED = (
    "wydget", "gere", "anvill", "batsh", "windoe", "merje", "kustomer",
)
_DD14_CAP = 20
_PHON = _phonetic_expr("token")


@query(
    "dd14_phonetic_blocking",
    sql=f"""
    WITH vocab AS (
      SELECT DISTINCT token FROM (
        SELECT unnest(list_filter(
          string_split_regex(lower(text), '\\s+'), t -> t != '')) AS token
        FROM documents
        UNION
        SELECT unnest(string_split(lower(p_name), ' ')) FROM part
        UNION
        SELECT unnest([{", ".join(repr(t) for t in _DD14_PLANTED)}])
      )
    ), coded AS (
      SELECT token, {_PHON} AS code FROM vocab
      WHERE regexp_matches(token, '^[a-z]+$')
    ), blocks AS (
      SELECT code FROM coded GROUP BY code
      HAVING COUNT(*) BETWEEN 2 AND {_DD14_CAP}
    )
    SELECT a.code, a.token AS tok_a, b.token AS tok_b
    FROM coded a JOIN coded b ON a.code = b.code AND a.token < b.token
    JOIN blocks ON a.code = blocks.code
    """,
)
def dd14_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for fuzzy string dedup: vocabulary terms that
    SOUND alike share a 4-char code and become candidate pairs — the
    classic record-linkage blocking key family (Soundex/NYSIIS),
    complementing the spelling-distance family (tx14 edit distance,
    dd11 sorted neighborhood). The code expression is generated ONCE and
    evaluated verbatim by both engines; planted misspellings (taint
    pattern) prove each lands in its true word's block, while
    'kustomer' documents the first-letter miss inherent to the family.

    Scale shape: the code is a projection over the DISTINCT vocabulary
    (corpus-frequency-independent — the token stream reduces to vocab
    before any phonetic work), the self-join keys on the code, and the
    [2, cap] block-size band drops both singletons and degenerate
    mega-blocks (same guard as dd12's document-frequency cap) so no
    reducer ever materializes a quadratic block."""
    docs = load_table(spark, sf_dir, "documents")
    part = load_table(spark, sf_dir, "part")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    planted = spark.createDataFrame(
        [(t,) for t in _DD14_PLANTED], "token string"
    )
    vocab = (
        docs.select(F.explode(toks).alias("token"))
        .union(
            part.select(
                F.explode(F.split(F.lower("p_name"), " ")).alias("token")
            )
        )
        .union(planted)
        .where(F.col("token").rlike("^[a-z]+$"))
        .distinct()
    )
    coded = vocab.select("token", F.expr(_PHON).alias("code"))
    from ..cache import pin

    coded = pin(coded)
    blocks = (
        coded.groupBy("code")
        .agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= _DD14_CAP))
        .select(F.col("code").alias("__bcode"))
    )
    a = coded.alias("a")
    b = coded.alias("b")
    return (
        a.join(b, (F.col("a.code") == F.col("b.code"))
               & (F.col("a.token") < F.col("b.token")))
        .join(F.broadcast(blocks), F.col("a.code") == F.col("__bcode"))
        .select(
            F.col("a.code").alias("code"),
            F.col("a.token").alias("tok_a"),
            F.col("b.token").alias("tok_b"),
        )
    )


@query(
    "dd15_containment_pairs",
    sql=f"""
    WITH {_SHINGLE_CTE}
    SELECT * FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) AS containment
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id != b.doc_id
        -- sound prune: C >= 0.8 implies |Sb| >= 0.8 * |Sa|
        AND len(b.s) * 1.0 >= len(a.s) * 0.8
    ) WHERE containment >= 0.8
    """,
)
def dd15_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup (|Sa∩Sb|/|Sa| >= 0.8) within
    lang blocks — the short-doc-inside-long-doc case Jaccard misses;
    prefix-filtered with recall 1.0 by theorem, so the brute-force
    oracle is valid verbatim (dedup.prefix_filtered_containment_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_filtered_containment_pairs(
        docs, "text", "doc_id", block_col="lang", n=3, threshold=0.8
    )


_REPS_CTE = """
    reps AS (
      SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang, text
      FROM documents GROUP BY text
    ),
    sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(toks)-1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, lang, string_split_regex(lower(text), '\\s+') AS toks
            FROM reps)
      WHERE len(toks) >= 3
    )
"""


def _collapse_reps(docs: DataFrame) -> DataFrame:
    """exact_collapse (stage zero) keeping the representative's lang for
    block-scoped twins: min-struct = arg_min by doc_id, the same winner
    the oracle's min(doc_id)/arg_min(lang, doc_id) picks."""
    r = F.min(F.struct("doc_id", "text", "lang")).alias("r")
    return (
        docs.groupBy(F.xxhash64("text").alias("__h"))
        .agg(r)
        .select(
            F.col("r.doc_id").alias("doc_id"),
            F.col("r.text").alias("text"),
            F.col("r.lang").alias("lang"),
        )
    )


@query(
    "dd2b_jaccard_after_collapse",
    sql=f"""
    WITH {_REPS_CTE}
    SELECT * FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        AND len(a.s) * 2 >= len(b.s) AND len(b.s) * 2 >= len(a.s)
    ) WHERE jaccard >= 0.5
    """,
)
def dd2b_jaccard_after_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd2's PRODUCTION twin (the dd3b pattern applied to the EXACT
    Jaccard form): collapse identical texts to their min-id
    representative first (one hash-grouped shuffle), then the
    prefix-filtered exact Jaccard join over distinct content only.
    Every cross-copy pair dd2 additionally emits is jaccard=1.0 between
    identical texts — recoverable from dd1's copy groups — so the twin
    carries all the information at a pair mass that scales with
    DISTINCT content, flat under copy replication where dd2 is
    C(m,2)-bound (SCALE.md r8 sf10 boundary). Oracle: brute-force
    Jaccard over the SQL-computed representatives (recall-1.0 theorem
    unchanged by the collapse)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_filtered_jaccard_pairs(
        _collapse_reps(docs), "text", "doc_id",
        block_col="lang", n=3, threshold=0.5,
    )


@query(
    "dd15b_containment_after_collapse",
    sql=f"""
    WITH {_REPS_CTE}
    SELECT * FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) AS containment
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id != b.doc_id
        AND len(b.s) * 1.0 >= len(a.s) * 0.8
    ) WHERE containment >= 0.8
    """,
)
def dd15b_containment_after_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd15's PRODUCTION twin: exact-collapse stage zero, then the
    prefix-filtered containment join over distinct content (the
    short-doc-inside-long-doc test). Copy replication multiplies dd15's
    pair output by m_a * m_b per duplicated pair; the twin's output is
    replication-invariant. Oracle: brute-force containment over the
    SQL representatives."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_filtered_containment_pairs(
        _collapse_reps(docs), "text", "doc_id",
        block_col="lang", n=3, threshold=0.8,
    )


# --- dd16/dd17: maximal duplicated spans + per-doc duplicated mass --------
#
# Taint for a non-trivial span workload: every 13th document gets a
# 33-token boilerplate passage PREPENDED — three fixed 10-word blocks,
# each followed by a per-group marker token grp<doc_id // 130> (so ten
# tainted docs share each marker at every SF). The marker spacing (one
# every 11 tokens) guarantees EVERY 16-token window inside the passage
# contains a marker, so all in-passage grams are group-specific: doc
# frequency is exactly the group size (~10, inside the [2, 50] cap at
# every SF) and no gram is shared across groups. Ten docs sharing one
# 33-token prefix must each emit one maximal diagonal-0 span of exactly
# 33 tokens (18 consecutive matched windows) per partner — the oracle
# replays taint, 60-bit gram grid, df cap, diagonal islands, and the
# interval-union mass.

_SPAN_B1 = "the parties acknowledge that all obligations arising under this agreement"
_SPAN_B2 = "shall remain binding upon their respective successors and permitted assigns"
_SPAN_B3 = "until such time as every outstanding balance has been discharged"


def _span_tainted(docs: DataFrame) -> DataFrame:
    gtok = F.concat(F.lit("grp"), F.expr("doc_id div 130").cast("string"))
    passage = F.concat_ws(
        " ",
        F.lit(_SPAN_B1), gtok, F.lit(_SPAN_B2), gtok, F.lit(_SPAN_B3), gtok,
    )
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(passage, F.lit(" "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


_SPAN_TAINT_SQL = f"""
    tainted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN
               '{_SPAN_B1} grp' || CAST(doc_id // 130 AS VARCHAR)
               || ' {_SPAN_B2} grp' || CAST(doc_id // 130 AS VARCHAR)
               || ' {_SPAN_B3} grp' || CAST(doc_id // 130 AS VARCHAR)
               || ' ' || text
             ELSE text END AS text
      FROM documents
    )"""

_SPAN_RUNS_SQL = f"""
    t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM tainted
    ), gp AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) - 16 + 2)) AS i
      FROM t WHERE len(toks) >= 16
    ), g AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             {_DD12_HASH60.format(
               x="array_to_string(list_slice(toks, i, i + 15), ' ')")} AS g
      FROM gp
    ), keep AS (
      SELECT g FROM (
        SELECT g, COUNT(DISTINCT doc_id) AS d FROM g GROUP BY g
      ) WHERE d BETWEEN 2 AND 50
    ), p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
      FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
      JOIN keep k ON k.g = a.g
    ), runs AS (
      SELECT id_a, id_b, pa, pb, pa - pb AS diag,
             pa - ROW_NUMBER()
               OVER (PARTITION BY id_a, id_b, pa - pb ORDER BY pa) AS grp
      FROM p
    )"""


@query(
    "dd16_duplicate_spans",
    sql=f"""
    WITH {_SPAN_TAINT_SQL}, {_SPAN_RUNS_SQL}
    SELECT id_a, id_b,
           CAST(MIN(pa) AS BIGINT) AS start_a,
           CAST(MIN(pb) AS BIGINT) AS start_b,
           CAST(COUNT(*) + 15 AS BIGINT) AS len_tokens
    FROM runs GROUP BY id_a, id_b, diag, grp
    """,
)
def dd16_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal verbatim duplicated spans per doc pair
    (dedup.duplicate_span_pairs) — the suffix-array ExactSubstr output
    shape (which passage, where, how long) rather than dd12's shared-
    window counts. Ten-doc taint groups each share a 33-token prefix,
    so every in-group pair must merge its >=18 consecutive matched
    windows into ONE span of len_tokens>=33 at start 0/0 (34 when the
    two docs' first own-text tokens happen to coincide) — the oracle
    replays the gram grid and the diagonal-islands merge and would
    catch a span split anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_span_pairs(
        _span_tainted(docs), "text", "doc_id", w=16, max_df=50
    )


@query(
    "dd17_duplicate_token_mass",
    sql=f"""
    WITH {_SPAN_TAINT_SQL}, {_SPAN_RUNS_SQL}, spans AS (
      SELECT id_a, id_b, MIN(pa) AS sa, MIN(pb) AS sb,
             COUNT(*) + 15 AS lt
      FROM runs GROUP BY id_a, id_b, diag, grp
    ), iv AS (
      -- UNION (not ALL): distinct intervals make (s, e) a total order
      -- per doc, keeping the running-frame windows deterministic under
      -- parallel execution (ties split islands intermittently otherwise)
      SELECT id_a AS doc_id, sa AS s, sa + lt AS e FROM spans
      UNION
      SELECT id_b AS doc_id, sb AS s, sb + lt AS e FROM spans
    ), m AS (
      SELECT doc_id, s, e,
             MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM iv
    ), fl AS (
      SELECT doc_id, s, e,
             CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
      FROM m
    ), gi AS (
      SELECT doc_id, s, e,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS UNBOUNDED PRECEDING) AS isl
      FROM fl
    ), mg AS (
      SELECT doc_id, MIN(s) AS ms, MAX(e) AS me
      FROM gi GROUP BY doc_id, isl
    ), mass AS (
      SELECT doc_id, CAST(SUM(me - ms) AS BIGINT) AS dup_tokens
      FROM mg GROUP BY doc_id
    )
    SELECT mass.doc_id, mass.dup_tokens,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           mass.dup_tokens::DOUBLE / len(t.toks) AS dup_fraction
    FROM mass JOIN t ON t.doc_id = mass.doc_id
    """,
)
def dd17_duplicate_token_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-token mass over the same taint
    (dedup.duplicate_token_mass): union-merge every duplicated span
    interval per doc (running-max islands, the e18 interval-compaction
    shape), then dup_tokens / n_tokens as the strip-or-drop fraction a
    training pipeline filters on. Tainted docs carry the same 33-token
    prefix span from up to 9 partners — the merge must count it ONCE."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_token_mass(
        _span_tainted(docs), "text", "doc_id", w=16, max_df=50
    )


@query(
    "dd19_lsh_calibration",
    sql=dedup.lsh_calibration_oracle_sql(
        "documents", "text", "doc_id", "lang",
        n=3, k=64, bands=16, rows_per_band=4, sample_mod=2,
    ),
)
def dd19_lsh_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding calibration for dd3's MinHash-LSH config
    (dedup.lsh_calibration): on a deterministic 50% hash-sample
    (20% keeps too few BOTH-halves of duplicate pairs to exercise the
    high bins on this corpus — measured),
    exact within-lang Jaccard for EVERY sampled pair, banded
    candidates under (b=16, r=4), and per-Jaccard-bin true-pair count
    / candidate count / measured recall next to the theoretical
    s-curve 1-(1-s^4)^16 at the bin midpoint (shared SQL text, no
    POWER()). The artifact that justifies — or retunes — the banding
    before a 100 TB dedup run; all-pairs by design, which is exactly
    why it runs on a bounded sample and never the corpus. Bucket hash
    is the md5 combiner so the oracle can replay banding itself
    (dd3's xxhash64 buckets are Spark-only, hence its brute-force
    oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.lsh_calibration(
        docs, "text", "doc_id", "lang",
        n=3, k=64, bands=16, rows_per_band=4, sample_mod=2,
    )


# --- dd20: duplicate-mass report -------------------------------------------


@query(
    "dd20_dup_mass_report",
    sql="""
    WITH aug AS (
      SELECT doc_id, text, n_chars FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text, n_chars
      FROM documents WHERE doc_id % 10 = 0
    ), grp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(MIN(n_chars) AS BIGINT) AS chars_one
      FROM aug GROUP BY text
    ), bucketed AS (
      SELECT CASE WHEN n_copies = 1 THEN 'unique'
                  WHEN n_copies = 2 THEN 'x2'
                  WHEN n_copies <= 5 THEN 'x3-5'
                  ELSE 'x6+' END AS bucket,
             CASE WHEN n_copies = 1 THEN 0 WHEN n_copies = 2 THEN 1
                  WHEN n_copies <= 5 THEN 2 ELSE 3 END AS bucket_order,
             n_copies, chars_one
      FROM grp
    )
    SELECT bucket, CAST(bucket_order AS BIGINT) AS bucket_order,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_copies) AS BIGINT) AS n_docs,
           CAST(SUM(n_copies - 1) AS BIGINT) AS n_redundant,
           CAST(SUM(n_copies * chars_one) AS BIGINT) AS chars_total,
           CAST(SUM((n_copies - 1) * chars_one) AS BIGINT)
             AS chars_redundant
    FROM bucketed GROUP BY bucket, bucket_order
    """,
)
def dd20_dup_mass_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-mass report — the diagnostic a dedup run opens with:
    exact-copy cluster sizes bucketed (unique / x2 / x3-5 / x6+) with
    cluster, document, redundant-document, and redundant-CHARACTER
    counts per bucket, so 'how much would exact dedup save' is one
    scan, before any near-dup machinery runs. Uses the dd3b/dd7b
    planted-duplicate fixture (doc_id % 10 replicated) so both the
    unique and duplicated buckets are exercised. Spark groups by
    xxhash64(text) — one (hash, counts) row per map-side group, the
    exact_collapse shuffle shape; the oracle groups by the text
    itself (DuckDB has no xxhash64), which yields identical counts
    UNLESS two distinct texts collide on the 64-bit hash — so each
    group carries min/max of an independent second hash (md5) and the
    query raise_error()s on disagreement rather than silently
    diverging (ADVICE r9).

    Scale shape: one hash-grouped combine over the corpus (stats
    only, the text never reshuffles — min(n_chars) rides as an int),
    then bucket-grain everything. This is the report that decides
    whether the collapse twins' stage zero pays for itself — at any
    meaningful copy mass it does (SCALE.md sf10 decade)."""
    docs = load_table(spark, sf_dir, "documents")
    dup = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "n_chars"
    )
    aug = docs.select("doc_id", "text", "n_chars").unionByName(dup)
    # collision sentinel (ADVICE r9): the oracle groups by the raw text,
    # so a 64-bit xxhash64 collision between DISTINCT documents would
    # silently merge two clusters here and diverge the counts with no
    # detection. Carry min/max of a second, independent hash (md5) per
    # group — 16 bytes each through the combine, the text itself still
    # never reshuffles — and raise loudly if they disagree.
    grp = (
        aug.groupBy(F.xxhash64("text").alias("__h"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("n_chars").cast("bigint").alias("chars_one"),
            F.min(F.md5("text")).alias("__m_lo"),
            F.max(F.md5("text")).alias("__m_hi"),
        )
        .withColumn(
            "n_copies",
            F.expr(
                "CASE WHEN __m_lo = __m_hi THEN n_copies ELSE"
                " raise_error(concat('dd20: xxhash64 collision between"
                " distinct texts in group ', CAST(__h AS STRING))) END"
            ).cast("bigint"),
        )
    )
    bucket = (
        F.when(F.col("n_copies") == 1, "unique")
        .when(F.col("n_copies") == 2, "x2")
        .when(F.col("n_copies") <= 5, "x3-5")
        .otherwise("x6+")
    )
    border = (
        F.when(F.col("n_copies") == 1, 0)
        .when(F.col("n_copies") == 2, 1)
        .when(F.col("n_copies") <= 5, 2)
        .otherwise(3)
    ).cast("bigint")
    return (
        grp.select(
            bucket.alias("bucket"),
            border.alias("bucket_order"),
            "n_copies",
            "chars_one",
        )
        .groupBy("bucket", "bucket_order")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("n_copies").cast("bigint").alias("n_docs"),
            F.sum(F.col("n_copies") - 1).cast("bigint").alias("n_redundant"),
            F.sum(F.col("n_copies") * F.col("chars_one"))
            .cast("bigint").alias("chars_total"),
            F.sum((F.col("n_copies") - 1) * F.col("chars_one"))
            .cast("bigint").alias("chars_redundant"),
        )
    )
