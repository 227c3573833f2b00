"""Dataset-preparation query catalog: repetition filters, PII scrub,
chunking, splits/sampling, sequence packing, TF-IDF, range join.

Every oracle replays the exact Catalyst expression in DuckDB SQL so the
gate checks bit-identical values. Cross-engine notes: all fractions are a
single IEEE division (identical rounding both engines); hash decisions go
through the shared 60-bit md5 key (`CAST('0x'||substr(md5(x),1,15) AS
BIGINT)` == Spark `conv(substring(md5(x),1,15),16,10)`); DuckDB
`regexp_replace` needs the 'g' flag to match Spark's replace-all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, sql_dsum
from ..operators import dedup as dedup_ops
from ..operators import rangejoin, sampling, textprep, textstats
from . import query

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"

_HASH60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


@query(
    "tx8_repetition_filter",
    sql=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                  ELSE []::VARCHAR[] END AS g
      FROM base
    )
    SELECT doc_id,
           len(g)::BIGINT AS n_ngrams,
           CASE WHEN len(g) > 0
                THEN 1.0 - len(list_distinct(g))::DOUBLE / len(g) END
             AS dup_ngram_frac,
           CASE WHEN len(g) > 0
                THEN list_max(list_transform(list_distinct(g),
                       x -> len(list_filter(g, y -> y = x)) * length(x)
                     ))::DOUBLE
                     / length(list_aggregate(g, 'string_agg', '')) END
             AS top_ngram_char_frac,
           coalesce(
             (1.0 - len(list_distinct(g))::DOUBLE / len(g)) <= 0.5, true
           ) AS keep
    FROM g
    """,
)
def tx8_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: duplicate-bigram fraction
    and most-frequent-bigram character share, plus the keep verdict."""
    docs = load_table(spark, sf_dir, "documents")
    return textprep.repetition_signals(docs, "text", "doc_id", n=2, max_dup_frac=0.5)


_PII = {**textprep.PII_PATTERNS, "entity": "\\b(customer|supplier)\\b"}


def _pii_sql() -> str:
    counts = ",\n           ".join(
        f"len(regexp_extract_all(lower(text), '{pat}'))::BIGINT AS n_{name}"
        for name, pat in _PII.items()
    )
    scrub = "lower(text)"
    for name, pat in _PII.items():
        scrub = f"regexp_replace({scrub}, '{pat}', '<{name.upper()}>', 'g')"
    return f"""
    SELECT doc_id,
           {counts},
           {scrub} AS scrubbed
    FROM documents
    """


@query("tx9_pii_scrub", sql=_pii_sql())
def tx9_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex redaction pass (emails / phones / an entity denylist that
    actually fires on this corpus) with per-pattern match counts taken on
    the original text."""
    docs = load_table(spark, sf_dir, "documents")
    return textprep.pii_scrub(docs, "text", "doc_id", _PII)


@query(
    "tx10_token_chunks",
    sql=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE len({_TOKS}) > 0
    ), c AS (
      SELECT doc_id,
             list_transform(range(0, len(toks), 12),
                            s -> least(16, len(toks) - s)) AS ns,
             list_transform(range(0, len(toks), 12),
                            s -> array_to_string(
                                   list_slice(toks, s + 1, s + 16), ' ')) AS ts
      FROM base
    )
    SELECT doc_id,
           CAST(generate_subscripts(ns, 1) - 1 AS BIGINT) AS chunk_id,
           CAST(unnest(ns) AS BIGINT) AS n_tokens,
           unnest(ts) AS chunk_text
    FROM c
    """,
)
def tx10_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 16-token windows with stride 12 (training sequence
    chunking); every token lands in at least one chunk."""
    docs = load_table(spark, sf_dir, "documents")
    return textprep.chunk_by_tokens(docs, "text", "doc_id", chunk=16, stride=12)


@query(
    "sp1_hash_split",
    sql=f"""
    SELECT doc_id,
           bkt AS split_bucket,
           CASE WHEN bkt < 80 THEN 'train'
                WHEN bkt < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             {_HASH60.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 100
               AS bkt
      FROM documents
    )
    """,
)
def sp1_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/10/10 train/val/test assignment from the id hash —
    adding documents later never moves an existing one between splits."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_split(docs, "doc_id").select(
        "doc_id", "split_bucket", "split"
    )


_SAMPLE_FRACS = {"en": 0.25, "de": 0.5}
_SAMPLE_DEFAULT = 0.75
_PRECISION = 1_000_000


@query(
    "sp2_stratified_sample",
    sql=f"""
    SELECT doc_id, lang, sample_bucket
    FROM (
      SELECT doc_id, lang,
             {_HASH60.format(x="'sample:' || CAST(doc_id AS VARCHAR)")}
               % {_PRECISION} AS sample_bucket
      FROM documents
    )
    WHERE sample_bucket < CASE lang
        WHEN 'de' THEN {int(0.5 * _PRECISION)}
        WHEN 'en' THEN {int(0.25 * _PRECISION)}
        ELSE {int(0.75 * _PRECISION)} END
    """,
)
def sp2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free deterministic stratified sample: per-language keep
    fractions decided row-locally from the id hash."""
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        docs, "lang", _SAMPLE_FRACS, "doc_id", default_frac=_SAMPLE_DEFAULT
    )
    return out.select("doc_id", "lang", "sample_bucket")


@query(
    "pk1_sequence_packing",
    sql=f"""
    WITH b AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             {_HASH60.format(x="'pack:' || CAST(doc_id AS VARCHAR)")} % 8
               AS pack_bucket
      FROM documents
    )
    SELECT doc_id, pack_bucket, n_tokens,
           CAST(floor((SUM(n_tokens) OVER (
                         PARTITION BY pack_bucket ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING
                       ) - n_tokens) / 256) AS BIGINT) AS seq_id
    FROM b
    """,
)
def pk1_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy 256-token sequence packing across 8 parallel hash buckets —
    the only shuffle is the skew-free bucket key."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), "\\s+"), lambda t: t != ""))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return sampling.pack_sequences(
        base, "doc_id", "n_tokens", budget=256, n_buckets=8
    )


@query(
    "tx11_tfidf_topk",
    sql=f"""
    WITH ex AS (
      SELECT doc_id, lang, unnest({_TOKS}) AS token FROM documents
    ), tf AS (
      SELECT lang, token, COUNT(*) AS tf FROM ex GROUP BY lang, token
    ), dfreq AS (
      SELECT token, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, token FROM ex) GROUP BY token
    ), s AS (
      SELECT lang, token, tf, df, tf::DOUBLE / df AS score
      FROM tf JOIN dfreq USING (token)
    )
    SELECT * FROM (
      SELECT lang, token, tf, df, score,
             CAST(row_number() OVER (
               PARTITION BY lang ORDER BY score DESC, token
             ) AS BIGINT) AS rank
      FROM s
    ) WHERE rank <= 10
    """,
)
def tx11_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 characteristic terms per language by the log-free tf-idf
    variant tf/df (see operators.textprep.tfidf_topk for why no ln)."""
    docs = load_table(spark, sf_dir, "documents")
    return textprep.tfidf_topk(docs, "text", "doc_id", "lang", k=10)


_MIX_WEIGHTS = {"src0": 3.0, "src1": 2.0, "src2": 0.5}
_MIX_HASH = _HASH60.format(x="'mix:' || CAST(doc_id AS VARCHAR)")


@query(
    "mx1_corpus_mix",
    sql=f"""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_MIX_HASH} % {1 << 40}, doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source,
           CAST(rk AS BIGINT) AS rank_in_source,
           rk::DOUBLE / CASE source
             WHEN 'src0' THEN 3.0
             WHEN 'src1' THEN 2.0
             WHEN 'src2' THEN 0.5
             ELSE 1.0 END AS interleave_key
    FROM r
    """,
)
def mx1_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus interleaving key: sorting by interleave_key yields
    sources in proportion to their weights, uniformly along the training
    order (operators.sampling.mix_sources; n_buckets=1 = exact
    per-source ranks, the oracle-exact twin of mx1b)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.mix_sources(docs, "source", "doc_id", _MIX_WEIGHTS).select(
        "doc_id", "source", "rank_in_source", "interleave_key"
    )


_MIX_SHARD_HASH = _HASH60.format(x="'mix:shard:' || CAST(doc_id AS VARCHAR)")


@query(
    "mx1b_corpus_mix_bucketed",
    sql=f"""
    WITH r AS (
      SELECT doc_id, source,
             {_MIX_SHARD_HASH} % 4 AS mix_bucket,
             row_number() OVER (
               PARTITION BY source, {_MIX_SHARD_HASH} % 4
               ORDER BY {_MIX_HASH} % {1 << 40}, doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source,
           CAST(mix_bucket AS BIGINT) AS mix_bucket,
           CAST((rk - 1) * 4 + mix_bucket + 1 AS BIGINT) AS rank_in_source,
           ((rk - 1) * 4 + mix_bucket + 1)::DOUBLE / CASE source
             WHEN 'src0' THEN 3.0
             WHEN 'src1' THEN 2.0
             WHEN 'src2' THEN 0.5
             ELSE 1.0 END AS interleave_key
    FROM r
    """,
)
def mx1b_corpus_mix_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mx1's 100 TB shape: ranks computed within (source, hash-bucket)
    — 4 parallel window tasks per source instead of one, with the
    emitted rank the unbiased global-rank estimate (VERDICT r5 item 3;
    the oracle replays the bucketed formula exactly)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.mix_sources(
        docs, "source", "doc_id", _MIX_WEIGHTS, n_buckets=4
    )


@query(
    "mx2_token_budget_select",
    sql=f"""
    WITH sig AS (
      SELECT doc_id, source,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS}) AS quality
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens, quality,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_tokens
      FROM sig
    )
    SELECT * FROM c WHERE cum_tokens <= 600
    """,
)
def mx2_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget curation: best-quality documents first
    (quality = distinct-token ratio) until each source's 600-token budget
    is spent (operators.sampling.token_budget_select)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "\\s+"), lambda t: t != "")
    sig = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "quality"
        ),
    )
    return sampling.token_budget_select(
        sig, "source", "doc_id", "n_tokens", "quality", budget=600
    ).select("doc_id", "source", "n_tokens", "quality", "cum_tokens")


_BUDGET_HASH = _HASH60.format(x="'budget:' || CAST(doc_id AS VARCHAR)")


@query(
    "mx2b_token_budget_bucketed",
    sql=f"""
    WITH sig AS (
      SELECT doc_id, source,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS}) AS quality,
             {_BUDGET_HASH} % 4 AS budget_bucket
      FROM documents
    ), c AS (
      SELECT doc_id, source,
             CAST(budget_bucket AS BIGINT) AS budget_bucket,
             n_tokens, quality,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source, budget_bucket
               ORDER BY quality DESC, doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_tokens
      FROM sig
    )
    SELECT * FROM c WHERE cum_tokens <= 150
    """,
)
def mx2b_token_budget_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mx2's 100 TB shape: each source's 600-token budget split across 4
    hash sub-buckets of 150 tokens, each with its own cumulative window
    — parallel curators, no per-source serialization (VERDICT r5
    item 3)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "\\s+"), lambda t: t != "")
    sig = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "quality"
        ),
    )
    return sampling.token_budget_select(
        sig, "source", "doc_id", "n_tokens", "quality", budget=600, n_buckets=4
    )


@query(
    "tx12_vocab_encode",
    sql=f"""
    WITH vocab AS (
      SELECT token, CAST(rank AS BIGINT) AS token_id FROM (
        SELECT token, row_number() OVER (ORDER BY n DESC, token) AS rank
        FROM (
          SELECT token, COUNT(*) AS n
          FROM (SELECT unnest({_TOKS}) AS token FROM documents)
          GROUP BY token
        )
      ) WHERE rank <= 50
    ), tok AS (
      SELECT doc_id,
             CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
             unnest(toks) AS token
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    )
    SELECT t.doc_id, t.pos, t.token, COALESCE(v.token_id, 0) AS token_id
    FROM tok t LEFT JOIN vocab v USING (token)
    """,
)
def tx12_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + encode against the corpus top-50 vocabulary (broadcast
    join; id 0 = UNK) — one scalar row per token occurrence, the shape a
    training shard writer consumes."""
    from ..operators.textstats import vocab_topk

    docs = load_table(spark, sf_dir, "documents")
    vocab = vocab_topk(docs, "text", k=50)
    return textprep.vocab_encode(docs, "text", "doc_id", vocab)


# Non-uniform, partially overlapping price bands — non-uniform so the
# range join is NOT expressible as a single floor(price/W) equi-map
# (that degenerate case needs no bin expansion).
_BANDS: list[tuple[int, float, float]] = [
    (0, 0.0, 10_000.0),
    (1, 5_000.0, 25_000.0),
    (2, 20_000.0, 60_000.0),
    (3, 50_000.0, 120_000.0),
    (4, 100.0, 1_000.0),
]


def _bands_sql() -> str:
    rows = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _BANDS)
    return f"(VALUES {rows}) AS bands(band_id, lo, hi)"


@query(
    "j2_binned_range_join",
    sql=f"""
    SELECT CAST(band_id AS BIGINT) AS band_id,
           COUNT(*) AS n_points,
           {sql_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem
    JOIN {_bands_sql()}
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band_id
    """,
)
def j2_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join of every lineitem price into overlapping
    non-uniform bands, executed as a binned equi-join (no nested-loop /
    cartesian) — operators.rangejoin.binned_range_join."""
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bands = spark.createDataFrame(_BANDS, "band_id bigint, lo double, hi double")
    joined = rangejoin.binned_range_join(
        lineitem, "l_extendedprice", bands, "lo", "hi", bin_width=8192.0
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        dsum("l_extendedprice", "sum_price"),
    )


@query(
    "dc1_ngram_decontaminate",
    sql=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 2),
                    i -> array_to_string(list_slice(toks, i, i + 3), ' ')))
               AS gram
      FROM t WHERE len(toks) >= 4
    ), bg AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0
    ), contaminated AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram)
      WHERE g.doc_id % 37 <> 0
    )
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id % 37 <> 0
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def dc1_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 37th document stands in for the
    held-out benchmark; training documents sharing any word 4-gram with
    it are dropped (textprep.ngram_decontaminate — broadcast benchmark
    gram set, train grams never shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    train = docs.where(F.col("doc_id") % 37 != 0)
    return textprep.ngram_decontaminate(
        train, bench, "text", "doc_id", n=4
    ).select("doc_id", "n_chars")


@query(
    "f6_union_evolving_schema",
    sql="""
    SELECT * FROM (
      SELECT doc_id, lang, NULL AS quality_tier FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL BY NAME
      SELECT doc_id, lang, source AS quality_tier FROM documents
      WHERE doc_id % 2 = 1
    )
    """,
)
def f6_union_evolving_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: page 2 carries a column page 1 lacks (API
    envelope evolution mid-ingest); unionByName(allowMissingColumns)
    null-fills — operators.setops.union_evolving."""
    from ..operators.setops import union_evolving

    docs = load_table(spark, sf_dir, "documents")
    page1 = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    page2 = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.col("source").alias("quality_tier")
    )
    return union_evolving([page1, page2])


@query(
    "dc2_substring_decontaminate",
    sql="""
    WITH probe AS (
      SELECT substr(text, 8, 32) AS p FROM documents WHERE doc_id = 0
    ),
    tainted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 37 <> 0 AND doc_id % 11 = 0
                  THEN text || ' ' || (SELECT p FROM probe)
                  ELSE text END AS text,
             n_chars
      FROM documents
    ),
    spans AS (
      SELECT DISTINCT substr(text, 8, 32) AS span FROM tainted
      WHERE doc_id % 37 = 0 AND length(substr(text, 8, 32)) > 0
    )
    SELECT doc_id, n_chars FROM tainted d
    WHERE doc_id % 37 <> 0
      AND NOT EXISTS (
        SELECT 1 FROM spans s WHERE contains(d.text, s.span)
      )
    """,
)
def dc2_substring_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-span decontamination: every 37th document is the
    held-out benchmark; a 32-char mid-document span of each benchmark
    doc is the contamination probe, and any training document
    containing one verbatim is dropped
    (textprep.substring_decontaminate — broadcast span list, anti
    nested-loop contains; complements dc1's tokenized n-gram rule).
    Every 11th training document is tainted with benchmark doc 0's
    span so the detector has real contamination to find (the dd9
    pattern); the oracle replays the taint."""
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.where(F.col("doc_id") == 0).select(
        F.substring("text", 8, 32).alias("__p")
    )
    tainted = docs.join(F.broadcast(probe)).select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 37 != 0) & (F.col("doc_id") % 11 == 0),
            F.concat(F.col("text"), F.lit(" "), F.col("__p")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "n_chars",
    )
    spans = tainted.where(F.col("doc_id") % 37 == 0).select(
        F.substring("text", 8, 32).alias("span")
    )
    train = tainted.where(F.col("doc_id") % 37 != 0)
    return textprep.substring_decontaminate(
        train, spans, "text", "doc_id"
    ).select("doc_id", "n_chars")


@query(
    "sp3_weighted_sample",
    sql=f"""
    SELECT doc_id, weight,
           ROUND(GREATEST(1.0, 512.0 / CAST(n_chars AS DOUBLE)), 6) AS inv_p
    FROM (
      SELECT doc_id, n_chars, CAST(n_chars AS BIGINT) AS weight,
             {_HASH60.format(x="'wsample:' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    )
    WHERE CAST(h AS DECIMAL(38,0)) * 512
        < CAST(n_chars AS DECIMAL(38,0)) * 1152921504606846976
    """,
)
def sp3_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic length-proportional Bernoulli sample with
    Horvitz-Thompson inverse-probability weights: P(keep) =
    min(1, n_chars/512), so short docs are down-sampled and docs past
    512 chars saturate at p = 1 (both branches exercised at this SF).
    The keep decision is exact DECIMAL(38,0) integer arithmetic on the
    60-bit id hash — float-free, so Spark and the SQL replay agree on
    every boundary row. Zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.weighted_sample(
        docs, "doc_id", "n_chars", rate_num=1, rate_den=512
    )


def _sp4_sql() -> str:
    # import deferred to call time is unnecessary — dedup_queries is a
    # sibling registry module with no import back-edge to this one
    from .dedup_queries import CLOSURE_CTES

    bkt = _HASH60.format(x="'split:' || CAST(cluster_id AS VARCHAR)")
    return f"""
    WITH RECURSIVE {CLOSURE_CTES},
    assigned AS (
      SELECT d.doc_id,
             COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cl ON cl.node = d.doc_id
    )
    SELECT doc_id, cluster_id,
           bkt AS split_bucket,
           CASE WHEN bkt < 80 THEN 'train'
                WHEN bkt < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, cluster_id, {bkt} % 100 AS bkt FROM assigned)
    """


@query("sp4_cluster_aware_split", sql=_sp4_sql())
def sp4_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free split: near-dup clusters (MinHash pairs -> connected
    components, the dd8 pipeline) decide the train/val/test assignment,
    so no document can land in eval while a near-duplicate of it sits in
    train. The oracle recomputes the clusters with a brute-force
    recursive-CTE closure and replays the identical hash decision on the
    cluster id — bit-equal split labels prove both the cluster labels
    and the assignment rule."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.8)
    clusters = dedup.connected_components(pairs.select("id_a", "id_b"))
    return sampling.cluster_split(docs, clusters, "doc_id").select(
        "doc_id", "cluster_id", "split_bucket", "split"
    )


_DC_SQL = """
    WITH probe AS (
      SELECT substr(text, 8, 32) AS p FROM documents WHERE doc_id = 0
    ),
    tainted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 37 <> 0 AND doc_id % 11 = 0
                  THEN text || ' ' || (SELECT p FROM probe)
                  ELSE text END AS text,
             n_chars
      FROM documents
    ),
    spans AS (
      SELECT DISTINCT substr(text, 8, 32) AS span FROM tainted
      WHERE doc_id % 37 = 0 AND length(substr(text, 8, 32)) > 0
    )
    SELECT doc_id, n_chars FROM tainted d
    WHERE doc_id % 37 <> 0
      AND NOT EXISTS (
        SELECT 1 FROM spans s WHERE contains(d.text, s.span)
      )
    """


@query("dc3_decontaminate_aho_corasick", sql=_DC_SQL)
def dc3_decontaminate_aho_corasick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dc2's exact contamination scenario solved by the LARGE-span-set
    tier: the benchmark spans compile into one Aho-Corasick automaton
    (textprep.substring_decontaminate_ac) and each training document is
    scanned in a single linear pass inside an Arrow mapInPandas kernel —
    pattern-count-independent, the shape dc2's docstring prescribes past
    ~1e4 spans. Same oracle as dc2, so the two tiers are proven
    row-identical on real contamination."""
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.where(F.col("doc_id") == 0).select(
        F.substring("text", 8, 32).alias("__p")
    )
    tainted = docs.join(F.broadcast(probe)).select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 37 != 0) & (F.col("doc_id") % 11 == 0),
            F.concat(F.col("text"), F.lit(" "), F.col("__p")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "n_chars",
    )
    spans = tainted.where(F.col("doc_id") % 37 == 0).select(
        F.substring("text", 8, 32).alias("span")
    )
    train = tainted.where(F.col("doc_id") % 37 != 0)
    return textprep.substring_decontaminate_ac(
        train, spans, "text", "doc_id"
    ).select("doc_id", "n_chars")


@query(
    "sp5_exact_stratified_sample",
    sql=f"""
    SELECT doc_id, lang, sample_rank FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS sample_rank
      FROM (
        SELECT doc_id, lang,
               {_HASH60.format(x="'xsample:' || CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
      )
    ) WHERE sample_rank <= 20
    """,
)
def sp5_exact_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 uniform docs per language (top-20 by id hash) — the
    fixed-size complement of sp2's Bernoulli sampler. Spark computes it
    with the two-window sub-bucketed top-k (no stratum funnels through
    one task); the oracle replays the straightforward single-window
    definition — identical ranks prove the decomposition."""
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.exact_stratified_sample(docs, "lang", 20, "doc_id")
    return out.select(
        "doc_id", "lang", F.col("sample_rank").cast("bigint").alias("sample_rank")
    )


@query(
    "fb1_quantile_binning",
    sql="""
    WITH cuts AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.50) AS q2,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY o_orderpriority
    ), binned AS (
      SELECT o.o_orderpriority,
             CASE WHEN o_totalprice <= q1 THEN 0
                  WHEN o_totalprice <= q2 THEN 1
                  WHEN o_totalprice <= q3 THEN 2
                  ELSE 3 END AS bin,
             o_totalprice
      FROM orders o JOIN cuts USING (o_orderpriority)
    )
    SELECT o_orderpriority, CAST(bin AS BIGINT) AS bin,
           COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM binned GROUP BY o_orderpriority, bin
    """,
)
def fb1_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group equal-frequency feature binning (QuantileDiscretizer
    shape): exact quartile boundaries per order priority in ONE
    aggregate over the 5 group keys (Spark `percentile` == DuckDB
    `quantile_cont`, the d9 parity pair), broadcast back onto the scan,
    bin assignment as a pure projection, then the per-bin profile. The
    boundary statistic never moves row data — the only full-stream
    shuffle is the final (priority, bin) aggregate of map-side-combined
    partials. MLlib's approxQuantile trades this exactness for a
    streaming sketch; at 100 TB swap the percentile call for
    sk2's mergeable histogram quantiles and keep the identical
    broadcast-back plan."""
    orders = load_table(spark, sf_dir, "orders")
    cuts = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    p = F.col("o_totalprice")
    binned = orders.join(F.broadcast(cuts), "o_orderpriority").select(
        "o_orderpriority",
        F.when(p <= F.col("q1"), 0)
        .when(p <= F.col("q2"), 1)
        .when(p <= F.col("q3"), 2)
        .otherwise(3)
        .cast("bigint")
        .alias("bin"),
        p.alias("price"),
    )
    return binned.groupBy("o_orderpriority", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("price").alias("lo"),
        F.max("price").alias("hi"),
    )


@query(
    "sp6_temporal_split",
    sql="""
    WITH cut AS (
      SELECT quantile_cont(epoch(o_orderdate), 0.8) AS c FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN epoch(o_orderdate) <= c THEN 'train' ELSE 'test' END
             AS split
    FROM orders, cut
    """,
)
def sp6_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/test split at the exact 80th percentile of the
    order-date distribution — the leakage-free split for forecasting
    tasks, where hash splits (sp1) would let the future leak into
    training. The cutoff is ONE exact-percentile row (epoch seconds,
    integer-exact, so `<=` lands identically on both engines) broadcast
    onto the scan; the assignment is a pure projection. Composes with
    sp4's cluster-awareness when near-dup docs straddle the cut."""
    orders = load_table(spark, sf_dir, "orders")
    cut = orders.agg(
        F.expr("percentile(unix_seconds(cast(o_orderdate as timestamp)), 0.8)")
        .alias("c")
    )
    return orders.join(F.broadcast(cut)).select(
        "o_orderkey",
        F.when(
            F.unix_seconds(F.col("o_orderdate").cast("timestamp"))
            <= F.col("c"),
            "train",
        )
        .otherwise("test")
        .alias("split"),
    )


_TEMP_HASH = _HASH60.format(x="'temp:' || CAST(doc_id AS VARCHAR)")


@query(
    "mx3_temperature_flatten",
    sql=f"""
    WITH counts AS (
      SELECT lang, count(*)::BIGINT AS n_source FROM documents GROUP BY lang
    ), mn AS (
      SELECT min(n_source)::BIGINT AS n_min FROM counts
    ), rates AS (
      SELECT lang, n_source,
             CAST(floor(sqrt(n_min::DOUBLE / n_source::DOUBLE) * 1000000)
                  AS BIGINT) AS keep_thresh
      FROM counts, mn
    )
    SELECT d.doc_id, d.lang, r.n_source, r.keep_thresh,
           {_TEMP_HASH} % 1000000 AS temp_bucket
    FROM documents d JOIN rates r USING (lang)
    WHERE {_TEMP_HASH} % 1000000 < r.keep_thresh
    """,
)
def mx3_temperature_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α-temperature language rebalancing at T=2 (kept docs per language
    ∝ sqrt(n_lang), anchored at the smallest language) — the standard
    multilingual data-mixing smoothing, as a deterministic hash-Bernoulli
    so the oracle replays every keep decision bit-for-bit. The rate math
    is one divide + one sqrt + one multiply + floor, all IEEE
    correctly-rounded, so the integer threshold agrees cross-engine;
    the corpus never shuffles (per-row projection against a broadcast
    rate table). Complements mx1 (weighted interleave order) and mx2
    (quality-greedy token budgets): mx3 decides MEMBERSHIP by source
    size, the others decide order and budget."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.temperature_flatten(docs, "lang", "doc_id", temperature=2)


@query(
    "tx33_c4_line_filter",
    sql=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), lined AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) + 1, 8),
                            i -> array_to_string(list_slice(toks, i, i + 7), ' '))
               AS lines
      FROM t WHERE len(toks) >= 1
    ), f AS (
      SELECT doc_id, lines,
             list_filter(lines,
               l -> len(string_split_regex(trim(l), ' +')) >= 3
                    AND NOT contains(lower(l), 'slow')) AS kept,
             array_to_string(lines, chr(10)) AS lined_text
      FROM lined
    )
    SELECT doc_id,
           len(lines)::BIGINT AS n_lines,
           len(kept)::BIGINT AS n_kept_lines,
           -- DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
           COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
           (NOT contains(lower(lined_text), 'lorem ipsum')
            AND NOT contains(lined_text, '{{')
            AND len(kept) >= 3) AS doc_kept
    FROM f
    """,
)
def tx33_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning over the documents corpus. The synthetic corpus has no
    newlines, so line structure is synthesized first (8-token chunks —
    the dd12 windowing idiom) and the rules that bite here are the
    word-count floor and a blocklist term ('slow' stands in for C4's
    'javascript', which this vocabulary never emits); the terminal-
    punctuation and doc-blocklist rules are exercised on crafted
    fixtures in tests/test_prep.py. The oracle replays chunking and
    every line keep decision verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    lined = docs.select(
        "doc_id", toks.alias("toks")
    ).where(F.size("toks") >= 1).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.size("toks"), F.lit(8)),
                lambda s: F.array_join(F.slice(F.col("toks"), s, 8), " "),
            ),
            "\n",
        ).alias("lined_text"),
    )
    return textprep.c4_line_filter(
        lined,
        "lined_text",
        "doc_id",
        min_words=3,
        blocklist=("slow",),
        require_terminal_punct=False,
        doc_blocklist=("lorem ipsum", "{"),
        min_kept_lines=3,
    )


@query(
    "sp7_negative_sampling",
    sql="""
    WITH pos AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), np AS (
      SELECT MAX(p_partkey)::BIGINT AS n_items FROM part
    ), cand AS (
      SELECT user_id,
             CAST('0x' || substr(md5('negs_' || user_id || '_' || item_id
                                     || '_' || j), 1, 15) AS BIGINT)
               % n_items + 1 AS item_id
      FROM pos, np, (SELECT unnest(range(0, 4)) AS j) jj
    ), negs AS (
      SELECT DISTINCT user_id, item_id FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM pos p
                        WHERE p.user_id = c.user_id
                          AND p.item_id = c.item_id)
    )
    SELECT user_id, item_id, 1 AS label FROM pos
    UNION ALL
    SELECT user_id, item_id, 0 AS label FROM negs
    """,
)
def sp7_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered negative sampling over the customer-part interaction
    set (4 hash-drawn negatives per positive, anti-joined against the
    positive set — sampling.negative_sample). The md5 draw replays in
    the oracle verbatim; determinism means partition retries and both
    engines regenerate the identical labeled dataset."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pos = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select(
        F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item")
    )
    n_items = part.agg(F.max("p_partkey").cast("bigint")).collect()[0][0]
    return sampling.negative_sample(
        pos, "user", "item", n_items=F.lit(n_items), m=4
    )


@query(
    "sp8_kfold_splits",
    sql="""
    WITH folds AS (
      SELECT o_orderkey,
             CAST('0x' || substr(md5('kfold_' || o_orderkey), 1, 15)
                  AS BIGINT) % 5 AS fold
      FROM orders
    )
    SELECT fold, COUNT(*)::BIGINT AS n_rows,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM folds GROUP BY fold
    """,
)
def sp8_kfold_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment (k=5) by salted-hash
    arithmetic — the hash_split family generalized to k partitions:
    every row's fold is a pure function of its key, so folds are
    disjoint, exhaustive, retry-stable, and reproducible on any engine
    with NO shuffle at assignment time (the verification aggregate here
    shuffles 5 keys). Train/test for fold i = (fold != i, fold == i) as
    plain pushdown-able predicates — k models share one materialized
    assignment instead of k resamples."""
    orders = load_table(spark, sf_dir, "orders")
    folds = orders.select(
        "o_orderkey",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("kfold_"), F.col("o_orderkey"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 5
        ).alias("fold"),
    )
    return folds.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


_PRIO_HASH = _HASH60.format(x="'prio:' || CAST(doc_id AS VARCHAR)")
_TWO53 = 1 << 53


@query(
    "mx4_budget_apportionment",
    sql="""
    WITH per AS (
      SELECT source, SUM(n_chars)::BIGINT AS weight
      FROM documents GROUP BY 1
    ), t AS (
      SELECT SUM(weight)::BIGINT AS tot FROM per
    ), q AS (
      SELECT source, weight,
             (CAST(100000 AS BIGINT) * weight) // tot AS floor_alloc,
             (CAST(100000 AS BIGINT) * weight) % tot AS remainder
      FROM per, t
    ), l AS (
      SELECT CAST(100000 - SUM(floor_alloc) AS BIGINT) AS leftover FROM q
    ), r AS (
      SELECT *, row_number() OVER (ORDER BY remainder DESC, source) AS rn
      FROM q
    )
    SELECT source, weight, floor_alloc, remainder,
           CAST(CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS extra,
           floor_alloc
             + CAST(CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM r, l
    """,
)
def mx4_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment of a 100k-unit corpus
    budget across sources by total character weight
    (operators.sampling.apportion_budget): the integer-exact allocator
    that feeds mx2's per-source token-budget cut — allocations sum to
    exactly the budget, with no float-share rounding drift."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.apportion_budget(docs, "source", "n_chars", budget=100000)


@query(
    "sp9_priority_sample",
    sql=f"""
    WITH p AS (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) AS weight,
             CAST(n_chars AS DOUBLE)
               / (CAST({_PRIO_HASH} % {_TWO53} + 1 AS DOUBLE)
                  / {float(_TWO53)}) AS priority
      FROM documents WHERE n_chars > 0
    ), r AS (
      SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
      FROM p
    ), t AS (
      SELECT coalesce((SELECT priority FROM r WHERE rn = 21), 0.0) AS tau
    )
    SELECT doc_id, weight, priority, tau,
           greatest(CAST(weight AS DOUBLE), tau) AS est_weight
    FROM r, t WHERE rn <= 20
    """,
)
def sp9_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size-20 weighted sample of the corpus by document length
    with Duffield–Lund–Thorup unbiased weight estimates
    (operators.sampling.priority_sample) — the fixed-budget counterpart
    of sp3's Bernoulli importance resample: pick EXACTLY k documents,
    longest-favored, and keep subset-sum estimation exact via
    est_weight = max(w, tau)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.priority_sample(docs, "doc_id", "n_chars", k=20)


_FFD_HASH = _HASH60.format(x="'ffd:' || CAST(doc_id AS VARCHAR)")
_FFD_FITS = (
    "list_filter(list_transform(r.bins, (x, k) -> {{'bb': x, 'kk': k}}),"
    " t -> t.bb + s.n <= 256)"
).format()


@query(
    "pk2_ffd_packing",
    sql=f"""
    WITH RECURSIVE b AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n,
             {_FFD_HASH} % 8 AS pack_bucket
      FROM documents
    ), seq AS (
      SELECT doc_id, n, pack_bucket,
             ROW_NUMBER() OVER (PARTITION BY pack_bucket
                                ORDER BY n DESC, doc_id) AS i
      FROM b
    ), rec AS (
      SELECT pack_bucket, i, doc_id, n,
             [n]::BIGINT[] AS bins, CAST(0 AS BIGINT) AS bin_id
      FROM seq WHERE i = 1
      UNION ALL
      SELECT s.pack_bucket, s.i, s.doc_id, s.n,
             CASE WHEN len({_FFD_FITS}) > 0
                  THEN list_transform(r.bins, (x, k) ->
                         CASE WHEN k = {_FFD_FITS}[1].kk
                              THEN x + s.n ELSE x END)
                  ELSE list_append(r.bins, s.n) END,
             CAST(CASE WHEN len({_FFD_FITS}) > 0
                       THEN {_FFD_FITS}[1].kk - 1
                       ELSE len(r.bins) END AS BIGINT)
      FROM seq s
      JOIN rec r ON s.pack_bucket = r.pack_bucket AND s.i = r.i + 1
    )
    SELECT doc_id, pack_bucket, n AS n_tokens, bin_id FROM rec
    """,
)
def pk2_ffd_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing 256-token packing across 8 parallel hash
    buckets (operators.sampling.ffd_pack) — the padding-waste upgrade
    over pk1's next-fit-in-id-order: largest doc first, each into the
    first bin with room. The oracle replays the identical integer fold
    as a per-bucket recursive CTE carrying the bin-load list (DuckDB's
    1-based lambda index normalized to the 0-based bin_id; struct field
    names chosen to dodge DuckDB's lambda-variable shadowing)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), "\\s+"), lambda t: t != ""))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return sampling.ffd_pack(
        base, "doc_id", "n_tokens", budget=256, n_buckets=8
    )


_SEL_HASH = _HASH60.format(x="'sel:' || CAST(doc_id AS VARCHAR)")


@query(
    "mx5_apportioned_selection",
    sql=f"""
    WITH per AS (
      SELECT source, SUM(n_chars)::BIGINT AS weight
      FROM documents GROUP BY 1
    ), t AS (
      SELECT SUM(weight)::BIGINT AS tot FROM per
    ), q AS (
      SELECT source, weight,
             (CAST(100 AS BIGINT) * weight) // tot AS floor_alloc,
             (CAST(100 AS BIGINT) * weight) % tot AS remainder
      FROM per, t
    ), l AS (
      SELECT CAST(100 - SUM(floor_alloc) AS BIGINT) AS leftover FROM q
    ), r AS (
      SELECT *, row_number() OVER (ORDER BY remainder DESC, source) AS rn
      FROM q
    ), alloc AS (
      SELECT source,
             floor_alloc
               + CAST(CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS alloc
      FROM r, l
    ), ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source ORDER BY {_SEL_HASH}, doc_id
             ) AS pick_rank
      FROM documents
    )
    SELECT ranked.source, doc_id, pick_rank
    FROM ranked JOIN alloc USING (source)
    WHERE pick_rank <= alloc
    """,
)
def mx5_apportioned_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-assembly loop closed: Hamilton-apportion a 100-doc
    global budget across sources by character weight (mx4's
    apportion_budget — allocations sum to EXACTLY the budget), then
    each source contributes exactly its allocation, picked by
    deterministic hash rank (rerun- and backfill-stable, the mx1
    interleave-key discipline). Output size == budget, by construction
    and cross-engine bit-exactly.

    Scale: the apportionment runs at source grain; the per-source rank
    window is mx2's shape — sources skewed enough to serialize take the
    documented sub-bucketed variant (mx2b), unchanged here because the
    CUT depends only on rank within source."""
    docs = load_table(spark, sf_dir, "documents")
    alloc = sampling.apportion_budget(
        docs, "source", "n_chars", budget=100
    ).select("source", "alloc")
    h = sampling.shared_hash60(
        F.concat(F.lit("sel:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = docs.select("doc_id", "source").withColumn(
        "pick_rank", F.row_number().over(w).cast("bigint")
    )
    return (
        ranked.join(F.broadcast(alloc), "source")
        .where(F.col("pick_rank") <= F.col("alloc"))
        .select("source", "doc_id", "pick_rank")
    )


def _boot_u(r: int) -> str:
    h = _HASH60.format(x=f"'boot{r}:' || CAST(doc_id AS VARCHAR)")
    return f"(CAST({h} % {_TWO53} + 1 AS DOUBLE) / {float(_TWO53)})"


def _boot_w(r: int) -> str:
    terms = " + ".join(
        f"CASE WHEN {_boot_u(r)} >= {t!r} THEN 1 ELSE 0 END"
        for t in sampling.POISSON1_CDF
    )
    return f"CAST({terms} AS BIGINT) AS w{r}"


@query(
    "sp10_poisson_bootstrap",
    sql=f"""
    SELECT doc_id, {_boot_w(0)}, {_boot_w(1)}, {_boot_w(2)}
    FROM documents
    """,
)
def sp10_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic Poisson(1) bootstrap replicates over the
    corpus as integer WEIGHT columns
    (operators.sampling.poisson_bootstrap_weights) — the shuffle-free
    resampling that lets any downstream aggregate produce bootstrap
    confidence intervals by multiplying through w0..w2 instead of
    copying the data three times."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.poisson_bootstrap_weights(
        docs.select("doc_id"), "doc_id", n_replicates=3
    )


_RO_CUTOFFS = ("1997-01-01", "1998-07-01", "2000-01-01")
_RO_HORIZON_DAYS = 180


@query(
    "sp11_rolling_origin",
    sql=f"""
    WITH folds(fold, cutoff) AS (VALUES
      {", ".join(f"({i}, DATE '{c}')" for i, c in enumerate(_RO_CUTOFFS))}
    )
    SELECT f.fold::BIGINT AS fold, o.o_orderkey,
           CASE WHEN o.o_orderdate < f.cutoff THEN 'train'
                ELSE 'test' END AS role
    FROM orders o JOIN folds f
      ON o.o_orderdate < f.cutoff + INTERVAL {_RO_HORIZON_DAYS} DAY
    """,
)
def sp11_rolling_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) cross-validation folds for
    time-series models: per cutoff, everything before it is train and
    the next 180 days are test — the evaluation protocol where random
    k-fold (sp8) silently leaks the future into training. Emitted long
    (fold, orderkey, role); rows beyond a fold's test horizon are
    excluded so each fold is a self-contained train/test pair.

    Exactness: pure integer date comparisons against literal cutoffs.
    Scale: the folds table is a 3-row broadcast; the fan-out is at most
    #folds per row and the assignment is a projection — no shuffle at
    all (sp6's temporal split, vectorized across origins)."""
    orders = load_table(spark, sf_dir, "orders")
    folds = spark.createDataFrame(
        [(i, c) for i, c in enumerate(_RO_CUTOFFS)], "fold long, cutoff string"
    ).select("fold", F.col("cutoff").cast("date").alias("cutoff"))
    j = orders.join(
        F.broadcast(folds),
        F.col("o_orderdate")
        < F.date_add(F.col("cutoff"), _RO_HORIZON_DAYS),
    )
    return j.select(
        "fold",
        "o_orderkey",
        F.when(F.col("o_orderdate") < F.col("cutoff"), "train")
        .otherwise("test")
        .alias("role"),
    )


_BAL_HASH = _HASH60.format(x="'bal:' || CAST(doc_id AS VARCHAR)")


@query(
    "sp12_class_balance",
    sql=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY {_BAL_HASH}, doc_id
             ) AS rn
      FROM documents
    ), target AS (
      SELECT MIN(n) AS n_min FROM (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
      )
    )
    SELECT doc_id, lang, rn::BIGINT AS pick_rank
    FROM ranked, target WHERE rn <= n_min
    """,
)
def sp12_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact class-balanced downsample: every language contributes
    EXACTLY min-class-count documents, picked by deterministic hash
    rank — the classifier-training counterweight to mx3's temperature
    softening (alpha -> 0 limit, but exact-size instead of Bernoulli).
    Rerun-stable, and growing a majority class never changes which of
    its documents are kept until the minority count itself moves.

    Scale: sp5's sub-bucketed exact-stratified machinery is the skew
    path for a serialized per-class window; the target is a 1-row
    broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    h = sampling.shared_hash60(
        F.concat(F.lit("bal:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = docs.select(
        "doc_id", "lang", F.row_number().over(w).cast("bigint").alias("pick_rank")
    )
    target = docs.groupBy("lang").count().agg(
        F.min("count").alias("n_min")
    )
    return (
        ranked.crossJoin(F.broadcast(target))
        .where(F.col("pick_rank") <= F.col("n_min"))
        .select("doc_id", "lang", "pick_rank")
    )


# --- fv6: weight-of-evidence / information-value encoding -----------------


@query(
    "fv6_woe_encoding",
    sql="""
    WITH c AS (
      SELECT o_orderpriority AS category,
             CAST(SUM(CASE WHEN o_orderstatus != 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_good,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_bad
      FROM orders GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(n_good) AS BIGINT) AS g,
             CAST(SUM(n_bad) AS BIGINT) AS b
      FROM c
    )
    SELECT category, n_good, n_bad,
           CAST(round(1000000 * ln((n_good * b)::DOUBLE
             / (n_bad * g)::DOUBLE)) AS BIGINT) AS woe_micro,
           CAST(round(1000000 * ln((n_good * b)::DOUBLE
             / (n_bad * g)::DOUBLE)) AS BIGINT)::DOUBLE / 1000000.0 AS woe,
           (n_good::DOUBLE / g - n_bad::DOUBLE / b)
             * (CAST(round(1000000 * ln((n_good * b)::DOUBLE
                 / (n_bad * g)::DOUBLE)) AS BIGINT)::DOUBLE / 1000000.0)
             AS iv_contrib
    FROM c, t
    """,
)
def fv6_woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + per-category information value of
    order priority against the 'F' order status — the classic credit-
    scorecard feature transform (the reference's loan domain). WOE =
    ln(good-share / bad-share) is the one transcendental; it is
    quantized to integer micro-nats on the DRIVER from the collected
    category counts (bounded state: one row per category) through the
    same rounding-boundary guard as the DSIR weights
    (sampling.guarded_log_qround), so woe_micro is an exact integer on both
    engines, and the iv_contrib float arithmetic is a pinned-order
    chain of IEEE ops over exact integers. One aggregate scan; the
    result is category-grain."""
    import math as _math

    orders = load_table(spark, sf_dir, "orders")
    counts = (
        orders.groupBy(F.col("o_orderpriority").alias("category"))
        .agg(
            F.sum(
                F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)
            ).cast("bigint").alias("n_good"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).cast("bigint").alias("n_bad"),
        )
    )
    rows = counts.collect()
    g = sum(r["n_good"] for r in rows)
    b = sum(r["n_bad"] for r in rows)
    woe = {
        r["category"]: sampling.guarded_log_qround(
            1_000_000 * _math.log((r["n_good"] * b) / (r["n_bad"] * g)),
            f"woe[{r['category']}]",
        )
        for r in rows
    }
    wmap = F.create_map(
        *[F.lit(x) for kv in woe.items() for x in kv]
    )
    woe_micro = wmap[F.col("category")].cast("bigint")
    woe_d = woe_micro.cast("double") / F.lit(1_000_000.0)
    return counts.select(
        "category",
        "n_good",
        "n_bad",
        woe_micro.alias("woe_micro"),
        woe_d.alias("woe"),
        (
            (
                F.col("n_good").cast("double") / F.lit(float(g))
                - F.col("n_bad").cast("double") / F.lit(float(b))
            )
            * woe_d
        ).alias("iv_contrib"),
    )


# --- fv7: tf-idf characteristic terms (exact linear idf) -------------------


@query(
    "fv7_tfidf_terms",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2
    ), dfq AS (
      SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1
    ), n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents)
    SELECT doc_id, term, tf, df, score_scaled, rank FROM (
      SELECT t.doc_id, t.term, t.tf, d.df,
             (t.tf * ((n.n_docs * 1000000) // d.df))::BIGINT AS score_scaled,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf * ((n.n_docs * 1000000) // d.df) DESC,
                        t.term ASC
             )::INT AS rank
      FROM tf t JOIN dfq d USING (term), n
    ) WHERE rank <= 3
    """,
)
def fv7_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms by fixed-point tf-idf
    (textstats.tfidf_top_terms): score = tf * ((N * 1e6) div df), the
    LINEAR-idf family member — monotone decreasing in df like ln-idf,
    but exact integer end-to-end (the iv2/BM25 rational-idf
    discipline), so the ranking is bit-identical across engines. The
    feature-extraction complement of tx16's chi2 terms (which are
    class-conditional; these are corpus-conditional)."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.tfidf_top_terms(docs, "text", "doc_id", k=3)


# --- fb2: winsorized robust statistics ------------------------------------


@query(
    "fb2_winsorized_stats",
    sql="""
    WITH cents AS (
      SELECT c_custkey, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM customer
    ), ranked AS (
      SELECT c_mktsegment, cents,
             CAST(row_number() OVER (
               PARTITION BY c_mktsegment ORDER BY cents, c_custkey
             ) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
      FROM cents
    ), cuts AS (
      SELECT c_mktsegment,
             MIN(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END)
               AS p05_cents,
             MIN(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END)
               AS p95_cents
      FROM ranked GROUP BY c_mktsegment
    )
    SELECT r.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(r.cents) AS BIGINT) AS sum_cents,
           CAST(SUM(LEAST(GREATEST(r.cents, c.p05_cents), c.p95_cents))
             AS BIGINT) AS win_sum_cents,
           CAST(SUM(CASE WHEN r.cents < c.p05_cents THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_low,
           CAST(SUM(CASE WHEN r.cents > c.p95_cents THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_high,
           c.p05_cents, c.p95_cents
    FROM ranked r JOIN cuts c USING (c_mktsegment)
    GROUP BY r.c_mktsegment, c.p05_cents, c.p95_cents
    """,
)
def fb2_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped-at-percentile) robust statistics per
    segment — the outlier-taming feature transform that precedes any
    mean-based model feature: exact discrete p05/p95 located by RANK
    (value at row ceil(q*n) under a deterministic (value, key) total
    order — integer ceil as (q*n + 99) div 100, never a float
    quantile, so both engines cut at the identical cent), every
    balance clipped into [p05, p95], and per-segment sums before and
    after with clip counts. Complements fb1 (which BINS by continuous
    quantiles) and e17 (MAD): this is the transform that keeps the
    sum/mean estimator, just robustly.

    Scale shape: one window exchange by segment for (rank, n) — the
    percentile is found by rank arithmetic in the same pass, no
    second sort; cuts are segment-grain (5 rows) and broadcast back;
    the final agg is matrix-grain. Skewed segment sizes ride the
    window's hash partitioning; at extreme cardinality the rank pass
    is the same two-phase sub-bucketed top-k sp5 uses."""
    cust = load_table(spark, sf_dir, "customer")
    cents = cust.select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    ranked = cents.select(
        "c_mktsegment",
        "cents",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    cuts = ranked.groupBy("c_mktsegment").agg(
        F.min(
            F.when(F.col("rn") == F.expr("(5 * n + 99) div 100"), F.col("cents"))
        ).alias("p05_cents"),
        F.min(
            F.when(F.col("rn") == F.expr("(95 * n + 99) div 100"), F.col("cents"))
        ).alias("p95_cents"),
    )
    clipped = ranked.join(F.broadcast(cuts), "c_mktsegment")
    win = F.least(F.greatest(F.col("cents"), F.col("p05_cents")), F.col("p95_cents"))
    return clipped.groupBy("c_mktsegment", "p05_cents", "p95_cents").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.sum(win).cast("bigint").alias("win_sum_cents"),
        F.sum(
            F.when(F.col("cents") < F.col("p05_cents"), 1).otherwise(0)
        ).cast("bigint").alias("n_clip_low"),
        F.sum(
            F.when(F.col("cents") > F.col("p95_cents"), 1).otherwise(0)
        ).cast("bigint").alias("n_clip_high"),
    ).select(
        "c_mktsegment", "n", "sum_cents", "win_sum_cents",
        "n_clip_low", "n_clip_high", "p05_cents", "p95_cents",
    )


# --- mx6: epoch upsampling (data mixing WITH repetition) -------------------

_MX6_HASH = _HASH60.format(x="'epoch:' || CAST(doc_id AS VARCHAR)")
_MX6_MULT = 3  # global char budget = 3x the corpus


@query(
    "mx6_epoch_upsampling",
    sql=f"""
    WITH tot AS (
      SELECT CAST({_MX6_MULT} * SUM(n_chars) AS BIGINT) AS budget
      FROM documents
    ), per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS weight,
             CAST(SUM(n_chars) AS BIGINT) AS src_chars
      FROM documents GROUP BY 1
    ), w AS (SELECT CAST(SUM(weight) AS BIGINT) AS tot_w FROM per),
    q AS (
      SELECT source, src_chars,
             (budget * weight) // tot_w AS floor_alloc,
             (budget * weight) % tot_w AS remainder
      FROM per, w, tot
    ), l AS (
      SELECT CAST((SELECT budget FROM tot) - SUM(floor_alloc) AS BIGINT)
        AS leftover FROM q
    ), alloc AS (
      SELECT source, src_chars,
             floor_alloc + CAST(CASE WHEN rn <= leftover THEN 1 ELSE 0 END
               AS BIGINT) AS target_chars
      FROM (SELECT *, row_number() OVER (ORDER BY remainder DESC, source)
              AS rn FROM q), l
    ), csum AS (
      SELECT doc_id, source, n_chars,
             CAST(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY {_MX6_HASH}, doc_id
             ) AS BIGINT) AS cum_chars
      FROM documents
    )
    SELECT c.doc_id, c.source,
           CAST(a.target_chars // a.src_chars
                + CASE WHEN c.cum_chars - c.n_chars
                            < a.target_chars % a.src_chars
                       THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
    FROM csum c JOIN alloc a USING (source)
    """,
)
def mx6_epoch_upsampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing WITH repetition — the pretraining primitive mx5's
    budget SELECTION cannot express: when a domain's target allocation
    EXCEEDS its corpus size, every document repeats floor(target /
    domain_chars) full epochs and a hash-ranked prefix of the domain
    (cut by cumulative characters against the remainder) earns one
    extra epoch, so the domain's total emitted characters lands within
    one document of its target with zero floats. Per-domain targets
    come from Hamilton apportionment (mx4) of a {_MX6_MULT}x-corpus
    character budget by document-count weight — domains with shorter
    documents get proportionally MORE epochs, the usual uniform-weight
    upsampling pressure. Output is doc-grain (doc_id, source,
    n_repeats); the explode into physical copies is a downstream
    F.expr("explode(sequence(1, n_repeats))") the consumer applies
    after packing, never here (repeat-then-pack wastes shuffle on
    identical payloads — ship counts, not copies).

    Scale shape: domain totals are one combinable agg; the cumulative
    window partitions by source (the mx2 rank discipline — sub-bucket
    if one domain dominates); the alloc table is domain-grain and
    broadcasts back. No driver state, no collect."""
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(
        (F.lit(_MX6_MULT) * F.sum("n_chars")).cast("bigint").alias("budget")
    )
    src_chars = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("src_chars")
    )
    h = sampling.shared_hash60(
        F.concat(F.lit("epoch:"), F.col("doc_id").cast("string"))
    )
    wc = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    csum = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.sum("n_chars").over(wc).cast("bigint").alias("cum_chars"),
    )
    # Hamilton apportionment with a PLAN-SIDE budget (one-row broadcast):
    # floor/remainder arithmetic at domain grain, leftover ranked by
    # remainder — sampling.apportion_budget takes a literal int budget,
    # so the mx4 arithmetic is restated here against the budget row
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("weight")
    )
    tot_w = per.agg(F.sum("weight").cast("bigint").alias("tot_w"))
    q = (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tot_w))
        .select(
            "source",
            F.expr("(budget * weight) div tot_w").alias("floor_alloc"),
            F.expr("(budget * weight) % tot_w").alias("remainder"),
            "budget",
        )
    )
    leftover = q.groupBy().agg(
        (F.first("budget") - F.sum("floor_alloc")).cast("bigint").alias("leftover")
    )
    wr = Window.orderBy(F.desc("remainder"), F.asc("source"))
    alloc = (
        q.withColumn("rn", F.row_number().over(wr))  # domain-grain window
        .crossJoin(F.broadcast(leftover))
        .select(
            "source",
            (
                F.col("floor_alloc")
                + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0)
            ).cast("bigint").alias("target_chars"),
        )
        .join(src_chars, "source")
    )
    return csum.join(F.broadcast(alloc), "source").select(
        "doc_id",
        "source",
        (
            F.expr("target_chars div src_chars")
            + F.when(
                F.col("cum_chars") - F.col("n_chars")
                < F.expr("target_chars % src_chars"),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_repeats"),
    )


# --- mx7: curriculum schedule ------------------------------------------------


@query(
    "mx7_curriculum_schedule",
    sql=f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             (n_chars * 1000) // (len({_TOKS}) + 1) AS score
      FROM documents
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY lang ORDER BY score, doc_id)
               AS r,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM scored
    )
    SELECT lang, CAST((r - 1) * 4 // n + 1 AS BIGINT) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(score) AS BIGINT) AS min_score,
           CAST(MAX(score) AS BIGINT) AS max_score,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ranked GROUP BY lang, phase
    """,
)
def mx7_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering — schedule the corpus easy-to-hard before
    training: per-language, documents rank by an exact integer
    difficulty proxy (mean token length in milli-chars — short-token
    prose first, dense/technical text last) and split into 4
    curriculum phases by EXPLICIT rank arithmetic
    ((r-1)*4 div n + 1), not NTILE — NTILE's remainder placement is
    engine-defined, the explicit formula is bit-identical everywhere
    and is what a curriculum loader re-derives. Output is the phase
    manifest (doc counts, score boundaries, char mass) a data loader
    consumes per epoch.

    Scale shape: one (lang) exchange feeding rank + count windows and
    the phase rollup — a per-language global sort, the honest cost of
    a total curriculum order (the e1 caveat); at 100 TB you run it
    per-language-shard, which is exactly how the partitioning lands."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr(
            "(n_chars * 1000) div (size(filter(split(lower(text),"
            " '\\\\s+'), t -> t != '')) + 1)"
        ).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    ranked = scored.select(
        "lang",
        "n_chars",
        "score",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    return ranked.select(
        "lang",
        F.expr("(r - 1) * 4 div n + 1").cast("bigint").alias("phase"),
        "n_chars",
        "score",
    ).groupBy("lang", "phase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("score").cast("bigint").alias("min_score"),
        F.max("score").cast("bigint").alias("max_score"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# --- fv8: feature hashing (hashing trick) ------------------------------------


@query(
    "fv8_feature_hashing",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), hashed AS (
      SELECT doc_id, tok,
             {_HASH60.format(x='tok')} % 16 AS bucket
      FROM toks
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_tokens_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM hashed GROUP BY bucket
    """,
)
def fv8_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick) — fixed-width featurization
    with NO vocabulary state: every token maps to one of D buckets
    (D=16 here so the 31-token synthetic vocabulary actually collides
    and the collision columns are exercised; production D is 2^18+)
    through the shared 60-bit md5 hash (oracle-replayable, unlike
    xxhash64), so a model's feature space is closed before the first
    document arrives and new tokens never resize anything. Output is
    the bucket census (distinct tokens per bucket = collision load,
    occurrence mass, document reach) — the artifact that validates the
    chosen width: if hot buckets carry many distinct high-frequency
    tokens, widen D; per-doc sparse vectors are then (doc_id, bucket,
    count) without this diagnostic pass.

    Scale shape: token-stream linear, ONE (bucket)-grain combinable
    aggregate (1024 groups — the distinct-token count shuffles
    (bucket, tok) partials, still bounded by vocabulary not corpus);
    zero driver state, the fv2/fv7 contrast where the encoder itself
    is the state."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok"),
    )
    hashed = toks.select(
        "doc_id",
        "tok",
        (dedup_ops.shared_hash60(F.col("tok")) % 16).alias("bucket"),
    )
    return hashed.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.countDistinct("tok").cast("bigint").alias("n_tokens_distinct"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
