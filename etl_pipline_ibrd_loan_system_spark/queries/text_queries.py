"""Text-analysis query catalog over `documents` (operators.textstats).

Every oracle replays the exact Catalyst expression in DuckDB SQL —
token regexes, rolling-hash fold, profile argmax — so the gate checks
bit-identical values, not approximations. Cross-engine notes:
DuckDB `regexp_replace` needs the 'g' flag to match Spark's
replace-all; `list_reduce(list_prepend(0,...))` replays Spark's
`aggregate(.., lit(0), ..)` left fold exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import textstats
from ..operators.textstats import BPE_REGEX, FP_BASE, FP_MOD, LANG_PROFILES, STOPWORDS
from . import query

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"


@query(
    "tx1_token_stats",
    sql=f"""
    SELECT doc_id,
           len({_TOKS}) AS ws_tokens,
           len(regexp_extract_all(lower(text), '{BPE_REGEX}')) AS bpe_tokens,
           length(text) AS n_chars
    FROM documents
    """,
)
def tx1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = textstats.token_stats(docs, "text", "doc_id")
    return out.select(
        "doc_id",
        F.col("ws_tokens").cast("bigint").alias("ws_tokens"),
        F.col("bpe_tokens").cast("bigint").alias("bpe_tokens"),
        "n_chars",
    )


@query(
    "tx2_quality_score",
    sql=f"""
    WITH base AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), sig AS (
      SELECT doc_id,
             length(list_aggregate(toks, 'string_agg', ''))::DOUBLE
               / len(toks) AS mean_word_len,
             len(list_filter(toks,
                   x -> list_contains({list(STOPWORDS)}, x)))::DOUBLE
               / len(toks) AS stopword_ratio,
             length(regexp_replace(lower(text), '[^a-z ]', '', 'g'))::DOUBLE
               / length(text) AS alpha_ratio,
             len(list_distinct(toks))::DOUBLE / len(toks) AS uniq_ratio
      FROM base
    )
    SELECT doc_id, mean_word_len, stopword_ratio, alpha_ratio, uniq_ratio,
           least(mean_word_len / 8.0, 1.0) * 0.25
             + least(stopword_ratio * 4.0, 1.0) * 0.25
             + alpha_ratio * 0.25
             + uniq_ratio * 0.25 AS quality
    FROM sig
    """,
)
def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textstats.quality_score(docs, "text", "doc_id")


def _lang_sql() -> str:
    rows = ", ".join(
        f"('{lang}', {list(words)})" for lang, words in sorted(LANG_PROFILES.items())
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
    ), profiles(lang, words) AS (VALUES {rows}),
    scored AS (
      SELECT doc_id, lang,
             len(list_filter(words, w -> list_contains(toks, w))) AS score,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY
                 len(list_filter(words, w -> list_contains(toks, w))) DESC,
                 lang ASC
             ) AS rn
      FROM toks CROSS JOIN profiles
    )
    SELECT doc_id, score::INT AS lang_score, lang AS pred_lang
    FROM scored WHERE rn = 1
    """


@query("tx3_lang_id", sql=_lang_sql())
def tx3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textstats.lang_id(docs, "text", "doc_id")


@query(
    "tx4_doc_fingerprint",
    sql=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
             (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}
           ) AS fingerprint
    FROM documents
    """,
)
def tx4_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textstats.doc_fingerprint(docs, "text", "doc_id")


@query(
    "tx5_winnow_sketch",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS s
      FROM toks WHERE len(toks) >= 3
    ), sk AS (
      SELECT doc_id,
             list_slice(list_sort(list_distinct(list_transform(s,
               x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)))), 1, 4)
               AS sketch
      FROM sh
    )
    SELECT doc_id,
           CAST(generate_subscripts(sketch, 1) - 1 AS BIGINT) AS pos,
           unnest(sketch) AS fp
    FROM sk
    """,
)
def tx5_winnow_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnow sketch, reshaped to one (doc_id, pos, fp) row per sketch
    entry: the driver's canonicalizer sorts rows with pandas over every
    column and cannot order array cells, so the registered surface is
    scalar-only (the array-returning operator API is unchanged)."""
    docs = load_table(spark, sf_dir, "documents")
    out = textstats.winnow_fingerprints(docs, "text", "doc_id", n=3, k=4)
    return out.select("doc_id", F.posexplode("sketch")).select(
        "doc_id", F.col("pos").cast("bigint").alias("pos"), F.col("col").alias("fp")
    )


@query(
    "tx6_quality_by_lang",
    sql=f"""
    WITH base AS (
      SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(list_distinct(toks))) AS BIGINT) AS sum_uniq_tokens,
           MIN(length(text)) AS min_chars, MAX(length(text)) AS max_chars
    FROM base GROUP BY lang
    """,
)
def tx6_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level rollup of text signals — the groupBy runs on the
    map-side-combined int signals, never on raw text."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "\\s+"), lambda t: t != "")
    return (
        docs.select(
            "lang",
            F.size(F.array_distinct(toks)).cast("bigint").alias("u"),
            F.length("text").alias("c"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("u").alias("sum_uniq_tokens"),
            F.min("c").alias("min_chars"),
            F.max("c").alias("max_chars"),
        )
    )


@query(
    "tx7_vocab_topk",
    sql=f"""
    SELECT token, n, rank FROM (
      SELECT token, n,
             row_number() OVER (ORDER BY n DESC, token) AS rank
      FROM (
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest({_TOKS}) AS token FROM documents)
        GROUP BY token
      )
    ) WHERE rank <= 50
    """,
)
def tx7_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters (top-50 tokens by frequency)."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.vocab_topk(docs, "text", k=50)


@query(
    "tx13_vocab_stats",
    sql=f"""
    WITH counts AS (
      SELECT lang, token, COUNT(*) AS n
      FROM (SELECT lang, unnest({_TOKS}) AS token FROM documents)
      GROUP BY lang, token
    )
    SELECT lang,
           COUNT(*) AS vocab_size,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_count,
           CAST(SUM(n) AS BIGINT) AS token_total
    FROM counts GROUP BY lang
    """,
)
def tx13_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary statistics (corpus reporting): vocabulary
    size, hapax legomena count (singleton tokens — the Zipf tail a
    tokenizer trainer watches), total token volume. The explode
    partial-aggregates to per-partition vocabularies before the one
    (lang, token) shuffle; the final rollup is vocabulary-sized."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "\\s+"), lambda t: t != "")
    counts = (
        docs.select("lang", F.explode(toks).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax_count"),
        F.sum("n").cast("bigint").alias("token_total"),
    )


@query(
    "tx15_bigram_familiarity",
    sql="""
    WITH pairs AS (
      SELECT doc_id,
             substr(text, CAST(i AS INT), 2) AS bigram
      FROM (
        SELECT doc_id, text, unnest(range(1, length(text))) AS i
        FROM documents WHERE length(text) >= 2
      )
    ),
    model AS (
      SELECT bigram, COUNT(*) AS freq FROM pairs GROUP BY bigram
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(freq) AS BIGINT) AS freq_sum,
           ROUND(CAST(SUM(freq) AS DOUBLE) / COUNT(*), 4) AS familiarity
    FROM pairs JOIN model USING (bigram)
    GROUP BY doc_id
    """,
)
def tx15_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-model quality scoring: each document scored by the mean
    corpus frequency of its character bigrams — the integer-exact core
    of a KenLM-style n-gram filter (docs whose character sequences are
    rare in the corpus score low: OCR noise, binary spills, wrong-
    language fragments). Deliberately avoids log-probabilities in the
    oracle-checked output: counts are integers and the final division
    is one IEEE op, so both engines emit identical bits where chained
    `ln` calls could drift in the last ulp.

    Plan at 100 TB: bigram extraction is a linear projection
    (sequence+transform+explode, whole-stage codegen, no Python); the
    model table is bounded by |alphabet|^2 per script (tiny — it
    aggregates with map-side partial combine and BROADCASTS back), so
    the per-doc scoring join never shuffles the corpus. The same shape
    scales to word n-grams with a frequency floor on the model table."""
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") >= 2)
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("bigram"),
    )
    from ..cache import pin

    pairs = pin(pairs)  # feeds both the model build and the scoring join
    model = pairs.groupBy("bigram").agg(F.count(F.lit(1)).alias("freq"))
    return (
        pairs.join(F.broadcast(model), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("freq").alias("freq_sum"),
            F.round(
                F.sum("freq").cast("double") / F.count(F.lit(1)), 4
            ).alias("familiarity"),
        )
    )


@query(
    "iv1_inverted_index",
    sql=f"""
    SELECT token, df, postings FROM (
      SELECT token, COUNT(*) AS df,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings
      FROM (SELECT doc_id, unnest(list_distinct({_TOKS})) AS token
            FROM documents)
      GROUP BY token
    ) WHERE df >= 2
        AND df <= 0.8 * (SELECT COUNT(*) FROM documents)
    """,
)
def iv1_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus: token -> (document frequency,
    ascending comma-joined posting list), banded to 2 <= df <= 0.8*N in
    two phases so no reducer ever materializes a stopword's postings
    (operators/textstats.inverted_index scale notes)."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.inverted_index(
        docs, "text", "doc_id", min_df=2, max_df_frac=0.8
    )


# --- iv2: BM25-lite ranked retrieval -------------------------------------

_BM25_TERMS = ("scan", "hash", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_sql() -> str:
    """Oracle: the identical arithmetic, term scores added left-to-right
    so double rounding matches Spark bit-for-bit."""
    tf_cols = ",\n             ".join(
        f"len(list_filter({_TOKS}, t -> t = '{t}')) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ",\n             ".join(
        f"COUNT(*) FILTER (WHERE tf_{t} > 0) AS df_{t}" for t in _BM25_TERMS
    )

    def score(t: str) -> str:
        idf = f"(CAST(n AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5) / (CAST(df_{t} AS DOUBLE) + 0.5)"
        dl_norm = f"(1.0 - {_BM25_B} + {_BM25_B} * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))))"
        return (
            f"({idf}) * (CAST(tf_{t} AS DOUBLE) * ({_BM25_K1} + 1.0))"
            f" / (CAST(tf_{t} AS DOUBLE) + {_BM25_K1} * {dl_norm})"
        )

    total = " + ".join(f"({score(t)})" for t in _BM25_TERMS)
    return f"""
    WITH base AS (
      SELECT doc_id, len({_TOKS}) AS dl,
             {tf_cols}
      FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n, SUM(dl) AS sum_dl,
             {df_cols}
      FROM base
    )
    SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in _BM25_TERMS)},
           {total} AS score
    FROM base, stats
    WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0
    ORDER BY score DESC, doc_id LIMIT 10
    """


@query("iv2_bm25_topk", sql=_bm25_sql())
def iv2_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-lite top-10 retrieval for a fixed 3-term query. The idf is
    the log-free rational Robertson form (N - df + 0.5)/(df + 0.5) —
    per-term monotone in df like ln-idf but bit-replayable across
    engines (this module's no-transcendentals discipline; ln differs in
    the last ulp between libm builds). All inputs to the double
    arithmetic are exact integers (tf, dl, N, df), every operation is
    IEEE correctly-rounded, and term scores add in fixed left-to-right
    order, so Spark and DuckDB produce bit-identical scores.

    Scale shape: one projection pass computes (dl, tf per term) from
    each document — the full token stream is never shuffled; corpus
    statistics (N, Σdl, df per term) reduce to ONE row and broadcast
    back; scoring is a pure projection; top-10 is TakeOrderedAndProject
    (per-partition heaps, no global sort). At 100 TB with an ad-hoc
    term set the iv1 inverted index supplies (df, postings) instead and
    scoring joins the posting lists — this fixed-term form is the
    index-free scan twin."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _bm25_scored(docs)
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


def _bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, tf_<term>..., score) for every doc matching at least
    one _BM25_TERMS term — the shared scoring stage of iv2 (which tops
    it at 10) and iv6 (which fuses its ranking with a vector ranking).
    Expression shapes are pinned by iv2's oracle and plan gate."""
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")

    def tf_col(term: str) -> F.Column:
        # NB: a two-parameter lambda would be given (element, index) by
        # F.filter — the term must close over a dedicated function scope
        return (
            F.size(F.filter(toks, lambda x: x == term))
            .cast("bigint")
            .alias(f"tf_{term}")
        )

    base = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *[tf_col(t) for t in _BM25_TERMS],
    )
    from ..cache import pin

    base = pin(base)
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count_if(F.col(f"tf_{t}") > 0).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def score(t: str) -> F.Column:
        n, df = F.col("n").cast("double"), F.col(f"df_{t}").cast("double")
        tf = F.col(f"tf_{t}").cast("double")
        avgdl = F.col("sum_dl").cast("double") / F.col("n").cast("double")
        idf = (n - df + F.lit(0.5)) / (df + F.lit(0.5))
        dl_norm = (
            F.lit(1.0)
            - F.lit(_BM25_B)
            + F.lit(_BM25_B) * (F.col("dl").cast("double") / avgdl)
        )
        return idf * (tf * F.lit(_BM25_K1 + 1.0)) / (
            tf + F.lit(_BM25_K1) * dl_norm
        )

    total = score(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        total = total + score(t)
    any_tf = F.col(f"tf_{_BM25_TERMS[0]}")
    for t in _BM25_TERMS[1:]:
        any_tf = any_tf + F.col(f"tf_{t}")
    return (
        base.join(F.broadcast(stats))
        .filter(any_tf > 0)
        .select(
            "doc_id",
            "dl",
            *[f"tf_{t}" for t in _BM25_TERMS],
            total.alias("score"),
        )
    )


# --- tx16: chi-squared discriminative terms ------------------------------


@query(
    "tx16_chi2_terms",
    sql=f"""
    WITH ex AS (
      SELECT DISTINCT doc_id, lang, unnest(list_distinct({_TOKS})) AS token
      FROM documents
    ), n_total AS (
      SELECT COUNT(*) AS n FROM documents
    ), n_lang AS (
      SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang
    ), tl AS (
      SELECT token, lang, COUNT(*) AS a FROM ex GROUP BY token, lang
    ), t AS (
      SELECT token, SUM(a) AS dft FROM tl GROUP BY token
    ), cells AS (
      SELECT tl.token, tl.lang,
             CAST(tl.a AS DOUBLE) AS a,
             CAST(t.dft - tl.a AS DOUBLE) AS b,
             CAST(n_lang.nl - tl.a AS DOUBLE) AS c,
             CAST(n_total.n - t.dft - (n_lang.nl - tl.a) AS DOUBLE) AS d,
             CAST(n_total.n AS DOUBLE) AS n
      FROM tl JOIN t USING (token) JOIN n_lang USING (lang), n_total
    )
    SELECT * FROM (
      SELECT lang, token,
             CAST(a AS BIGINT) AS df_in_lang,
             n * (a * d - b * c) * (a * d - b * c)
               / ((a + b) * (c + d) * (a + c) * (b + d)) AS chi2,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY n * (a * d - b * c) * (a * d - b * c)
                        / ((a + b) * (c + d) * (a + c) * (b + d)) DESC,
                        token
             ) AS BIGINT) AS rank
      FROM cells
      WHERE (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0
    ) WHERE rank <= 10
    """,
)
def tx16_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 language-discriminative terms by chi-squared association —
    the classic feature-selection statistic over the (term presence x
    language) contingency table. Every cell is an exact integer count,
    the statistic is a pure rational expression of them (no
    transcendentals), and both engines evaluate the identical
    correctly-rounded double expression — bit-exact cross-engine even
    where N*(ad-bc)^2 exceeds 2^53, because IEEE multiplication rounds
    identically on identical inputs.

    Shuffle budget: one (token, lang)-keyed partial-aggregated count of
    distinct doc-term pairs, one token-keyed re-aggregate REUSING those
    partials for corpus df (never re-scanning the token stream), and
    language totals broadcast back. The per-lang rank window partitions
    by language — few huge partitions at 100 TB, so the sp5 two-window
    (lang, hash-bucket) top-k decomposition is the documented scale
    path, exactly as in tx11."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    ex = docs.select(
        "doc_id", "lang", F.explode(F.array_distinct(toks)).alias("token")
    ).distinct()
    tl = ex.groupBy("token", "lang").agg(F.count(F.lit(1)).alias("a"))
    from ..cache import pin

    tl = pin(tl)
    t = tl.groupBy("token").agg(F.sum("a").alias("dft"))
    n_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nl"))
    n_total = docs.agg(F.count(F.lit(1)).alias("n"))
    cells = (
        tl.join(t, "token")
        .join(F.broadcast(n_lang), "lang")
        .join(F.broadcast(n_total))
        .select(
            "token",
            "lang",
            F.col("a").cast("double").alias("a"),
            (F.col("dft") - F.col("a")).cast("double").alias("b"),
            (F.col("nl") - F.col("a")).cast("double").alias("c"),
            (F.col("n") - F.col("dft") - (F.col("nl") - F.col("a")))
            .cast("double")
            .alias("d"),
            F.col("n").cast("double").alias("n"),
        )
    )
    a, b, c, d, n = (F.col(x) for x in "abcdn")
    chi2 = (
        n * (a * d - b * c) * (a * d - b * c)
        / ((a + b) * (c + d) * (a + c) * (b + d))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("chi2"), "token")
    return (
        cells.where(
            ((a + b) > 0) & ((c + d) > 0) & ((a + c) > 0) & ((b + d) > 0)
        )
        .select(
            "lang",
            "token",
            a.cast("bigint").alias("df_in_lang"),
            chi2.alias("chi2"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 10)
    )


@query(
    "tx17_keyword_in_context",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), hits AS (
      SELECT doc_id, t, generate_subscripts(t, 1) AS pos, unnest(t) AS tok
      FROM toks
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           array_to_string(list_slice(t, greatest(pos - 2, 1), pos + 2), ' ')
             AS context
    FROM hits WHERE tok = 'merge'
    """,
)
def tx17_keyword_in_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context (concordance) extraction: every occurrence of
    the query term with a +/-2-token window, the corpus-linguistics
    view behind "show me how this token is used" tooling. posexplode
    carries the position, the context is an in-place array slice of the
    SAME row's token array — per-row projection only, no self-join, no
    shuffle at all (the one-stage plan is the point: a join-based
    neighbor lookup would shuffle the token stream twice). 1-based
    slice arithmetic matches list_slice exactly; both engines clamp the
    left edge with greatest(pos-2, 1)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    hits = docs.select(
        "doc_id", toks.alias("t"), F.posexplode(toks).alias("p0", "tok")
    ).where(F.col("tok") == "merge")
    pos = F.col("p0") + 1  # 1-based, as list_slice/slice index
    start = F.greatest(pos - 2, F.lit(1))
    length = pos + 2 - start + 1
    return hits.select(
        "doc_id",
        pos.cast("bigint").alias("pos"),
        F.array_join(F.slice("t", start, length), " ").alias("context"),
    )


_HTF_HASH = "CAST('0x' || substr(md5('htf:' || t), 1, 15) AS BIGINT)"


@query(
    "fv1_hashing_tf",
    sql=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), b AS (
      SELECT doc_id,
             list_transform(toks, t -> {_HTF_HASH} % 64) AS buckets
      FROM t
    )
    SELECT doc_id, j::BIGINT AS dim,
           len(list_filter(buckets, x -> x = j))::BIGINT AS tf
    FROM b CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
    """,
)
def fv1_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing TF vectors over the corpus, exploded to
    (doc_id, dim, tf) so the gate hashes scalars. Stateless featurizer:
    no vocabulary fit, nothing to broadcast; the md5 bucket assignment
    replays in the oracle so every count is value-checked. The vector
    form feeds the embedding family — tests compose it with
    random_project + cosine_topk for end-to-end text ANN."""
    docs = load_table(spark, sf_dir, "documents")
    vecs = textstats.hashing_tf(docs, "text", "doc_id", dim=64)
    return vecs.select(
        "doc_id", F.posexplode("tf_vec").alias("dim", "tf")
    ).select("doc_id", F.col("dim").cast("bigint").alias("dim"), "tf")


def _fv4_numerators(dim: int = 64) -> list[int]:
    """Deterministic stand-in for trained classifier weights, as
    FIXED-POINT numerators over denominator 97: Knuth multiplicative
    hash of the dimension index mapped to -48..48. Integer numerators
    keep the dot product exact on both engines (see
    textstats.linear_score — a float-weight fold diverged from DuckDB's
    list_sum by one ulp on ~60% of rows)."""
    return [((j * 2654435761) % 97) - 48 for j in range(dim)]


@query(
    "fv4_linear_quality_score",
    sql=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), b AS (
      SELECT doc_id,
             list_transform(toks, t -> {_HTF_HASH} % 64) AS buckets
      FROM t
    ), v AS (
      SELECT doc_id,
             list_transform(range(0, 64),
               j -> len(list_filter(buckets, x -> x = j))) AS tf
      FROM b
    ), z AS (
      SELECT doc_id,
             list_sum(list_transform(range(1, 65),
               i -> tf[i]::BIGINT
                    * ([{", ".join(str(w) for w in _fv4_numerators())}])[i]))
               AS zi
      FROM v
    )
    SELECT doc_id,
           zi::DOUBLE / 97.0 AS quality_logit,
           zi::DOUBLE / 97.0 >= 0.0 AS keep
    FROM z
    """,
)
def fv4_linear_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fasttext-style quality-classifier scoring (r7): hashing-TF
    featurize (fv1's stateless featurizer), then textstats.linear_score
    with fixed-point weights as plan literals — logit + keep verdict
    per document, zero shuffle, no UDF, no broadcast state. The oracle
    replays featurization AND the exact integer dot product with the
    identical numerator literals; the single final division is the only
    float op, so the logit is value-checked bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    vecs = textstats.hashing_tf(docs, "text", "doc_id", dim=64)
    scored = textstats.linear_score(
        vecs, "tf_vec", _fv4_numerators(), denominator=97.0,
        out_col="quality_logit",
    )
    return scored.select(
        "doc_id", "quality_logit",
        (F.col("quality_logit") >= 0.0).alias("keep"),
    )


# --- round-6 seventh wave: normalization, Gopher rules, phrase search ---


@query(
    "tx18_unicode_normalize",
    sql="""
    SELECT doc_id,
           length(inj)::BIGINT AS len_injected,
           length(nfc_normalize(inj))::BIGINT AS len_normalized,
           (length(inj) - length(nfc_normalize(inj)))::BIGINT AS n_composed,
           md5(nfc_normalize(inj)) AS norm_digest
    FROM (
      SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS inj
      FROM documents
    )
    """,
)
def tx18_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (textprep.unicode_normalize): the
    corpus is first seeded with decomposed sequences (every 'e' gains
    U+0301 COMBINING ACUTE — a deterministic projection BOTH engines
    apply, so the oracle checks real composition work, not an ASCII
    no-op), then the Arrow kernel folds e+◌́ -> é. Verified per doc:
    codepoint counts before/after (each composition removes exactly one
    codepoint) and the md5 of the normalized text — a byte-level
    equality check on the kernel's output against DuckDB's ICU
    normalizer. Scale: pure per-row map, zero shuffle."""
    from ..operators import textprep

    docs = load_table(spark, sf_dir, "documents")
    inj = docs.select(
        "doc_id",
        F.regexp_replace("text", "e", "e\u0301").alias("inj"),
    )
    norm = textprep.unicode_normalize(inj, "inj", form="NFC", out_col="norm")
    return norm.select(
        "doc_id",
        F.length("inj").cast("bigint").alias("len_injected"),
        F.length("norm").cast("bigint").alias("len_normalized"),
        (F.length("inj") - F.length("norm")).cast("bigint").alias("n_composed"),
        F.md5(F.col("norm").cast("binary")).alias("norm_digest"),
    )


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


@query(
    "tx19_gopher_rules",
    sql=f"""
    WITH feats AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             list_sum(list_transform(toks, t -> len(t)))::BIGINT AS sum_len,
             len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))::BIGINT
               AS n_alpha,
             len(list_filter(toks,
                 t -> list_contains({list(_GOPHER_STOPS)!r}, t)))::BIGINT
               AS n_stop,
             len(list_filter(toks,
                 t -> t = '#' OR t = '...'))::BIGINT AS n_sym
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t != '') AS toks
        FROM documents
      )
    )
    SELECT doc_id, n_words,
           (n_words >= 50 AND n_words <= 100000) AS wordcount_ok,
           (3 * n_words <= sum_len AND sum_len <= 10 * n_words)
             AS meanlen_ok,
           (5 * n_alpha >= 4 * n_words) AS alpha_ok,
           (n_stop >= 2) AS stopword_ok,
           (10 * n_sym <= n_words) AS symbol_ok,
           (n_words >= 50 AND n_words <= 100000
            AND 3 * n_words <= sum_len AND sum_len <= 10 * n_words
            AND 5 * n_alpha >= 4 * n_words
            AND n_stop >= 2
            AND 10 * n_sym <= n_words) AS keep
    FROM feats
    """,
)
def tx19_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1):
    word-count bounds [50, 1e5], mean word length in [3, 10],
    >=80% of words contain an alphabetic character, >=2 stop words,
    symbol-to-word ratio ('#'/'...') <= 0.1. Complements tx2 (ratio
    scores) and tx17 (C4 line rules) — the rule family used to gate
    LLM pretraining corpora, shared with the corpus pipeline plan
    (operators/textprep.py::gopher_rules). All thresholds compare in
    INTEGER space (3n <= Σlen, 5·alpha >= 4n, 10·sym <= n) so no
    division ever happens — bit-exact across engines by construction.
    Line-level Gopher rules (bullet/ellipsis fractions) need
    newline-preserving text; the fixture corpus is single-line, so they
    live with tx17's line machinery. Scale: one projection pass over
    the scan, zero shuffle, whole-stage codegen HOFs."""
    from ..operators import textprep

    docs = load_table(spark, sf_dir, "documents")
    return textprep.gopher_rules(docs, "text", "doc_id")


@query(
    "iv3_phrase_search",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t != '') AS t
      FROM documents
    )
    SELECT doc_id,
           len(list_filter(range(1, len(t)),
               i -> t[i] = 'fast' AND t[i + 1] = 'table'))::BIGINT
             AS n_matches
    FROM toks
    WHERE len(list_filter(range(1, len(t)),
              i -> t[i] = 'fast' AND t[i + 1] = 'table')) > 0
    """,
)
def iv3_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search ("fast table") through the inverted
    index: per-term postings with positions (iv1's index grown a
    position column), restricted to the query's terms BEFORE any join —
    only two terms' postings ever move — then adjacency is one integer
    equi-join (doc, pos+1 = pos) and a per-doc count. Counts overlapping
    occurrences, exactly like the oracle's per-row positional scan.
    Scale: term filter pushes into the posting build so the index scan
    prunes to the query terms; postings join on (doc_id, pos) integer
    keys; no all-token materialization survives the filter."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    postings = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    ).where(F.col("term").isin("fast", "table"))
    a = postings.where(F.col("term") == "fast").select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = postings.where(F.col("term") == "table").select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    pairs = a.join(
        b,
        (a.doc_id == b.doc_b) & (b.pos_b == a.pos_a + 1),
    )
    return pairs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches")
    )


@query(
    "u2_content_defined_chunks",
    sql="""
    WITH base AS (
      SELECT doc_id, text, length(text)::BIGINT AS n
      FROM documents WHERE length(text) > 0
    ), pos AS (
      SELECT doc_id, text, n,
             list_concat(list_concat(
               [0::BIGINT],
               list_filter(list_transform(range(8, n), p ->
                 CASE WHEN list_reduce(
                   list_transform(range(0, 8), j ->
                     ascii(substr(text, (p - 7 + j)::INTEGER, 1))::BIGINT),
                   (a, c) -> (a * 1000003 + c) % 2147483647) % 32 = 0
                 THEN p::BIGINT ELSE NULL END), p -> p IS NOT NULL)),
               [n]) AS bounds
      FROM base
    )
    SELECT doc_id, unnest(list_transform(range(0, len(bounds) - 1), i ->
      struct_pack(
        chunk_idx := i,
        chunk_len := bounds[(i + 2)::INTEGER] - bounds[(i + 1)::INTEGER],
        chunk_md5 := md5(substr(text, (bounds[(i + 1)::INTEGER] + 1)::INTEGER,
          (bounds[(i + 2)::INTEGER] - bounds[(i + 1)::INTEGER])::INTEGER)))),
      recursive := true)
    FROM pos
    """,
)
def u2_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over the corpus (expected chunk = 32
    chars, window w=8): boundaries follow content so shared passages
    chunk identically regardless of position — the dedup-stable
    alternative to tx10's fixed-size token chunks, and the storage
    layer's dedup primitive (textprep.content_defined_chunks). The
    oracle replays the rolling hash with the shared FP constants and
    the exact bounds arithmetic; md5 per chunk checks the slicing
    byte-for-byte."""
    from ..operators import textprep

    docs = load_table(spark, sf_dir, "documents")
    return textprep.content_defined_chunks(
        docs, "text", "doc_id", w=8, mask=32
    )


from ..operators.graph import pagerank_oracle_ctes as _pr_ctes

_PR_CTES = _pr_ctes(iters=3)


@query(
    "tx20_textrank_keywords",
    sql=f"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t != '') AS t
      FROM documents
    ), adjpairs AS (
      SELECT DISTINCT
        CAST('0x' || substr(md5(p.a), 1, 15) AS BIGINT) AS src,
        CAST('0x' || substr(md5(p.b), 1, 15) AS BIGINT) AS dst
      FROM toks,
        UNNEST(list_filter(list_transform(range(1, len(t)),
          i -> struct_pack(a := t[i], b := t[i + 1])),
          p -> p.a != p.b)) AS u(p)
    ),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM adjpairs
        UNION ALL SELECT dst AS src, src AS dst FROM adjpairs)
    ),
    {_PR_CTES},
    words AS (
      SELECT DISTINCT
        CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS node, w AS word
      FROM (SELECT unnest(t) AS w FROM toks)
    )
    SELECT word, rank_units FROM prfinal JOIN words USING (node)
    """,
)
def tx20_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau 2004): PageRank over
    the word-adjacency co-occurrence graph — a pure COMPOSITION of the
    text tokenizer and graph.pagerank_fixed_point, which is the point:
    the integer fixed-point rank arithmetic is partition-invariant, so
    the same operator serves trade graphs (g3) and keyword graphs
    unchanged, and the oracle replays the iterations verbatim from the
    same constants. Edge build: per-doc adjacent token pairs,
    self-loops dropped, symmetric, distinct — fan-out bounded by doc
    length; the graph's node set is the vocabulary (grows
    sub-linearly in corpus size, the Heaps'-law argument for why
    word-graph PageRank scales where document-graph PageRank needs
    partitioned ranks)."""
    from ..operators import graph as _graph
    from ..operators.dedup import shared_hash60

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    base = docs.select(toks.alias("t")).where(F.size("t") >= 2)
    pairs = base.select(
        F.explode(
            F.filter(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                ),
                lambda p: p["a"] != p["b"],
            )
        ).alias("p")
    )
    e0 = pairs.select(
        shared_hash60(F.col("p.a")).alias("src"),
        shared_hash60(F.col("p.b")).alias("dst"),
    ).distinct()
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    ranks = _graph.pagerank_fixed_point(edges, iters=3)
    words = (
        docs.select(F.explode(toks).alias("word"))
        .distinct()
        .select(shared_hash60(F.col("word")).alias("node"), "word")
    )
    return ranks.join(words, "node").select("word", "rank_units")


@query(
    "tx21_symspell_candidates",
    sql="""
    WITH vocab AS (
      SELECT DISTINCT unnest(list_filter(
        string_split_regex(lower(text), '\\s+'), t -> t != '')) AS w
      FROM documents
    ), typos AS (
      SELECT substr(w, 1, 2) || substr(w, 4) AS typo
      FROM (SELECT w FROM vocab WHERE len(w) >= 4 ORDER BY w LIMIT 5)
    ), vvar AS (
      SELECT w, unnest(list_concat([w], list_transform(range(0, len(w)),
        i -> substr(w, 1, i::INTEGER) || substr(w, (i + 2)::INTEGER))))
        AS var
      FROM vocab
    ), tvar AS (
      SELECT typo, unnest(list_concat([typo],
        list_transform(range(0, len(typo)),
          i -> substr(typo, 1, i::INTEGER) || substr(typo, (i + 2)::INTEGER))))
        AS var
      FROM typos
    )
    SELECT * FROM (
      SELECT DISTINCT t.typo, v.w AS candidate,
             levenshtein(t.typo, v.w)::BIGINT AS dist
      FROM tvar t JOIN vvar v ON t.var = v.var
    ) WHERE dist <= 1
    """,
)
def tx21_symspell_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell spell-correction candidates: dictionary words within
    edit distance 1 of each typo, found by DELETION-VARIANT blocking
    (Garbe's symmetric delete): every word and every typo explodes into
    its |w|+1 one-deletion variants; any ed<=1 pair MUST share a
    variant (delete-the-difference pigeonhole), so candidates come from
    one variant-keyed equi-join instead of vocab x typos Levenshtein —
    tx14's all-pairs non-starter solved the same way dedup banding
    solves Jaccard. The exact Levenshtein verifies candidates only.
    Typos are synthesized deterministically (3rd char dropped from the
    5 alphabetically-first length>=4 vocab words) so both engines
    derive the identical query set. Scale: variant stream is
    O(vocab * avg_len) — vocabulary-bounded (Heaps), not corpus-bounded;
    the typo side is query-sized and broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    vocab = docs.select(F.explode(toks).alias("w")).distinct()
    typos = (
        vocab.where(F.length("w") >= 4)
        .orderBy("w")
        .limit(5)
        .select(
            F.concat(
                F.substring("w", 1, 2), F.expr("substr(w, 4)")
            ).alias("typo")
        )
    )

    def variants(col: str):
        c = F.col(col)
        return F.concat(
            F.array(c),
            F.transform(
                F.sequence(F.lit(0), F.length(c) - 1),
                lambda i: F.concat(
                    c.substr(F.lit(1), i),
                    c.substr(i + 2, F.length(c)),
                ),
            ),
        )

    vvar = vocab.select("w", F.explode(variants("w")).alias("var"))
    tvar = typos.select("typo", F.explode(variants("typo")).alias("var"))
    cands = (
        F.broadcast(tvar)
        .join(vvar, "var")
        .select("typo", F.col("w").alias("candidate"))
        .distinct()
        .withColumn(
            "dist",
            F.levenshtein(F.col("typo"), F.col("candidate")).cast("bigint"),
        )
        .where(F.col("dist") <= 1)
    )
    return cands


@query(
    "tx22_kneser_ney_counts",
    sql=f"""
    WITH toks AS (
      SELECT {_TOKS} AS w FROM documents
    ),
    pairs AS (
      SELECT w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
      FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks WHERE len(w) >= 2)
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY w1, w2),
    uni AS (
      SELECT t AS word, COUNT(*) AS unigram_ct
      FROM (SELECT unnest(w) AS t FROM toks) GROUP BY t
    ),
    right_s AS (SELECT w2 AS word, COUNT(*) AS continuation_types FROM big GROUP BY w2),
    left_s AS (SELECT w1 AS word, COUNT(*) AS context_types FROM big GROUP BY w1),
    gstats AS (
      SELECT COUNT(*) AS n_types,
             SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS n2
      FROM big
    )
    SELECT u.word, u.unigram_ct,
           CAST(COALESCE(r.continuation_types, 0) AS BIGINT) AS continuation_types,
           CAST(COALESCE(l.context_types, 0) AS BIGINT) AS context_types,
           ROUND(CAST(COALESCE(r.continuation_types, 0) AS DOUBLE)
                 / (SELECT n_types FROM gstats), 6) AS pcont,
           CASE WHEN (SELECT n1 + 2 * n2 FROM gstats) = 0 THEN 0.0
                ELSE ROUND(CAST((SELECT n1 FROM gstats) AS DOUBLE)
                           / ((SELECT n1 FROM gstats)
                              + 2 * (SELECT n2 FROM gstats)), 6)
           END AS discount
    FROM uni u
    LEFT JOIN right_s r USING (word)
    LEFT JOIN left_s l USING (word)
    """,
)
def tx22_kneser_ney_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney bigram count tables over the corpus — the exact
    aggregate surface an n-gram LM training run needs (continuation
    counts, context counts, count-of-counts discount). Pure counting:
    every derived probability is integer/integer in double space, so
    both engines agree bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.kneser_ney_counts(docs, "text")


@query(
    "iv4_proximity_search",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id,
             list_filter(range(1, len(t) + 1), i -> t[i] = 'fast') AS pa,
             list_filter(range(1, len(t) + 1), i -> t[i] = 'table') AS pb
      FROM toks
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(pa,
                  i -> len(list_filter(pb, j -> abs(i - j) <= 4))))
                AS BIGINT) AS n_pairs,
           CAST(list_min(flatten(list_transform(pa,
                  i -> list_transform(
                         list_filter(pb, j -> abs(i - j) <= 4),
                         j -> abs(i - j)))))
                AS BIGINT) AS min_dist
    FROM pos
    WHERE len(pa) > 0 AND len(pb) > 0
      AND list_sum(list_transform(pa,
            i -> len(list_filter(pb, j -> abs(i - j) <= 4)))) > 0
    """,
)
def iv4_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search: 'fast' NEAR/4 'table' in either order — the
    slop generalization of iv3's exact-adjacency phrase query (Lucene's
    sloppy PhraseQuery semantics, unordered). Per matching doc: the
    qualifying position-pair count and the closest distance.

    Shape: iv3's discipline — the term filter pushes into the posting
    build so only the two query terms' postings exist, then one doc
    equi-join whose fan-out is term-frequency-bounded and a per-doc
    aggregate; the position-window test is a residual on the doc join,
    never a standalone range join. The oracle replays per-row with
    nested list lambdas (only position DIFFERENCES compare, so Spark's
    0-based and DuckDB's 1-based positions agree)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    postings = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    ).where(F.col("term").isin("fast", "table"))
    a = postings.where(F.col("term") == "fast").select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = postings.where(F.col("term") == "table").select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    dist = F.abs(F.col("pos_a") - F.col("pos_b"))
    pairs = a.join(
        b, (a.doc_id == F.col("doc_b")) & (dist <= 4)
    )
    return pairs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min(F.abs(F.col("pos_a") - F.col("pos_b")))
        .cast("bigint")
        .alias("min_dist"),
    )


@query(
    "tx23_ngram_novelty",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t != '') AS t
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks WHERE len(t) >= 2
      )
    ), df AS (
      SELECT g, COUNT(*)::BIGINT AS df FROM grams GROUP BY g
    )
    SELECT doc_id,
           COUNT(*)::BIGINT AS n_grams,
           SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM grams JOIN df USING (g)
    GROUP BY doc_id
    """,
)
def tx23_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram novelty: the fraction of a doc's DISTINCT
    bigrams that appear in no other document — the corpus-level
    originality signal dedup pipelines threshold on (a doc of entirely
    corpus-common n-grams is boilerplate even when no single pair-wise
    near-dup fires; the single-document complement of dd12's
    pair-finding). Exact integer document frequencies, one double
    division per doc.

    Scale: per-doc distinct bigrams (set semantics kill within-doc
    repetition before anything shuffles), one map-side-combined DF
    aggregate at gram grain (Heaps'-law sublinear, the tx20 argument),
    one gram-keyed equi-join back. No pairs are ever formed."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    grams_arr = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    )
    grams = (
        docs.select("doc_id", F.explode(grams_arr).alias("g")).distinct()
    )
    df = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    j = grams.join(df, "g")
    uniq = F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("bigint")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        uniq.alias("n_unique"),
        (
            uniq.cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("novelty"),
    )


@query(
    "tx24_readability",
    sql="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t != '') AS t,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
               AS n_sentences
      FROM documents
    ), counted AS (
      SELECT doc_id, n_sentences,
             len(t)::BIGINT AS n_words,
             CAST(list_sum(list_transform(t,
                    w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))
                  )) AS BIGINT) AS n_syllables
      FROM base WHERE len(t) > 0
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE)
                        / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE)
                       / CAST(n_words AS DOUBLE)) AS flesch
    FROM counted
    """,
)
def tx24_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease score per document with a mechanical
    vowel-group syllable rule (maximal [aeiouy]+ runs, floor 1 per
    word) — the classic readability gate next to tx19's Gopher rules
    and tx2's quality ratios; corpus curricula bucket documents by
    exactly this score.

    Exactness: words / sentences / syllables are exact integer counts
    from the shared regex dialect; the score is a FIXED double tree —
    two correctly-rounded divisions, two literal multiplies, two
    subtractions — identical both engines. Scale: pure per-row
    projection, zero shuffle (the tx2 shape)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    n_sent = F.greatest(
        F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
    ).cast("bigint")
    syl = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1), F.regexp_count(w, F.lit("[aeiouy]+"))
        ).cast("bigint"),
    )
    base = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        n_sent.alias("n_sentences"),
        syl.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6)
        * (
            F.col("n_syllables").cast("double")
            / F.col("n_words").cast("double")
        )
    )
    return base.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        flesch.alias("flesch"),
    )


@query(
    "iv5_boolean_retrieval",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t != '') AS t
      FROM documents
    ), flags AS (
      SELECT doc_id,
             len(list_filter(t, x -> x = 'fast')) > 0 AS has_fast,
             len(list_filter(t, x -> x = 'quick')) > 0 AS has_quick,
             len(list_filter(t, x -> x = 'error')) > 0 AS has_error
      FROM toks
    )
    SELECT doc_id, has_fast, has_quick
    FROM flags
    WHERE (has_fast OR has_quick) AND NOT has_error
    """,
)
def iv5_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval — ('fast' OR 'quick') AND NOT 'error' — as
    postings-set algebra through the inverted index: OR is a distinct
    union of the two terms' postings, NOT is a left-anti join against
    the negated term's postings. Completes the IR algebra next to iv2's
    ranked, iv3's phrase and iv4's proximity queries.

    Shape: only the THREE query terms' postings are ever materialized
    (term filter pushed into the posting build, the iv3 discipline);
    the union and anti-join are doc-keyed. The oracle replays per-row
    membership tests — same sets, opposite evaluation strategy, which
    is exactly what makes the hash check meaningful."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    postings = docs.select(
        "doc_id", F.explode(toks).alias("term")
    ).where(F.col("term").isin("fast", "quick", "error"))
    fast = postings.where(F.col("term") == "fast").select("doc_id").distinct()
    quick = postings.where(F.col("term") == "quick").select("doc_id").distinct()
    err = postings.where(F.col("term") == "error").select("doc_id").distinct()
    hits = (
        fast.withColumn("has_fast", F.lit(True))
        .join(
            quick.withColumn("has_quick", F.lit(True)),
            "doc_id",
            "full_outer",
        )
        .join(err, "doc_id", "left_anti")
    )
    return hits.select(
        "doc_id",
        F.coalesce("has_fast", F.lit(False)).alias("has_fast"),
        F.coalesce("has_quick", F.lit(False)).alias("has_quick"),
    )


@query(
    "tx26_encoding_screen",
    sql="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '�')) AS BIGINT)
             AS n_replacement,
           CAST(len(regexp_extract_all(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]'))
                AS BIGINT) AS n_control,
           CASE WHEN length(text) > 0
                THEN CAST(len(regexp_extract_all(text,
                       '[^\\x00-\\x7f]')) AS DOUBLE)
                     / CAST(length(text) AS DOUBLE) END AS non_ascii_frac,
           (len(regexp_extract_all(text, '�')) = 0
            AND len(regexp_extract_all(text,
                  '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) = 0) AS clean
    FROM documents
    """,
)
def tx26_encoding_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health screen: U+FFFD replacement-character count (the
    mojibake fingerprint of a bad decode upstream), C0 control
    characters (minus tab/newline/CR), and the non-ASCII fraction — the
    triage columns a corpus intake runs BEFORE language ID, because
    mojibake text poisons every downstream text signal while passing
    length/stopword gates. Counts are exact regex extractions in the
    shared dialect; the fraction is one double division; pure per-row
    projection, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    n_repl = F.regexp_count(F.col("text"), F.lit("�")).cast("bigint")
    n_ctrl = F.regexp_count(
        F.col("text"), F.lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]")
    ).cast("bigint")
    n_nonascii = F.regexp_count(
        F.col("text"), F.lit("[^\\x00-\\x7f]")
    ).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        F.when(
            n_chars > 0, n_nonascii.cast("double") / n_chars.cast("double")
        ).alias("non_ascii_frac"),
        ((n_repl == 0) & (n_ctrl == 0)).alias("clean"),
    )


# --- fv5: DSIR importance weights ----------------------------------------

_DSIR_HASH = "CAST('0x' || substr(md5('dsir:' || f), 1, 15) AS BIGINT)"


@query(
    "fv5_dsir_importance",
    sql=f"""
    WITH t AS (
      SELECT doc_id, lang = 'en' AS is_t, {_TOKS} AS toks FROM documents
    ), tb AS (
      SELECT doc_id, is_t,
             list_concat(toks, list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i + 1])) AS feats
      FROM t WHERE len(toks) >= 1
    ), tok AS (
      SELECT doc_id, is_t,
             unnest(list_transform(feats, f -> {_DSIR_HASH} % 256)) AS b
      FROM tb
    ), cnt AS (
      SELECT b,
             CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS traw,
             CAST(COUNT(*) AS BIGINT) AS rraw
      FROM tok GROUP BY b
    ), spine AS (
      SELECT unnest(range(0, 256)) AS b
    ), sm AS (
      SELECT spine.b,
             1 + COALESCE(traw, 0) AS tfb,
             1 + COALESCE(rraw, 0) AS rfb
      FROM spine LEFT JOIN cnt ON cnt.b = spine.b
    ), w AS (
      SELECT b,
             CAST(round(1000000 * ln(tfb::DOUBLE / rfb::DOUBLE)) AS BIGINT)
               AS wgt
      FROM sm
    ), tot AS (
      SELECT CAST(round(1000000 * ln(SUM(rfb)::DOUBLE / SUM(tfb)::DOUBLE))
               AS BIGINT) AS c
      FROM sm
    ), sc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_feats,
             CAST(SUM(wgt) AS BIGINT) AS sw
      FROM tok JOIN w ON w.b = tok.b
      GROUP BY doc_id
    )
    SELECT doc_id, n_feats,
           sw + n_feats * (SELECT c FROM tot) AS score_micro,
           (sw + n_feats * (SELECT c FROM tot))::DOUBLE / 1000000.0
             AS dsir_score
    FROM sc
    """,
)
def fv5_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (sampling.dsir_importance): hashed
    unigram+bigram bag models of the TARGET domain (lang='en') vs the
    RAW corpus, per-doc log likelihood ratio in exact integer
    micro-nats. The oracle refits both Laplace-smoothed bucket models
    and replays the guarded fixed-point quantization, so the gate
    value-checks model fitting AND scoring end to end."""
    from ..operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    return sampling.dsir_importance(
        docs, "text", "doc_id",
        is_target=F.col("lang") == "en",
        n_buckets=256, scale=1_000_000,
    )


# --- iv6: reciprocal rank fusion (hybrid retrieval) -----------------------

_RRF_K = 60
_RRF_N = 50


def _query_tf_buckets(dim: int = 64) -> dict[int, int]:
    """Hashed-TF vector of the fixed query, computed with CPython's md5
    — bit-identical to both engines' md5, so the query-side constants
    can be baked into the plan and the oracle as literals."""
    import hashlib

    counts: dict[int, int] = {}
    for t in _BM25_TERMS:
        b = int(hashlib.md5(("htf:" + t).encode()).hexdigest()[:15], 16) % dim
        counts[b] = counts.get(b, 0) + 1
    return dict(sorted(counts.items()))


def _iv6_sql() -> str:
    qb = _query_tf_buckets()
    nq = sum(c * c for c in qb.values())
    dot = " + ".join(f"tf[{b + 1}] * {c}" for b, c in qb.items())
    # the lexical CTE restates iv2's arithmetic verbatim (same shared
    # fragments) with the top-10 swapped for a rank<=50 QUALIFY
    tf_cols = ",\n             ".join(
        f"len(list_filter({_TOKS}, t -> t = '{t}')) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ",\n             ".join(
        f"COUNT(*) FILTER (WHERE tf_{t} > 0) AS df_{t}" for t in _BM25_TERMS
    )

    def score(t: str) -> str:
        idf = f"(CAST(n AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5) / (CAST(df_{t} AS DOUBLE) + 0.5)"
        dl_norm = f"(1.0 - {_BM25_B} + {_BM25_B} * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))))"
        return (
            f"({idf}) * (CAST(tf_{t} AS DOUBLE) * ({_BM25_K1} + 1.0))"
            f" / (CAST(tf_{t} AS DOUBLE) + {_BM25_K1} * {dl_norm})"
        )

    total = " + ".join(f"({score(t)})" for t in _BM25_TERMS)
    return f"""
    WITH base AS (
      SELECT doc_id, len({_TOKS}) AS dl,
             {tf_cols}
      FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n, SUM(dl) AS sum_dl,
             {df_cols}
      FROM base
    ), lexall AS (
      SELECT doc_id, {total} AS score
      FROM base, stats
      WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0
    ), lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
               AS BIGINT) AS rank_lex
      FROM lexall
      QUALIFY rank_lex <= {_RRF_N}
    ), t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), b AS (
      SELECT doc_id,
             list_transform(toks, t -> {_HTF_HASH} % 64) AS buckets
      FROM t
    ), v AS (
      SELECT doc_id,
             list_transform(range(0, 64),
               j -> CAST(len(list_filter(buckets, x -> x = j)) AS BIGINT))
               AS tf
      FROM b
    ), s AS (
      SELECT doc_id, {dot} AS dot,
             list_sum(list_transform(tf, x -> x * x)) AS nd
      FROM v
    ), semall AS (
      SELECT doc_id,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(nd AS DOUBLE)) * sqrt({nq}.0)) AS cos
      FROM s WHERE dot > 0
    ), sem AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
               AS BIGINT) AS rank_sem
      FROM semall
      QUALIFY rank_sem <= {_RRF_N}
    ), f AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             rank_lex, rank_sem
      FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id,
           COALESCE(rank_lex, 0) AS rank_lex,
           COALESCE(rank_sem, 0) AS rank_sem,
           (CASE WHEN rank_lex IS NOT NULL
                 THEN 1.0 / ({_RRF_K} + rank_lex) ELSE 0.0 END)
         + (CASE WHEN rank_sem IS NOT NULL
                 THEN 1.0 / ({_RRF_K} + rank_sem) ELSE 0.0 END)
             AS rrf_score
    FROM f
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """


@query("iv6_rrf_fusion", sql=_iv6_sql())
def iv6_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al. 2009) — the standard
    hybrid-retrieval combiner: fuse the LEXICAL ranking (iv2's BM25
    stage, shared via _bm25_scored) with a VECTOR ranking (cosine of
    64-dim hashed-TF doc vectors against the query's own hashed-TF
    vector) as sum of 1/(k + rank) over the two top-50 lists.

    Exactness: ranks are integers (score-then-id total order on both
    sides); each contribution is one IEEE division; the fused score
    adds the two terms in pinned lexical-then-vector order — no
    transcendentals beyond correctly-rounded sqrt.

    Scale shape: each arm ends in TakeOrderedAndProject (per-partition
    heaps) and the rank window runs over the already-bounded 50-row
    slice — never over the corpus; the fusion join is a 50x50 full
    outer join, driver-trivial. The per-doc vector norm is one in-array
    fold; nothing vector-sized shuffles."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    qb = _query_tf_buckets()
    nq = sum(c * c for c in qb.values())

    lex = (
        _bm25_scored(docs)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), "doc_id")
        .limit(_RRF_N)
        .withColumn(
            "rank_lex",
            F.row_number()
            .over(W.orderBy(F.desc("score"), "doc_id"))
            .cast("bigint"),
        )
        .select("doc_id", "rank_lex")
    )

    vecs = textstats.hashing_tf(docs, "text", "doc_id", dim=64)
    dot = None
    for b, c in qb.items():
        term = F.element_at("tf_vec", b + 1) * F.lit(int(c))
        dot = term if dot is None else dot + term
    nd = F.aggregate(
        F.transform(F.col("tf_vec"), lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    sem = (
        vecs.select(
            "doc_id", dot.alias("dot"), nd.alias("nd")
        )
        .where(F.col("dot") > 0)
        .select(
            "doc_id",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("nd").cast("double"))
                    * F.sqrt(F.lit(float(nq)))
                )
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), "doc_id")
        .limit(_RRF_N)
        .withColumn(
            "rank_sem",
            F.row_number()
            .over(W.orderBy(F.desc("cos"), "doc_id"))
            .cast("bigint"),
        )
        .select("doc_id", "rank_sem")
    )

    # full-outer by union+max: Spark cannot broadcast a FULL OUTER join
    # (it would plan a sort-merge even for two 50-row sides); one hash
    # aggregate over <=2N rank rows expresses the same fusion
    fused = (
        lex.select(
            "doc_id",
            F.col("rank_lex"),
            F.lit(None).cast("bigint").alias("rank_sem"),
        )
        .unionByName(
            sem.select(
                "doc_id",
                F.lit(None).cast("bigint").alias("rank_lex"),
                F.col("rank_sem"),
            )
        )
        .groupBy("doc_id")
        .agg(
            F.max("rank_lex").alias("rank_lex"),
            F.max("rank_sem").alias("rank_sem"),
        )
    )
    contrib_l = F.when(
        F.col("rank_lex").isNotNull(),
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_lex")),
    ).otherwise(F.lit(0.0))
    contrib_s = F.when(
        F.col("rank_sem").isNotNull(),
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_sem")),
    ).otherwise(F.lit(0.0))
    return (
        fused.select(
            "doc_id",
            F.coalesce("rank_lex", F.lit(0)).alias("rank_lex"),
            F.coalesce("rank_sem", F.lit(0)).alias("rank_sem"),
            (contrib_l + contrib_s).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(10)
    )


# --- tx27: vocabulary growth (Heaps-law) curve ----------------------------


@query(
    "tx27_vocab_growth",
    sql=f"""
    WITH mx AS (
      SELECT MAX(doc_id) + 1 AS md FROM documents
    ), tok AS (
      SELECT doc_id, unnest(list_distinct({_TOKS})) AS token
      FROM documents
    ), firstb AS (
      SELECT token, (MIN(doc_id) * 100) // (SELECT md FROM mx) AS bucket
      FROM tok GROUP BY token
    ), newv AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_tokens
      FROM firstb GROUP BY bucket
    ), occ AS (
      SELECT (doc_id * 100) // (SELECT md FROM mx) AS bucket,
             CAST(SUM(len({_TOKS})) AS BIGINT) AS tok_occurrences
      FROM documents GROUP BY 1
    )
    SELECT o.bucket, COALESCE(n.new_tokens, 0) AS new_tokens,
           o.tok_occurrences,
           CAST(SUM(COALESCE(n.new_tokens, 0)) OVER (ORDER BY o.bucket
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab,
           CAST(SUM(o.tok_occurrences) OVER (ORDER BY o.bucket
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
    FROM occ o LEFT JOIN newv n ON n.bucket = o.bucket
    """,
)
def tx27_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve in 100 doc-id percentile
    buckets: per bucket, the tokens FIRST seen there, plus cumulative
    vocabulary vs cumulative token occurrences — the (N, V) pairs whose
    sub-linear fit justifies every vocab-sized-shuffle scale argument
    in this repo (tx20/tx22 notes). First-occurrence is an exact
    min-doc_id aggregate per token (one vocab-keyed shuffle, map-side
    combined); the cumulative windows run over the 100-row bucket
    aggregate, never over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    md = docs.agg((F.max("doc_id") + 1).alias("md"))
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower("text"), r"\s+"), lambda t: t != ""
        )
    )
    tok = docs.select("doc_id", F.explode(toks).alias("token"))
    firstb = (
        tok.groupBy("token")
        .agg(F.min("doc_id").alias("fd"))
        .join(F.broadcast(md))
        .select(F.expr("(fd * 100) div md").alias("bucket"))
    )
    newv = firstb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("new_tokens")
    )
    occ = (
        docs.select(
            "doc_id",
            F.size(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
            ).cast("bigint").alias("n"),
        )
        .join(F.broadcast(md))
        .groupBy(F.expr("(doc_id * 100) div md").alias("bucket"))
        .agg(F.sum("n").alias("tok_occurrences"))
    )
    w = _W.orderBy("bucket").rowsBetween(_W.unboundedPreceding, 0)
    return (
        occ.join(newv, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("new_tokens", F.lit(0)).alias("new_tokens"),
            "tok_occurrences",
        )
        .select(
            "bucket",
            "new_tokens",
            "tok_occurrences",
            F.sum("new_tokens").over(w).cast("bigint").alias("cum_vocab"),
            F.sum("tok_occurrences").over(w).cast("bigint").alias(
                "cum_tokens"
            ),
        )
    )


# --- iv7: related terms by co-occurrence lift ------------------------------


@query(
    "iv7_related_terms",
    sql=f"""
    WITH posted AS (
      SELECT doc_id AS d, unnest(list_distinct({_TOKS})) AS token
      FROM documents
    ), n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
    band AS (
      SELECT token, COUNT(*)::BIGINT AS df
      FROM posted GROUP BY token
      HAVING COUNT(*) >= 2
         AND COUNT(*) <= 0.8 * (SELECT n_docs FROM n)
    ), pt AS (
      SELECT p.d, p.token, b.df FROM posted p JOIN band b USING (token)
    ), pairs AS (
      SELECT a.token AS term, b.token AS related,
             COUNT(*)::BIGINT AS n_ab,
             MIN(a.df) AS df_a, MIN(b.df) AS df_b
      FROM pt a JOIN pt b ON a.d = b.d AND a.token < b.token
      GROUP BY 1, 2
    ), sym AS (
      SELECT term, related, n_ab, df_a, df_b FROM pairs
      UNION ALL
      SELECT related, term, n_ab, df_b, df_a FROM pairs
    ), scored AS (
      SELECT term, related, n_ab,
             (n_ab * (SELECT n_docs FROM n) * 1000000) // (df_a * df_b)
               AS lift_scaled
      FROM sym
    )
    SELECT term, related, n_ab, lift_scaled, rank FROM (
      SELECT term, related, n_ab, lift_scaled,
             row_number() OVER (
               PARTITION BY term ORDER BY lift_scaled DESC, related ASC
             )::INT AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def iv7_related_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 related terms per vocabulary term by document
    co-occurrence lift (textstats.related_terms) — the
    query-expansion table next to iv1's inverted index. Lift is the
    exact integer surrogate n_ab * N * 1e6 div (n_a * n_b): lift is
    exp(PMI), so the integer ratio ranks identically to dq21's PMI
    with no transcendental per pair (pairs are unbounded; the driver-
    quantization trick only fits category-bounded state). The df band
    drops hapaxes and stopword-grade terms BEFORE the within-doc
    self-join, bounding pair fanout by the banded per-doc vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.related_terms(docs, "text", "doc_id", k=3)


# --- iv8: Rocchio pseudo-relevance-feedback retrieval ---------------------
#
# Score arithmetic: per-(doc, term) BM25 contribution quantized to
# integer micro-units BEFORE the per-doc sum — FLOOR(w_micro * (idf *
# tf_part)) where every input (tf, dl, N, sum_dl, df, the micro
# weight) is an exact integer, idf is iv2's rational Robertson form,
# and the double expression has one fixed shape — so the summed score
# is an order-free BIGINT and the ranking is bit-identical across
# engines (iv2 can sum doubles because its terms are STATIC and add in
# a fixed projection order; here expansion terms are data-dependent
# rows, so the sum must be integer).

_IV8_K1 = 1.2
_IV8_B = 0.75
_IV8_W_ORIG = 1_000_000  # original-term weight, micro units
_IV8_W_EXP = 500_000     # Rocchio beta = 0.5 for expansion terms
_IV8_FEEDBACK_K = 10
_IV8_EXPANSION_K = 3


def _iv8_sql() -> str:
    toks = _TOKS
    k1, b = _IV8_K1, _IV8_B
    bm25 = _bm25_sql().replace("ORDER BY score DESC, doc_id LIMIT 10", "")
    score = (
        f"CAST(FLOOR(CAST(t.w_micro AS DOUBLE) * ("
        f"((CAST(s.n AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)"
        f" / (CAST(d.df AS DOUBLE) + 0.5))"
        f" * ((CAST(tf.tf AS DOUBLE) * ({k1} + 1.0))"
        f" / (CAST(tf.tf AS DOUBLE) + {k1} * (1.0 - {b} + {b}"
        f" * (CAST(tf.dl AS DOUBLE)"
        f" / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))))))"
        f") AS BIGINT)"
    )
    return f"""
    WITH fb AS (
      SELECT doc_id FROM ({bm25}
        ORDER BY score DESC, doc_id LIMIT {_IV8_FEEDBACK_K})
    ),
    corpus_df AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df
      FROM (SELECT doc_id, unnest(list_distinct({toks})) AS token
            FROM documents)
      GROUP BY token
    ),
    fbterm AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS fb_tf
      FROM (SELECT unnest({toks}) AS token
            FROM documents JOIN fb USING (doc_id))
      WHERE token NOT IN {tuple(_BM25_TERMS)!r}
      GROUP BY token
    ),
    expansion AS (
      SELECT token, {_IV8_W_EXP} AS w_micro FROM (
        SELECT f.token,
               row_number() OVER (ORDER BY f.fb_tf DESC, f.token ASC) AS rk
        FROM fbterm f JOIN corpus_df c USING (token)
        WHERE 2 * c.df <= (SELECT COUNT(*) FROM documents)
      ) WHERE rk <= {_IV8_EXPANSION_K}
    ),
    qterms AS (
      SELECT token, w_micro FROM expansion
      UNION ALL
      SELECT unnest({list(_BM25_TERMS)!r}) AS token, {_IV8_W_ORIG} AS w_micro
    ),
    doclen AS (
      SELECT doc_id, CAST(len({toks}) AS BIGINT) AS dl FROM documents
    ),
    stats2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dl) AS BIGINT) AS sum_dl
      FROM doclen
    ),
    tf AS (
      SELECT x.doc_id, x.token, CAST(COUNT(*) AS BIGINT) AS tf, l.dl
      FROM (SELECT doc_id, unnest({toks}) AS token FROM documents) x
      JOIN qterms q ON q.token = x.token
      JOIN doclen l ON l.doc_id = x.doc_id
      GROUP BY x.doc_id, x.token, l.dl
    )
    SELECT doc_id, score_micro, n_terms_hit FROM (
      SELECT tf.doc_id,
             CAST(SUM({score}) AS BIGINT) AS score_micro,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      FROM tf
      JOIN qterms t ON t.token = tf.token
      JOIN corpus_df d ON d.token = tf.token
      CROSS JOIN stats2 s
      GROUP BY tf.doc_id
    )
    ORDER BY score_micro DESC, doc_id LIMIT 10
    """


@query("iv8_rocchio_prf", sql=_iv8_sql())
def iv8_rocchio_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio): run iv2's BM25
    for the fixed query, mine the top-10 feedback docs for the
    {_IV8_EXPANSION_K} highest-mass terms not already in the query
    (banded to 2*df <= N so stopword-grade terms can't expand), then
    re-score the corpus with the expanded query — original terms at
    weight 1.0, expansion at Rocchio beta 0.5 — and return the new
    top-10. Per-(doc,term) scores quantize to integer micro-units
    before the per-doc sum (see module note), so the data-dependent
    term set cannot make the ranking order-sensitive.

    Scale shape: feedback is top-k (per-partition heaps); the corpus
    df table is iv1's banded aggregate; the expansion choice is a
    <= |feedback vocabulary| ranking; rescoring explodes tokens once
    and SEMI-joins them against a <= {_IV8_EXPANSION_K + 3}-term
    broadcast table before any shuffle — the token stream leaves the
    scan only for matched terms, (doc, term) counts combine
    map-side, and the final ranking is again a top-k heap. No
    collect: feedback docs, expansion terms, and corpus stats stay
    plan-side as broadcast one-row/short tables."""
    docs = load_table(spark, sf_dir, "documents")

    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    # NOT pinned: each pass re-derives tokens from the parquet scan
    # (column-pruned, whole-stage codegen) — cheaper at corpus scale
    # than materializing the full token stream once
    tokenized = docs.select("doc_id", F.explode(toks).alias("token"))

    fb = (
        _bm25_scored(docs)
        .orderBy(F.desc("score"), "doc_id")
        .limit(_IV8_FEEDBACK_K)
        .select("doc_id")
    )
    corpus_df = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(toks)).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    fbterm = (
        tokenized.join(F.broadcast(fb), "doc_id")
        .where(~F.col("token").isin(*_BM25_TERMS))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("fb_tf"))
    )
    n_docs = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    from pyspark.sql import Window as _W

    wexp = _W.orderBy(F.desc("fb_tf"), F.asc("token"))
    expansion = (
        fbterm.join(corpus_df, "token")
        .crossJoin(F.broadcast(n_docs))
        .where(2 * F.col("df") <= F.col("n"))
        # bounded window: <= feedback-vocabulary rows reach it
        .withColumn("rk", F.row_number().over(wexp))
        .where(F.col("rk") <= _IV8_EXPANSION_K)
        .select("token", F.lit(_IV8_W_EXP).cast("bigint").alias("w_micro"))
    )
    originals = docs.sparkSession.createDataFrame(
        [(t, _IV8_W_ORIG) for t in _BM25_TERMS], "token string, w_micro long"
    )
    qterms = expansion.unionByName(originals)

    doclen = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("dl")
    )
    stats2 = doclen.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    tf = (
        tokenized.join(F.broadcast(qterms.select("token")), "token")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .join(doclen, "doc_id")
    )
    k1, b = _IV8_K1, _IV8_B
    score = F.expr(
        f"CAST(FLOOR(CAST(w_micro AS DOUBLE) * ("
        f"((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
        f" / (CAST(df AS DOUBLE) + 0.5))"
        f" * ((CAST(tf AS DOUBLE) * ({k1} + 1.0))"
        f" / (CAST(tf AS DOUBLE) + {k1} * (1.0 - {b} + {b}"
        f" * (CAST(dl AS DOUBLE)"
        f" / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE)))))))"
        f") AS BIGINT)"
    )
    # narrow the corpus-vocabulary df table to the <= 6 query terms
    # BEFORE broadcasting — broadcasting the full vocab would be wrong
    # at corpus scale
    dfq = corpus_df.join(F.broadcast(qterms.select("token")), "token")
    return (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(dfq), "token")
        .crossJoin(F.broadcast(stats2))
        .groupBy("doc_id")
        .agg(
            F.sum(score).cast("bigint").alias("score_micro"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(10)
    )


# --- tx28: within-document repetition signals (Gopher A1.1) ----------------


def _tx28_grams_sql(n: int) -> str:
    """DuckDB word n-gram list over `t` (the _TOKS array), empty when
    the doc is shorter than n tokens."""
    join = " || ' ' || ".join(f"t[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len(t) >= {n} THEN "
        f"list_transform(range(1, len(t) - {n - 2}), i -> {join}) "
        f"ELSE [] END"
    )


@query(
    "tx28_repetition_signals",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, {_TOKS} AS t
      FROM documents
    ), g2 AS (
      SELECT doc_id, n_chars, unnest({_tx28_grams_sql(2)}) AS gram
      FROM toks
    ), c2 AS (
      SELECT doc_id, n_chars, gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g2 GROUP BY 1, 2, 3
    ), top2 AS (
      SELECT doc_id, n_chars, gram AS top2_gram,
             cnt AS top2_cnt,
             CAST(cnt * length(gram) AS BIGINT) AS top2_chars
      FROM (SELECT *, row_number() OVER (
              PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
            FROM c2) WHERE rn = 1
    ), g5 AS (
      SELECT doc_id, unnest({_tx28_grams_sql(5)}) AS gram
      FROM toks
    ), c5 AS (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g5 GROUP BY 1, 2
    ), dup5 AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram)
                           ELSE 0 END) AS BIGINT) AS dup5_chars
      FROM c5 GROUP BY 1
    )
    SELECT t.doc_id, t.top2_gram, t.top2_cnt,
           (t.top2_chars * 1000000) // t.n_chars AS top2_frac_micro,
           (COALESCE(d.dup5_chars, 0) * 1000000) // t.n_chars
             AS dup5_frac_micro
    FROM top2 t LEFT JOIN dup5 d USING (doc_id)
    """,
)
def tx28_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals — the Gopher §A1.1 family
    tx19's global rules deliberately left out: per document, the
    character mass of the MOST FREQUENT word 2-gram (loops and boiler
    plate show up here first) and the character mass of all DUPLICATED
    word 5-grams (cnt >= 2 — copy-paste stutter), both as exact
    integer micro fractions of the document's characters (count *
    gram-length * 1e6 div n_chars — no float division). The top
    2-gram tie-breaks (count DESC, gram ASC), so the chosen gram is
    deterministic cross-engine. Completes the repetition axis next to
    tx23 (cross-doc n-gram NOVELTY) and dd16/dd17 (cross-doc verbatim
    spans): this one never leaves the document.

    Scale shape: n-gram extraction is a whole-stage-codegen HOF
    projection; (doc, gram) counts combine map-side; the per-doc
    argmax window is bounded by the doc's distinct-gram count; no
    corpus-wide state at all — embarrassingly parallel by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")

    def grams(n: int) -> F.Column:
        join = ", ".join(f"element_at(t, i + {k})" for k in range(n))
        return F.expr(
            f"CASE WHEN size(t) >= {n} THEN "
            f"transform(sequence(1, size(t) - {n - 1}), "
            f"i -> concat_ws(' ', {join})) "
            f"ELSE array() END"
        )

    base = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        toks.alias("t"),
    )
    from pyspark.sql import Window as _W

    c2 = (
        base.select(
            "doc_id", "n_chars", F.explode(grams(2)).alias("gram")
        )
        .groupBy("doc_id", "n_chars", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = _W.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("gram"))
    top2 = (
        c2.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "n_chars",
            F.col("gram").alias("top2_gram"),
            F.col("cnt").alias("top2_cnt"),
            (F.col("cnt") * F.length("gram")).cast("bigint").alias("top2_chars"),
        )
    )
    dup5 = (
        base.select("doc_id", F.explode(grams(5)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram"))
                .otherwise(0)
            ).cast("bigint").alias("dup5_chars")
        )
    )
    return top2.join(dup5, "doc_id", "left").select(
        "doc_id",
        "top2_gram",
        "top2_cnt",
        F.expr("(top2_chars * 1000000) div n_chars").alias("top2_frac_micro"),
        F.expr(
            "(coalesce(dup5_chars, 0) * 1000000) div n_chars"
        ).alias("dup5_frac_micro"),
    )


# --- tx29: code-vs-prose screen --------------------------------------------

_TX29_SNIPPET = (
    "if (x == 1) { return foo(x); } else { int y = 0; y += bar(y); }"
)
_TX29_KEYWORDS = ("return", "if", "else", "int")


def _tx29_count_sql(col: str, ch: str) -> str:
    """Occurrences of single char `ch` in `col` (DuckDB), via length
    difference — the same arithmetic Spark uses."""
    esc = ch.replace("'", "''")
    return f"CAST(length({col}) - length(replace({col}, '{esc}', '')) AS BIGINT)"


@query(
    "tx29_code_prose_screen",
    sql=f"""
    WITH tainted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 = 4
                  THEN text || ' ' || '{_TX29_SNIPPET}'
                  ELSE text END AS text
      FROM documents
    ), sig AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             {_tx29_count_sql('text', '{')} + {_tx29_count_sql('text', '}')}
               + {_tx29_count_sql('text', ';')} + {_tx29_count_sql('text', '=')}
               + {_tx29_count_sql('text', '(')} + {_tx29_count_sql('text', ')')}
               AS sym_n,
             {" + ".join(
                 f"CASE WHEN list_contains({_TOKS.replace('text', 'text')}, '{k}')"
                 " THEN 1 ELSE 0 END" for k in _TX29_KEYWORDS
             )} AS kw_n
      FROM tainted
    )
    SELECT doc_id, n_chars, sym_n, kw_n,
           (sym_n * 1000000) // n_chars AS sym_frac_micro,
           (CASE WHEN (sym_n * 1000000) // n_chars >= 20000 AND kw_n >= 2
                 THEN TRUE ELSE FALSE END) AS is_code_like
    FROM sig
    """,
)
def tx29_code_prose_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose screening — the corpus-router every mixed crawl
    needs before language-specific pipelines: per document, the count
    of code-significant symbols ({{}};=() — length-difference
    arithmetic, no regex in the hot path), presence of code keywords
    as whole TOKENS (list_contains on the shared tokenizer — 'if'
    inside a word never fires), the symbol density as an exact micro
    fraction, and the two-signal verdict (density >= 2% AND >= 2
    keywords). A deterministic code snippet is appended to doc_id % 9
    == 4 (the dc2 taint-fixture precedent) so both classes exist in
    the synthetic corpus and the verdict column is exercised on both
    sides. Scale: pure projection over the scan — zero shuffle,
    whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    tainted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 4,
            F.concat(F.col("text"), F.lit(" " + _TX29_SNIPPET)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")

    def cnt(ch: str) -> F.Column:
        return (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(ch)))
        ).cast("bigint")

    sym = cnt("{") + cnt("}") + cnt(";") + cnt("=") + cnt("(") + cnt(")")
    kw = None
    for k in _TX29_KEYWORDS:
        term = F.when(F.array_contains(toks, k), 1).otherwise(0)
        kw = term if kw is None else kw + term
    sig = tainted.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        sym.alias("sym_n"),
        kw.cast("bigint").alias("kw_n"),
    )
    return sig.select(
        "doc_id",
        "n_chars",
        "sym_n",
        "kw_n",
        F.expr("(sym_n * 1000000) div n_chars").alias("sym_frac_micro"),
        (
            (F.expr("(sym_n * 1000000) div n_chars") >= 20000)
            & (F.col("kw_n") >= 2)
        ).alias("is_code_like"),
    )


# --- tx30: mojibake / encoding-artifact screen ------------------------------
#
# Marker substrings (each the UTF-8 bytes of a common char re-decoded as
# cp1252/latin-1 — the classic double-encoding signature):
#   'Ã©' = e-acute, 'Ã¯' = i-diaeresis,
#   'â€' = the lead pair of curly quotes/apostrophes.
# Counting is the tx29 length-difference arithmetic generalized to
# multi-char patterns: (len(s) - len(replace(s, pat, ''))) / len(pat),
# exact integers in both engines (replace is non-overlapping
# left-to-right in both).

_TX30_MOJI = " cafÃ© naÃ¯ve â€okâ€"
_TX30_MARKERS = ("Ã©", "Ã¯", "â€")
_TX30_REPL = "�"


def _tx30_count_sql(col: str, pat: str) -> str:
    esc = pat.replace("'", "''")
    return (
        f"CAST((length({col}) - length(replace({col}, '{esc}', '')))"
        f" // {len(pat)} AS BIGINT)"
    )


@query(
    "tx30_mojibake_screen",
    sql=f"""
    WITH tainted AS (
      SELECT doc_id, lang, source,
             CASE WHEN doc_id % 17 = 3 THEN text || '{_TX30_MOJI}'
                  WHEN doc_id % 29 = 5 THEN text || ' bad{_TX30_REPL}byte'
                  ELSE text END AS text
      FROM documents
    ), sig AS (
      SELECT lang, source,
             {" + ".join(_tx30_count_sql("text", m) for m in _TX30_MARKERS)}
               AS moji_n,
             {_tx30_count_sql("text", _TX30_REPL)} AS repl_n
      FROM tainted
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN moji_n > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS moji_docs,
           CAST(SUM(CASE WHEN repl_n > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS repl_docs,
           CAST(SUM(moji_n) AS BIGINT) AS moji_occurrences,
           CAST((SUM(CASE WHEN moji_n > 0 OR repl_n > 0 THEN 1 ELSE 0 END)
             * 1000000) // COUNT(*) AS BIGINT) AS artifact_doc_ppm
    FROM sig GROUP BY lang, source
    """,
)
def tx30_mojibake_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact (mojibake) screening — the ingest gate that
    catches double-encoded UTF-8 and lossy transcodes before they
    poison a training corpus: per (lang, source) cohort, documents
    carrying the classic cp1252-double-encoding digraphs or U+FFFD
    replacement characters, with exact occurrence counts via
    multi-char length-difference arithmetic (no regex in the hot
    path) and an artifact-rate ppm. Artifacts are PLANTED
    deterministically (doc_id % 17 / % 29 — the tx29 taint-fixture
    precedent) so both clean and dirty cohorts exist in the synthetic
    corpus and every output column is exercised.

    Scale shape: pure projection over the scan + one cohort-grain
    combinable aggregate — zero data-sized shuffle, whole-stage
    codegen end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    tainted = docs.select(
        "lang",
        "source",
        F.when(F.col("doc_id") % 17 == 3, F.concat("text", F.lit(_TX30_MOJI)))
        .when(
            F.col("doc_id") % 29 == 5,
            F.concat("text", F.lit(" bad" + _TX30_REPL + "byte")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )

    def cnt(pat: str) -> F.Column:
        return (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(pat))))
            / F.lit(len(pat))
        ).cast("bigint")

    moji = None
    for m in _TX30_MARKERS:
        moji = cnt(m) if moji is None else moji + cnt(m)
    sig = tainted.select(
        "lang",
        "source",
        moji.alias("moji_n"),
        cnt(_TX30_REPL).alias("repl_n"),
    )
    return sig.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("moji_n") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("moji_docs"),
        F.sum(F.when(F.col("repl_n") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("repl_docs"),
        F.sum("moji_n").cast("bigint").alias("moji_occurrences"),
        F.expr(
            "SUM(CASE WHEN moji_n > 0 OR repl_n > 0 THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*)"
        ).alias("artifact_doc_ppm"),
    )


# --- tx31: PII density report -----------------------------------------------

_TX31_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_TX31_PHONE = "\\+1-555-[0-9]{4}"


@query(
    "tx31_pii_density",
    sql=f"""
    WITH tainted AS (
      SELECT doc_id, lang, source,
             CASE WHEN doc_id % 13 = 2
                  THEN text || ' contact user' || doc_id || '@example.com'
                  WHEN doc_id % 19 = 4
                  THEN text || ' call +1-555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE text END AS text
      FROM documents
    ), flags AS (
      SELECT lang, source,
             CASE WHEN regexp_matches(text, '{_TX31_EMAIL}')
                  THEN 1 ELSE 0 END AS has_email,
             CASE WHEN regexp_matches(text, '{_TX31_PHONE}')
                  THEN 1 ELSE 0 END AS has_phone
      FROM tainted
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(has_email) AS BIGINT) AS email_docs,
           CAST(SUM(has_phone) AS BIGINT) AS phone_docs,
           CAST(SUM(CASE WHEN has_email + has_phone > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS pii_docs,
           CAST((SUM(CASE WHEN has_email + has_phone > 0 THEN 1 ELSE 0 END)
             * 1000000) // COUNT(*) AS BIGINT) AS pii_doc_ppm
    FROM flags GROUP BY lang, source
    """,
)
def tx31_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-density report — the audit a corpus owner runs BEFORE
    redaction (b15 tokenizes; this measures): per (lang, source)
    cohort, the share of documents containing email- or phone-shaped
    spans, as boolean per-doc flags rolled into exact ppm rates. The
    regex subset used ([a-z0-9] classes, bounded quantifiers, literal
    anchors) evaluates identically under Java regex (Spark rlike) and
    RE2 (DuckDB regexp_matches); PII spans are planted
    deterministically (doc_id % 13 / % 19) so both flags fire in the
    synthetic corpus.

    Scale shape: projection + cohort-grain combinable aggregate, zero
    data-sized shuffle. At 100 TB the per-doc regex is the cost — it
    runs once per doc inside codegen, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    tainted = docs.select(
        "lang",
        "source",
        F.when(
            F.col("doc_id") % 13 == 2,
            F.concat(
                "text",
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 19 == 4,
            F.concat(
                "text",
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    flags = tainted.select(
        "lang",
        "source",
        F.when(F.col("text").rlike(_TX31_EMAIL), 1).otherwise(0)
        .alias("has_email"),
        F.when(F.col("text").rlike(_TX31_PHONE), 1).otherwise(0)
        .alias("has_phone"),
    )
    return flags.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("has_email").cast("bigint").alias("email_docs"),
        F.sum("has_phone").cast("bigint").alias("phone_docs"),
        F.sum(
            F.when(F.col("has_email") + F.col("has_phone") > 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("pii_docs"),
        F.expr(
            "SUM(CASE WHEN has_email + has_phone > 0 THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*)"
        ).alias("pii_doc_ppm"),
    )


# --- tx32: unigram LM negative log-likelihood --------------------------------


@query(
    "tx32_unigram_logppl",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks
    ), scored AS (
      SELECT t.doc_id,
             CAST(round(1000000 * ln(n::DOUBLE / freq::DOUBLE)) AS BIGINT)
               AS nll_micro
      FROM toks t JOIN vocab v USING (tok), tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(nll_micro) AS BIGINT) AS nll_sum_micro,
           CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS avg_nll_micro
    FROM scored GROUP BY doc_id
    """,
)
def tx32_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM log-perplexity quality score — the classic
    perplexity-filter signal (CCNet-style) with the corpus itself as
    the language model: token frequencies over the whole corpus give
    p(tok) = freq/N, each token instance scores -ln p = ln(N/freq)
    quantized ENGINE-SIDE to integer micro-nats (the repo's
    engine-replayed transcendental pattern: the ln argument is a
    ratio of exact integer counts, round is half-away in both
    engines), and per-doc sum/average land as exact integers. High
    avg_nll = rare-token-heavy documents (gibberish, boilerplate
    IDs); low = stopword soup — both tails are what the filter trims.

    Scale shape: token-stream linear like tx28 — one (token) exchange
    builds the vocab, one token-grain join scores instances (at
    100 TB the vocab is Zipf-bounded and the join key is the token
    itself, so AQE can broadcast the head; no driver-side vocab
    state), one doc-grain combine. The 1-row total broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    tot = toks.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.lit(1_000_000)
                * F.log(
                    F.col("n").cast("double") / F.col("freq").cast("double")
                )
            )
            .cast("bigint")
            .alias("nll_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("nll_micro").cast("bigint").alias("nll_sum_micro"),
        F.expr("SUM(nll_micro) div COUNT(*)").alias("avg_nll_micro"),
    )


# --- iv9: Dirichlet query-likelihood retrieval -------------------------------

_IV9_MU = 2000


def _iv9_tf_sql(term: str) -> str:
    return (
        f"CAST(len(list_filter({_TOKS}, t -> t = '{term}')) AS BIGINT)"
        f" AS tf_{term}"
    )


@query(
    "iv9_query_likelihood_topk",
    sql=f"""
    WITH base AS (
      SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl,
             {", ".join(_iv9_tf_sql(t) for t in _BM25_TERMS)}
      FROM documents
    ), stats AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS n,
             {", ".join(f"CAST(SUM(tf_{t}) AS BIGINT) AS cf_{t}"
                        for t in _BM25_TERMS)}
      FROM base
    ), scored AS (
      SELECT doc_id, dl,
             {" + ".join(
                 f"CAST(round(1000000 * ln("
                 f"(tf_{t} * n + {_IV9_MU} * cf_{t})::DOUBLE"
                 f" / (n * (dl + {_IV9_MU}))::DOUBLE)) AS BIGINT)"
                 for t in _BM25_TERMS
             )} AS ql_micro
      FROM base, stats
    )
    SELECT doc_id, dl, ql_micro FROM scored
    ORDER BY ql_micro DESC, doc_id LIMIT 10
    """,
)
def iv9_query_likelihood_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval — the OTHER
    canonical lexical ranker beside iv2's BM25 (the language-modeling
    school: rank by P(query | doc LM), document model smoothed toward
    the collection model with mass mu): per query term, ln((tf*N +
    mu*cf) / (N*(dl + mu))) — the ln argument a ratio of exact integer
    products (tf, dl, N, cf all exact counts), quantized ENGINE-SIDE
    to integer micro-nats (the tx32 pattern) and summed as integers,
    so the ranking key is an exact integer and the top-10 is fully
    deterministic (desc, doc_id tiebreak). Same fixed 3-term query as
    iv2 — diff the two rankings to see where tf-saturation vs
    smoothing disagree.

    Scale shape: iv2's exact shape — one projection pass (token stream
    never shuffles), ONE 1-row stats broadcast, pure-projection
    scoring, TakeOrderedAndProject top-10."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")

    def tf_col(term: str) -> F.Column:
        return (
            F.size(F.filter(toks, lambda x: x == term))
            .cast("bigint")
            .alias(f"tf_{term}")
        )

    base = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *[tf_col(t) for t in _BM25_TERMS],
    )
    from ..cache import pin

    base = pin(base)
    stats = base.agg(
        F.sum("dl").cast("bigint").alias("n"),
        *[
            F.sum(f"tf_{t}").cast("bigint").alias(f"cf_{t}")
            for t in _BM25_TERMS
        ],
    )
    term_scores = [
        F.round(
            F.lit(1_000_000)
            * F.log(
                (
                    F.col(f"tf_{t}") * F.col("n")
                    + F.lit(_IV9_MU) * F.col(f"cf_{t}")
                ).cast("double")
                / (F.col("n") * (F.col("dl") + F.lit(_IV9_MU))).cast("double")
            )
        ).cast("bigint")
        for t in _BM25_TERMS
    ]
    total = term_scores[0]
    for s in term_scores[1:]:
        total = total + s
    return (
        base.join(F.broadcast(stats))
        .select("doc_id", "dl", total.alias("ql_micro"))
        .orderBy(F.desc("ql_micro"), "doc_id")
        .limit(10)
    )
