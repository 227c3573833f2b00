"""Text preparation operators for training-data pipelines: repetition
filters, PII scrubbing, and sequence chunking.

Not reference-derived (the reference's text surface is lowercase/replace/
fill — SURVEY.md §2.B); this is the document-prep family a 100 TB LLM
corpus pipeline needs, in the spirit of the Gopher/C4 quality rules.
Everything is built-in Catalyst expressions (split / higher-order array
functions / regexp_*) — zero Python UDFs, so the hot path stays inside
whole-stage codegen and replays exactly in ANSI SQL for the oracle gate.

- repetition_signals   duplicate-n-gram fraction + top-n-gram char share
                       (Gopher-style repetition detectors)
- pii_scrub            regex redaction with per-pattern match counts
- chunk_by_tokens      overlapping fixed-token-window chunks (sequence
                       prep for training); one posexplode, bounded per doc

Scale notes: all three are embarrassingly parallel per-row projections —
no shuffle anywhere. repetition_signals is O(n_ngrams * n_distinct) per
document in the top-share scan, bounded by document length (not corpus
size); chunk_by_tokens' explode emits ceil(n/stride) rows per doc, each
capped at `chunk` tokens. At 100 TB these run scan-speed with predicate
pushdown below them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _toks(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != "")


def _ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (empty array when < n tokens)."""
    return F.when(F.size(toks) >= n, F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame, text_col: str, id_col: str, n: int = 2, max_dup_frac: float = 0.5
) -> DataFrame:
    """Gopher-style repetition quality signals per document.

    - n_ngrams        word n-gram count
    - dup_ngram_frac  1 - distinct/total n-grams (repetition density)
    - top_ngram_char_frac  chars covered by the single most frequent
                      n-gram / chars across all n-gram occurrences —
                      computed as a max over the DISTINCT n-gram list, so
                      no argmax struct gymnastics and no shuffle
    - keep            dup_ngram_frac <= max_dup_frac (the filter verdict)

    Documents with fewer than `n` tokens get NULL fractions and keep=true
    (too short to measure repetition, not evidence of it).
    """
    # materialize tokens BEFORE the n-gram lambda references them —
    # passing the raw split expression into _ngrams inlines the tokenizer
    # into every element_at, re-tokenizing O(n) times per row (same trap
    # documented at textstats.quality_score / dedup.word_shingles;
    # measured ~18x on this operator at sf0.1)
    toked = df.select(F.col(id_col), _toks(F.col(text_col)).alias("__toks"))
    base = toked.select(F.col(id_col), _ngrams(F.col("__toks"), n).alias("__g"))
    g = F.col("__g")
    total = F.size(g)
    distinct = F.array_distinct(g)
    dup_frac = F.when(
        total > 0, F.lit(1.0) - F.size(distinct).cast("double") / total
    )
    # chars in occurrences of the most frequent n-gram; only the MAX is
    # needed (not which n-gram). Sort the n-grams and fold a run-length
    # accumulator — O(n log n) per document, where the naive max-over-
    # distinct-of-count scan is O(n x n_distinct) (quadratic on long
    # documents — real corpora have 10^3-10^4 n-grams per doc, and this
    # runs per ROW at 100 TB). The oracle replays the naive form: same
    # value, independently computed.
    top_chars = F.aggregate(
        F.array_sort(g),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(1).alias("run"),
            F.greatest(
                acc["best"],
                (F.when(x == acc["prev"], acc["run"] + 1).otherwise(1))
                * F.length(x),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    all_chars = F.length(F.concat_ws("", g))
    top_frac = F.when(total > 0, top_chars.cast("double") / all_chars)
    return base.select(
        F.col(id_col),
        total.cast("bigint").alias("n_ngrams"),
        dup_frac.alias("dup_ngram_frac"),
        top_frac.alias("top_ngram_char_frac"),
        F.coalesce(dup_frac <= max_dup_frac, F.lit(True)).alias("keep"),
    )


# Redaction patterns a real pipeline ships with. RE2-compatible (DuckDB)
# AND java.util.regex-compatible (Spark): character classes, bounded
# repetition and \\b word boundaries only — no lookarounds, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
    "phone": "\\+?[0-9][0-9() -]{6,}[0-9]",
}


def pii_scrub(
    df: DataFrame, text_col: str, id_col: str, patterns: dict[str, str]
) -> DataFrame:
    """Redact every regex in `patterns` (applied in dict order, each
    replaced with `<NAME>`) and count matches per pattern.

    Counts are taken on the ORIGINAL text so an earlier redaction can't
    hide a later pattern's matches; replacement is sequential so the
    scrubbed text is deterministic. Pure per-row projection — the 100 TB
    path is scan-speed, no shuffle, no UDF.
    """
    t = F.lower(F.col(text_col))
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("bigint").alias(
            f"n_{name}"
        )
        for name, pat in patterns.items()
    ]
    scrubbed = t
    for name, pat in patterns.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


def chunk_by_tokens(
    df: DataFrame, text_col: str, id_col: str, chunk: int = 32, stride: int = 24
) -> DataFrame:
    """Split each document into overlapping fixed-token windows (training
    sequence prep): chunk k covers tokens [k*stride, k*stride + chunk).

    One row per chunk via posexplode; every token lands in at least one
    chunk (stride <= chunk). Output: (id, chunk_id, n_tokens, chunk_text).
    The explode fan-out is ceil(n_tokens/stride) per document — bounded by
    document length, embarrassingly parallel, no shuffle.
    """
    if stride > chunk:
        raise ValueError("stride must be <= chunk (gaps would drop tokens)")
    base = df.select(F.col(id_col), _toks(F.col(text_col)).alias("__toks")).where(
        F.size("__toks") > 0
    )
    toks = F.col("__toks")
    chunks = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride)),
        lambda s: F.struct(
            F.least(F.lit(chunk), F.size(toks) - s).alias("n_tokens"),
            F.concat_ws(" ", F.slice(toks, s + 1, chunk)).alias("chunk_text"),
        ),
    )
    return (
        base.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.col("c.n_tokens").cast("bigint").alias("n_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


def ngram_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination: drop every training document sharing
    ANY word n-gram with the benchmark set (the standard 13-gram overlap
    rule; n is a parameter because toy corpora need smaller n).

    Plan shape for 100 TB: the benchmark is tiny by definition, so its
    distinct n-gram set BROADCASTS; the training side explodes to grams
    and left_semi-probes the broadcast to find contaminated ids (train
    grams never shuffle), then one left_anti removes them. Cost = one
    scan of train + benchmark-sized state per executor.
    """
    from pyspark.sql.functions import broadcast

    def grams(df: DataFrame) -> DataFrame:
        toked = df.select(F.col(id_col), _toks(F.col(text_col)).alias("__toks"))
        return toked.select(
            F.col(id_col), F.explode(_ngrams(F.col("__toks"), n)).alias("gram")
        )

    bench_grams = grams(bench).select("gram").distinct()
    contaminated = (
        grams(train)
        .join(broadcast(bench_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return train.join(contaminated, id_col, "left_anti")


def vocab_encode(
    df: DataFrame, text_col: str, id_col: str, vocab: DataFrame
) -> DataFrame:
    """Encode documents to token-id sequences against a vocabulary
    DataFrame (token, rank): id = rank for in-vocab tokens, 0 = UNK.

    Output is one (id, pos, token, token_id) row per token occurrence —
    scalar rows, not arrays, so the result is canonicalizable and
    directly writable as a training shard. The vocabulary join is
    broadcast (a vocab is KBs-to-MBs even at 1M entries); the explode is
    the only fan-out and it is bounded per document. At 100 TB this is
    scan-speed: no shuffle of the token stream, ever.
    """
    from pyspark.sql.functions import broadcast

    toks = df.select(F.col(id_col), _toks(F.col(text_col)).alias("__toks"))
    exploded = toks.select(
        F.col(id_col), F.posexplode("__toks").alias("pos", "token")
    )
    v = vocab.select(
        F.col("token"), F.col("rank").cast("bigint").alias("token_id")
    )
    return exploded.join(broadcast(v), "token", "left").select(
        F.col(id_col),
        F.col("pos").cast("bigint").alias("pos"),
        "token",
        F.coalesce("token_id", F.lit(0)).alias("token_id"),
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-k characteristic terms per group by a log-free tf-idf variant.

    tf  = occurrences of token within the group
    df_ = number of DOCUMENTS (corpus-wide) containing the token
    score = tf / df_  (single IEEE division — bit-identical cross-engine;
            log-idf is monotone-decreasing in df_ just like 1/df_, so the
            per-group ranking intent is preserved while staying exactly
            replayable — ln() last-ulp behavior is libm-dependent)

    Plan shape: one explode feeding TWO hash aggregations (token counts
    per group; distinct-doc counts per token), joined on token. Partial
    aggregation collapses each partition's token stream to its vocabulary
    before either shuffle, and the final per-group top-k goes through a
    bounded rank over (group, score) — vocabulary-sized, not stream-sized.
    """
    toks = _toks(F.col(text_col))
    exploded = df.select(
        F.col(id_col), F.col(group_col), F.explode(toks).alias("token")
    )
    tf = exploded.groupBy(group_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = (
        exploded.select(F.col(id_col), "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = tf.join(docfreq, "token").select(
        F.col(group_col),
        "token",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df")).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group_col, "token", "tf", "df", "score", F.col("rank").cast("bigint").alias("rank"))
    )


def chunk_boilerplate_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk: int = 16,
    min_docs: int = 3,
) -> DataFrame:
    """C4-style cross-document span dedup, over non-overlapping
    `chunk`-token windows (this corpus has no newlines, so the token
    window stands in for the "line"): a chunk whose exact text appears
    in >= `min_docs` DISTINCT documents is boilerplate (navigation
    chrome, license headers, templated spans), and each document
    reports how much of it is boilerplate plus the keep verdict.

    Output: (id, n_chunks, n_boilerplate_chunks, boilerplate_frac,
    keep) with keep = boilerplate_frac < 0.5.

    Scale shape: chunks explode 1/chunk-th of the token stream; the
    frequent-chunk set aggregates with map-side partial counts on the
    chunk hash (never the chunk text) and is SMALL by construction —
    boilerplate is the head of the distribution — so the membership
    probe back onto each document's chunks is a broadcast-friendly
    semi-join at 100 TB, not a second full shuffle (same broadcast
    asymmetry as ngram_decontaminate's benchmark grams).
    """
    chunks = chunk_by_tokens(df, text_col, id_col, chunk=chunk, stride=chunk)
    hashed = chunks.select(
        F.col(id_col), F.xxhash64("chunk_text").alias("h")
    )
    frequent = (
        hashed.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("h", F.lit(True).alias("__boiler"))
    )
    marked = hashed.join(F.broadcast(frequent), "h", "left")
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("__boiler"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_boilerplate_chunks"),
    )
    frac = F.col("n_boilerplate_chunks").cast("double") / F.col("n_chunks")
    return per_doc.select(
        F.col(id_col),
        "n_chunks",
        "n_boilerplate_chunks",
        frac.alias("boilerplate_frac"),
        (frac < 0.5).alias("keep"),
    )


def substring_decontaminate(
    train: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
    span_col: str = "span",
) -> DataFrame:
    """Verbatim-substring decontamination: drop every training document
    that CONTAINS any benchmark span (the exact-match complement of
    ngram_decontaminate — catches contamination that tokenization-based
    n-grams can miss: code, punctuation-dense text, unusual whitespace).

    Plan shape for 100 TB: spans are benchmark-sized (small) and
    BROADCAST; the check is a BroadcastNestedLoopJoin LEFT ANTI with a
    `contains` predicate — each training partition scans the span list
    locally, nothing shuffles. That is O(|train| x |spans|) substring
    tests, the right trade up to ~1e4 spans; beyond that, compile the
    span set into one Aho-Corasick automaton inside a mapInPandas
    kernel (same broadcast shape, linear scan per doc)."""
    from pyspark.sql.functions import broadcast

    sp = spans.select(F.col(span_col).alias("__span")).where(
        F.length("__span") > 0
    ).distinct()
    return train.join(
        broadcast(sp), F.col(text_col).contains(F.col("__span")), "left_anti"
    )


def _aho_corasick(patterns: list[str]) -> tuple[list[dict], list[int], list[bool]]:
    """Compile a pattern set into an Aho-Corasick automaton:
    (goto, fail, terminal). One pass per text character at match time,
    independent of the pattern count."""
    from collections import deque

    goto: list[dict] = [{}]
    term: list[bool] = [False]
    for p in patterns:
        node = 0
        for ch in p:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                term.append(False)
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        term[node] = True
    fail = [0] * len(goto)
    q = deque(goto[0].values())  # depth-1 nodes keep fail = root
    while q:
        u = q.popleft()
        term[u] = term[u] or term[fail[u]]
        for ch, v in goto[u].items():
            q.append(v)
            f = fail[u]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[v] = goto[f].get(ch, 0)
    return goto, fail, term


def _ac_contains_any(
    text: str, goto: list[dict], fail: list[int], term: list[bool]
) -> bool:
    node = 0
    for ch in text:
        while node and ch not in goto[node]:
            node = fail[node]
        node = goto[node].get(ch, 0)
        if term[node]:
            return True
    return False


def substring_decontaminate_ac(
    train: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
    span_col: str = "span",
) -> DataFrame:
    """The large-span-set tier of `substring_decontaminate`: identical
    semantics (drop training docs containing ANY benchmark span
    verbatim), but the span set is compiled into ONE Aho-Corasick
    automaton so each document is scanned in a single linear pass
    regardless of how many spans exist — the right shape past ~1e4
    spans, where the anti-join's per-doc |spans| `contains` probes stop
    being cheap.

    Plan shape for 100 TB: the span set is benchmark-sized, DRIVER
    state by design (same bounded-state argument as the IVF centroids:
    ~1e6 spans x ~100 chars ≈ 100 MB, broadcast once); training text
    streams through an Arrow `mapInPandas` kernel, nothing shuffles,
    and the filter composes with scan pushdown on every other
    predicate. Matching is per-character table walking in Python — for
    a JVM-only hot path keep the anti-join tier; this tier trades
    per-row constant factor for pattern-count independence."""
    span_list = sorted(
        r[0]
        for r in spans.select(F.col(span_col)).where(
            F.length(span_col) > 0
        ).distinct().collect()
    )
    if not span_list:
        return train
    automaton = _aho_corasick(span_list)
    bc = train.sparkSession.sparkContext.broadcast(automaton)
    schema = train.schema

    def scan(batches):
        goto, fl, term = bc.value
        for pdf in batches:
            keep = pdf[text_col].map(
                lambda t: not _ac_contains_any(t or "", goto, fl, term)
            )
            yield pdf[keep]

    return train.mapInPandas(scan, schema)


# --- BPE tokenizer: distributed training + memoized encode ----------------


def bpe_train(
    docs: DataFrame, text_col: str, n_merges: int
) -> list[tuple[str, str]]:
    """Learn a BPE merge list from a corpus, the distributed way: the
    corpus collapses to its DISTINCT-WORD frequency table in ONE pass
    (word-count shuffle), and every merge iteration then runs over that
    word table only — the standard trick (GPT-2's trainer does the
    same in-memory) that makes the per-merge cost proportional to the
    vocabulary, not the corpus. bpe1_pair_merges is one iteration of
    the counting step inlined over raw text; this is the full loop.

    Each iteration: count adjacent symbol pairs weighted by word
    frequency (map-side-combined), take the top pair under a TOTAL
    order (count DESC, then lexicographic — deterministic at ties),
    and fold the winning pair into every word's symbol array with a
    left-to-right `aggregate` lambda (greedy non-overlapping merge,
    matching the serial algorithm exactly). localCheckpoint per
    iteration keeps the lineage flat across the loop.

    Returns the ordered merge list. Driver state is ONE row per
    iteration (the winning pair) — never the word table. At 100 TB one
    trains on a bounded sample (tokenizers saturate long before the
    full corpus; the word-table shape makes even the full pass
    feasible, one job per merge).
    """
    words = (
        docs.select(F.explode(_toks(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.split("w", "").alias("syms"), "n")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            words.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i -> "
                        "struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        a_lit, b_lit = a.replace("'", "\\'"), b.replace("'", "\\'")
        fold = (
            "aggregate(syms, CAST(array() AS array<string>), (acc, s) -> "
            f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a_lit}' "
            f"AND s = '{b_lit}' "
            "THEN concat(slice(acc, 1, size(acc) - 1), "
            f"array('{a_lit}' || '{b_lit}')) "
            "ELSE concat(acc, array(s)) END)"
        )
        words = words.select(
            F.expr(fold).alias("syms"), "n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Encode a corpus with a learned merge list: per word, greedily
    apply the LOWEST-RANK applicable merge until none applies (the
    exact serial BPE apply — tiktoken/GPT-2 semantics at word level).

    Runs as an Arrow `mapInPandas` kernel — the merge table ships by
    value in the closure (vocab-sized, a few MB at 50k merges) and a
    per-task WORD MEMO caches each distinct word's encoding, so the
    per-row cost collapses to a dict lookup for every repeated word
    (natural language repeats: the memo hit rate is the corpus'
    type/token ratio). Zero shuffle — a pure projection; iterative
    greedy ranking is not expressible in single-pass SQL, so this
    operator is pytest-proven (round-trip, rank-priority, train/apply
    agreement) rather than oracle-paired.

    Output: id, tokens array<string>, n_tokens.
    """
    rank = {pair: i for i, pair in enumerate(merges)}
    schema = f"{id_col} bigint, tokens array<string>, n_tokens int"

    def run(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w)
            while len(syms) >= 2:
                best_rank, best_i = None, None
                for i in range(len(syms) - 1):
                    r = rank.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_i is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            memo[w] = syms
            return syms

        for b in batches:
            ids, toks, counts = [], [], []
            for doc_id, text in zip(b[id_col], b[text_col]):
                out: list[str] = []
                for w in (text or "").lower().split():
                    out += enc_word(w)
                ids.append(doc_id)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {id_col: ids, "tokens": toks, "n_tokens": counts}
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def c4_line_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 3,
    blocklist: tuple[str, ...] = ("javascript",),
    require_terminal_punct: bool = True,
    doc_blocklist: tuple[str, ...] = ("lorem ipsum", "{"),
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style corpus cleaning (the public recipe of Raffel et al. 2020,
    §2.2 — the line/document rules behind the C4 dataset): drop lines
    with fewer than `min_words` words, lines containing a blocklist term,
    and (optionally) lines not ending in terminal punctuation; flag whole
    documents that contain a doc-level blocklist term ("lorem ipsum",
    code-brace) or retain fewer than `min_kept_lines` clean lines.

    Everything is array/string HOF expressions over the split lines —
    per-row projection, zero shuffle, scan-speed at any corpus size, and
    every keep decision replays exactly in ANSI SQL (list_filter with the
    same conditions). Returns (id, n_lines, n_kept_lines, clean_text,
    doc_kept); downstream stages filter on doc_kept and read clean_text.
    """
    lines = F.split(F.col(text_col), "\n")

    def ok(line):
        cond = F.size(F.split(F.trim(line), " +")) >= min_words
        for term in blocklist:
            cond = cond & ~F.lower(line).contains(term)
        if require_terminal_punct:
            cond = cond & line.rlike(r'[.!?"]\s*$')
        return cond

    kept = F.filter(lines, ok)
    doc_ok = F.lit(True)
    for term in doc_blocklist:
        doc_ok = doc_ok & ~F.lower(F.col(text_col)).contains(term)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
        (doc_ok & (F.size(kept) >= min_kept_lines)).alias("doc_kept"),
    )


def unicode_normalize(
    df: DataFrame, text_col: str, form: str = "NFC", out_col: str | None = None
) -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) of a text column — the
    corpus-cleaning pass that folds combining sequences into composed
    codepoints so dedup hashes, tokenizers, and equality joins see one
    canonical byte form (mojibake and width variants otherwise split
    identical texts into distinct keys).

    Spark has no built-in normalizer, so this is an Arrow `mapInPandas`
    kernel over stdlib `unicodedata` — batched columnar transfer, zero
    shuffle, composes with scan pushdown; the per-row Python cost is the
    documented tax (a JVM ICU UDF would lift it, but ICU4J isn't in the
    sandbox). Rows stream through one pass; output schema = input with
    `out_col` (default: in place) as a string column."""
    import unicodedata

    from pyspark.sql import types as T

    out = out_col or text_col
    fields = list(df.schema.fields)
    if out not in df.columns:
        fields = fields + [T.StructField(out, T.StringType(), True)]
    schema = T.StructType(fields)

    def kernel(batches):
        for pdf in batches:
            pdf[out] = pdf[text_col].map(
                lambda t: unicodedata.normalize(form, t)
                if t is not None
                else None
            )
            yield pdf

    return df.mapInPandas(kernel, schema)


def content_defined_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    w: int = 8,
    mask: int = 32,
) -> DataFrame:
    """Content-defined chunking (Rabin-style, the LBFS/rsync/casync
    boundary rule): a chunk boundary falls after every position whose
    trailing w-char polynomial rolling hash ≡ 0 (mod `mask`), so chunk
    boundaries move WITH the content — inserting one byte re-chunks
    only the neighborhood, unlike fixed-size blocks where every
    downstream block shifts. Emits (id, chunk_idx, chunk_len,
    chunk_md5): the md5 stream is the storage-dedup key (identical
    passages yield identical chunk hashes wherever they sit).

    Plan shape: pure per-row projection over the scan — zero shuffle,
    composes with pushdown; expected chunk length = `mask` chars and
    per-row cost is O(len * w). Each intermediate array (chars,
    boundary positions, bounds) is materialized as its OWN projection
    step: referencing the boundary transform from inside the chunk
    lambda would re-inline the O(len*w) hash scan at every one of the
    4 references (the word_shingles lesson, compounded — the inlined
    tree hung codegen outright at 50 rows before this split).

    Low-entropy PERIODIC text can miss every boundary residue and yield
    one giant chunk (tests/test_wave7.py demonstrates it) — production
    CDC caps chunk size (FastCDC min/max bounds); the cap is a second
    filter pass left out here to keep the oracle replay exact."""
    from .textstats import FP_BASE, FP_MOD

    base = df.where(F.length(text_col) > 0).select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        F.length(text_col).cast("bigint").alias("__n"),
        F.split(F.col(text_col), "").alias("__chars"),
    )
    chars = F.col("__chars")

    def gram_hash(p: Column) -> Column:
        h: Column = F.lit(0).cast("bigint")
        for j in range(w):
            c = F.ascii(
                F.element_at(chars, (p - F.lit(w - 1 - j)).cast("int"))
            ).cast("bigint")
            h = (h * F.lit(FP_BASE) + c) % F.lit(FP_MOD)
        return h

    positions = F.when(
        F.col("__n") - 1 >= w,
        F.sequence(F.lit(w).cast("bigint"), F.col("__n") - 1),
    ).otherwise(F.expr("CAST(array() AS array<bigint>)"))
    with_bpos = base.select(
        id_col,
        "__text",
        "__n",
        F.filter(
            F.transform(
                positions, lambda p: F.when(gram_hash(p) % mask == 0, p)
            ),
            lambda p: p.isNotNull(),
        ).alias("__bpos"),
    )
    with_bounds = with_bpos.select(
        id_col,
        "__text",
        F.concat(
            F.array(F.lit(0).cast("bigint")),
            F.col("__bpos"),
            F.array(F.col("__n")),
        ).alias("__bounds"),
    )
    bounds = F.col("__bounds")
    text = F.col("__text")
    chunks = F.transform(
        F.sequence(
            F.lit(0).cast("bigint"), F.size(bounds).cast("bigint") - 2
        ),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            (
                F.element_at(bounds, (i + 2).cast("int"))
                - F.element_at(bounds, (i + 1).cast("int"))
            ).alias("chunk_len"),
            F.md5(
                text.substr(
                    F.element_at(bounds, (i + 1).cast("int")) + 1,
                    F.element_at(bounds, (i + 2).cast("int"))
                    - F.element_at(bounds, (i + 1).cast("int")),
                ).cast("binary")
            ).alias("chunk_md5"),
        ),
    )
    return with_bounds.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(
        id_col,
        F.col("__c.chunk_idx").alias("chunk_idx"),
        F.col("__c.chunk_len").alias("chunk_len"),
        F.col("__c.chunk_md5").alias("chunk_md5"),
    )


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style quality rule flags (Rae et al. 2021 §A1.1) — see
    tx19's docstring for the rule set and the integer-space threshold
    discipline. Emits (id, n_words, wordcount_ok, meanlen_ok, alpha_ok,
    stopword_ok, symbol_ok, keep); pure single-pass projection."""
    toks = F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")
    feats = df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_words"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("sum_len"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        .cast("bigint")
        .alias("n_alpha"),
        F.size(F.filter(toks, lambda t: t.isin(*GOPHER_STOPS)))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.filter(toks, lambda t: (t == "#") | (t == "...")))
        .cast("bigint")
        .alias("n_sym"),
    )
    wordcount_ok = (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
    meanlen_ok = (3 * F.col("n_words") <= F.col("sum_len")) & (
        F.col("sum_len") <= 10 * F.col("n_words")
    )
    alpha_ok = 5 * F.col("n_alpha") >= 4 * F.col("n_words")
    stopword_ok = F.col("n_stop") >= 2
    symbol_ok = 10 * F.col("n_sym") <= F.col("n_words")
    return feats.select(
        id_col,
        "n_words",
        wordcount_ok.alias("wordcount_ok"),
        meanlen_ok.alias("meanlen_ok"),
        alpha_ok.alias("alpha_ok"),
        stopword_ok.alias("stopword_ok"),
        symbol_ok.alias("symbol_ok"),
        (
            wordcount_ok & meanlen_ok & alpha_ok & stopword_ok & symbol_ok
        ).alias("keep"),
    )
