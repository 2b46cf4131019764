"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All pure `pyspark.sql.functions` expressions (whole-stage codegen; zero
Python in the row path) and engine-portable — each has an exact SQL
equivalent used by the DuckDB oracles.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame, functions as F

from parquet_index_spark.operators.dedup import shingles, tokens

# small, fixed stopword lists per language for the n-gram/stopword heuristic
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "et", "de", "un"],
    "es": ["el", "la", "y", "de", "un"],
    "zh": ["的", "了", "是", "在", "我"],
}
LANGS = sorted(STOPWORDS)


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (the BPE-ish regex variant adds splits on
    punctuation boundaries; this corpus has none)."""
    return F.size(tokens(text_col))


def char_count(text_col: str = "text") -> Column:
    return F.length(F.col(text_col))


# GPT-2-style pre-tokenizer approximation, restricted to constructs both
# Java regex (Spark) and RE2 (DuckDB/others) evaluate identically: a token
# is an optionally space-prefixed letter run, digit run, or punctuation run.
# The real BPE pattern's lookahead (`\s+(?!\S)`) is dropped — RE2 has no
# lookahead — which only changes how trailing whitespace groups, not counts.
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text_col: str = "text") -> Column:
    """Subword-boundary token count: splits punctuation from words the way
    BPE pre-tokenizers do, so `don't stop!` counts 5 ("don", "'", "t",
    " stop", "!") where whitespace counting sees 2. Pure regexp_count —
    JVM-side, codegen'd, and the same pattern runs in any RE2 engine."""
    return F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))


def stopword_ratio(text_col: str = "text", lang: str = "en") -> Column:
    toks = tokens(text_col)
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits / F.size(toks)


def avg_token_len(text_col: str = "text") -> Column:
    # sum of token lengths == length of their empty-separator
    # concatenation — same integer, but concat_ws/length are codegen'd
    # while an F.aggregate fold is an interpreted per-element lambda
    # (round-15; tokens() never yields NULL elements, so concat_ws's
    # NULL-skipping cannot diverge from the old fold)
    toks = tokens(text_col)
    return F.length(F.concat_ws("", toks)) / F.size(toks)


def quality_score(text_col: str = "text") -> Column:
    """Composite quality heuristic in [0,1]: length band + stopword presence
    + token-length sanity. Deliberately simple and portable; real pipelines
    swap in model scores via the same column contract."""
    n_tok = token_count(text_col)
    sw = stopword_ratio(text_col, "en")
    atl = avg_token_len(text_col)
    len_ok = F.when((n_tok >= 20) & (n_tok <= 1000), 1.0).otherwise(0.5)
    sw_ok = F.when((sw > 0.0) & (sw < 0.5), 1.0).otherwise(0.5)
    atl_ok = F.when((atl >= 2.0) & (atl <= 12.0), 1.0).otherwise(0.5)
    return F.round((len_ok + sw_ok + atl_ok) / 3.0, 4)


def lang_scores(text_col: str = "text") -> Dict[str, Column]:
    toks = tokens(text_col)
    return {lang: F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))
            for lang in LANGS}


def predict_lang(text_col: str = "text") -> Column:
    """argmax of stopword hits, lexicographic tiebreak ('und' beats 'unk'
    ties deterministically). Returns 'unk' when no list scores > 0."""
    scores = lang_scores(text_col)
    best = F.lit("unk")
    best_score = F.lit(0)
    # iterate langs in reverse-sorted order so earlier (sorted-first) lang
    # wins ties via strict '>' in the final fold
    for lang in sorted(LANGS, reverse=True):
        s = scores[lang]
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return best


def document_fingerprint(text_col: str = "text") -> Column:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text — robust to case/spacing-only edits."""
    normalized = F.concat_ws(" ", F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    return F.md5(normalized)


def chunk_sliding(df: DataFrame, *, chunk_tokens: int, stride_tokens: int,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Sliding-window chunker with overlap — the RAG / context-window
    pretraining primitive ``pack_chunks`` (concat-and-cut) does not
    cover: every document yields chunks of ``chunk_tokens`` whitespace
    tokens starting every ``stride_tokens`` (overlap = chunk - stride;
    the final chunk is the short tail). Deterministic: chunk boundaries
    depend only on the document's own tokens.

    Returns one row per chunk: every input column except ``text_col``
    passes through (ids, lang, source, ... — no join-back needed), plus
    ``(chunk_index, start_token, n_chunk_tokens, chunk_text)``. A NULL
    ``text_col`` yields zero chunk rows for that document (documented
    drop; run a ``validate.not_null`` gate first if that matters).
    Input columns may not use the four output names above (ValueError).

    Scale: pure map-side codegen — tokenize, ``sequence()`` the start
    offsets, explode, ``slice``+``array_join`` — no shuffle, no Python,
    no per-document state beyond the row. Output row count is
    ~``total_tokens / stride``; at 100 TB feed it straight into a
    partitioned writer (chunks inherit the input's partitioning).
    Engine-portable: generate_series/list-slice reproduce it in SQL
    (workload CHUNK_OVERLAP_SQL).
    """
    if chunk_tokens <= 0 or stride_tokens <= 0:
        raise ValueError("chunk_tokens and stride_tokens must be positive")
    if id_col not in df.columns:
        raise ValueError(f"id column {id_col!r} absent")
    reserved = {"chunk_index", "start_token", "n_chunk_tokens",
                "chunk_text"}
    clash = reserved & {c for c in df.columns if c != text_col}
    if clash:
        raise ValueError(
            f"input columns collide with chunk output names: {sorted(clash)}")
    keep = [c for c in df.columns if c != text_col]
    # NULL text yields zero chunk rows (explode of an empty array), the
    # same rows DuckDB's unnest(generate_series(NULL)) drops — never a
    # NULL-boundary sequence() error, never a silent engine divergence
    df = df.withColumn("__toks",
                       F.coalesce(tokens(text_col),
                                  F.array().cast("array<string>"))) \
           .withColumn("__n", F.size("__toks"))
    start = F.col("start_token")
    return (df
            .withColumn("start_token",
                        F.explode(F.when(
                            F.col("__n") > 0,
                            F.expr(f"sequence(0, __n - 1, {stride_tokens})"))
                            .otherwise(F.array().cast("array<int>"))))
            .select(
                *keep,
                F.floor(start / stride_tokens).alias("chunk_index"),
                start,
                F.least(F.lit(chunk_tokens),
                        F.col("__n") - start).alias("n_chunk_tokens"),
                F.array_join(
                    F.slice("__toks", start + 1, chunk_tokens), " ")
                .alias("chunk_text")))


def bm25_rank(docs: DataFrame, query_terms: List[str], *,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              top_k: int = 10) -> DataFrame:
    """BM25 ranked retrieval (Lucene-style idf) over a document table,
    returning the top_k (doc_id, bm25, n_terms_hit) rows.

    Scale shape: the exploded term stream is filtered to the query's terms
    BEFORE the (doc, term) aggregation, so the shuffle carries only hits —
    corpus size bounds the doc-length side (two ints per doc), never a
    term-level blowup. Corpus constants (N, avgdl) come from one tiny agg
    (driver scalars, like q22's threshold). Final top-k is orderBy+limit
    (TakeOrderedAndProject — no global window).

    Determinism: each term's contribution is rounded to 6dp and summed as
    DECIMAL(18,6) — decimal addition is exact and order-independent, so
    the score is identical across partitionings and engines (the float
    sum-order trap the oracle compare would otherwise hit).
    """
    if not query_terms:
        raise ValueError("bm25_rank requires at least one query term")
    doc_id = F.col(id_col).alias("doc_id")
    terms = docs.select(doc_id, F.explode(tokens(text_col)).alias("term"))
    hits = terms.filter(F.col("term").isin(list(query_terms)))
    tf = hits.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    stats = (docs.select(token_count(text_col).alias("dl"))
             .agg(F.sum("dl").alias("s"), F.count("*").alias("n")).head())
    n_docs, avgdl = int(stats["n"]), float(stats["s"]) / float(stats["n"])
    df_t = (hits.select("doc_id", "term").distinct()
            .groupBy("term").agg(F.count("*").alias("df")))
    dls = docs.select(doc_id, token_count(text_col).alias("dl"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    contrib = F.round(idf * F.col("tf") * (k1 + 1.0) / denom, 6)
    scored = (tf.join(F.broadcast(df_t), "term").join(dls, "doc_id")
              .select("doc_id", contrib.alias("contrib")))
    return (scored.groupBy("doc_id")
            .agg(F.sum(F.col("contrib").cast("decimal(18,6)"))
                 .cast("double").alias("bm25"),
                 F.count("*").alias("n_terms_hit"))
            .orderBy(F.col("bm25").desc(), F.col("doc_id"))
            .limit(top_k))


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher/MassiveText-style intra-document repetition signals — the
    classic web-crawl quality gates for boilerplate and degenerate text:

    - ``dup_token_frac``: 1 - distinct/total tokens (vocabulary collapse)
    - ``top_token_frac``: most frequent token's share of all tokens
    - ``dup_bigram_frac``: 1 - distinct/total 2-grams (phrase looping)

    Pure higher-order functions (array_distinct + a nested
    transform/filter count for the mode) — JVM codegen, no Python, and
    the identical expressions run in any list-capable SQL engine (the
    DuckDB oracle uses the same nested lambdas). Cost is
    O(distinct x total) per row, which is the right trade below ~1k
    tokens; longer documents should pre-chunk (pack_chunks) first.
    """
    toks = tokens(text_col)
    grams = shingles(text_col, k=2)
    n = F.size("__toks").cast("double")
    top_cnt = F.array_max(F.transform(
        F.array_distinct("__toks"),
        lambda u: F.size(F.filter(F.col("__toks"), lambda t: t == u))))
    return (df.select(F.col(id_col), toks.alias("__toks"),
                      grams.alias("__grams"))
            .select(
                F.col(id_col),
                F.round(1.0 - F.size(F.array_distinct("__toks")) / n, 6)
                .alias("dup_token_frac"),
                F.round(top_cnt / n, 6).alias("top_token_frac"),
                F.round(1.0 - F.size(F.array_distinct("__grams"))
                        / F.size("__grams").cast("double"), 6)
                .alias("dup_bigram_frac")))


def top_terms(df: DataFrame, k: int = 20, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Exact corpus heavy hitters: the ``k`` most frequent tokens with
    their total occurrence count and document frequency.

    Scale shape: explode feeds a map-side-combinable (term) aggregation —
    the shuffle carries one (term, count, partial-HLL-free df) row per
    distinct term per task, never the token stream itself. Document
    frequency reuses the same exploded pass via a count(DISTINCT doc)
    rewrite (Spark expands it to two-stage aggregation, still one scan).
    Final top-k is orderBy+limit (TakeOrderedAndProject — no global sort
    materialization). Ties break lexicographically so the limit is
    deterministic.
    """
    terms = df.select(F.col(id_col).alias("__doc"),
                      F.explode(tokens(text_col)).alias("term"))
    return (terms.groupBy("term")
            .agg(F.count("*").alias("n_occurrences"),
                 F.countDistinct("__doc").alias("n_docs"))
            .orderBy(F.col("n_occurrences").desc(), F.col("term"))
            .limit(k))


def text_profile(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document profile: tokens, chars, stopword ratio, avg token len,
    quality score, predicted language, fingerprint.

    Tokenizes ONCE: the composed helpers each re-split the text, which
    evaluated the regex split ~10x per row inside one collapsed
    projection (3.3x the runtime of this staged form at sf0.1). Staged
    projections keep every derived column a cheap expression over the
    shared ``__toks`` array, and CollapseProject leaves multiply-
    referenced non-trivial aliases in their own stage, so codegen
    evaluates the split exactly once per row. Values are bit-identical
    to the helper compositions (same expressions over the same array;
    the fingerprint lowers the joined tokens instead of re-splitting
    lowered text — whitespace is case-invariant)."""
    toks = tokens(text_col)

    def _hits(lang: str) -> Column:
        return (F.size(F.filter(F.col("__toks"),
                                lambda t: t.isin(STOPWORDS[lang])))
                .alias(f"__sw_{lang}"))

    hit_cols = [_hits(lang) for lang in LANGS]
    staged = (df.select(F.col(id_col), F.col(text_col).alias("__text"),
                        toks.alias("__toks"))
              .select(
                  F.col(id_col),
                  F.size("__toks").alias("__n_tok"),
                  F.length("__text").alias("__n_chars"),
                  F.aggregate("__toks", F.lit(0).cast("long"),
                              lambda acc, t: acc + F.length(t))
                  .alias("__tot_len"),
                  F.md5(F.lower(F.concat_ws(" ", F.col("__toks"))))
                  .alias("fingerprint"),
                  *hit_cols))
    n_tok = F.col("__n_tok")
    sw = F.col("__sw_en") / n_tok
    atl = F.col("__tot_len") / n_tok
    len_ok = F.when((n_tok >= 20) & (n_tok <= 1000), 1.0).otherwise(0.5)
    sw_ok = F.when((sw > 0.0) & (sw < 0.5), 1.0).otherwise(0.5)
    atl_ok = F.when((atl >= 2.0) & (atl <= 12.0), 1.0).otherwise(0.5)
    best = F.lit("unk")
    best_score = F.lit(0)
    # iterate langs in reverse-sorted order so earlier (sorted-first) lang
    # wins ties via strict '>' in the final fold (same rule as predict_lang)
    for lang in sorted(LANGS, reverse=True):
        s = F.col(f"__sw_{lang}")
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.col("__n_chars").alias("n_chars_m"),
        F.round(sw, 6).alias("en_stopword_ratio"),
        F.round(atl, 6).alias("avg_token_len"),
        F.round((len_ok + sw_ok + atl_ok) / 3.0, 4).alias("quality"),
        best.alias("pred_lang"),
        "fingerprint")


# PII patterns restricted to constructs Java regex (Spark) and RE2
# (DuckDB) evaluate identically — no lookarounds, no backrefs. Redaction
# order matters only across families that could nest; these three cannot
# (emails need letters, phones are dash/dot-separated 3-3-4 digit runs,
# IPv4 needs dotted digit quads), so any order yields the same text.
PII_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII detection counts — the release-gate signal of a
    training-data pipeline (count first, redact or drop second).

    One pass of JVM-side ``regexp_count`` per pattern family (codegen, no
    Python); at 100 TB this is a map-only projection with zero shuffle.
    Appends (n_emails, n_phones, n_ipv4, has_pii) so it composes with
    :func:`redact_pii` on a single scan, no join."""
    cnt = {k: F.regexp_count(F.col(text_col), F.lit(p))
           for k, p in PII_PATTERNS.items()}
    # has_pii references the count COLUMNS (not the regexp expressions):
    # multiply-referenced non-trivial aliases survive CollapseProject in
    # their own stage, so each pattern is evaluated once per row, not
    # twice (same staging trick as text_profile)
    return (df.withColumns({"n_emails": cnt["email"],
                            "n_phones": cnt["phone"],
                            "n_ipv4": cnt["ipv4"]})
            .withColumn("has_pii",
                        F.col("n_emails") + F.col("n_phones")
                        + F.col("n_ipv4") > 0))


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = None) -> DataFrame:
    """Replace every PII match with a typed placeholder (``<EMAIL>``,
    ``<PHONE>``, ``<IPV4>``) — the redact-in-place alternative to
    dropping documents. Chained ``regexp_replace`` stays whole-stage
    codegen; map-only at any scale."""
    out = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return df.withColumn(out_col or text_col, out)


def vocab_drift(df_a: DataFrame, df_b: DataFrame, group: str,
                text_col: str = "text") -> DataFrame:
    """Corpus drift monitor: per-``group`` total-variation distance
    between two snapshots' unigram distributions —
    ``TV = 1/2 * sum_t |p_a(t) - p_b(t)|`` in [0, 1], the
    "did this month's crawl shift under me" signal a training pipeline
    watches between snapshots. TV over KL on purpose: it needs no
    smoothing for unseen tokens and is computable in EXACT integer
    arithmetic — the per-token contribution is
    ``|n_a(t) * T_b - n_b(t) * T_a|`` (DECIMAL(38,0), overflow-safe past
    2^63 token-count products), summed exactly, with one final
    correctly-rounded double division — so any engine reproduces the
    identical rounded value (log-based divergences inherit libm's
    last-ulp variance).

    Scale shape: two map-side-combinable (group, token) count aggs, one
    full-outer equi join on (group, token) — vocabulary-sized, not
    corpus-sized — with the per-group totals broadcast back. Returns
    (group, vocab_a, vocab_b, tv_distance).
    """
    def freqs(df, n_col):
        return (df.select(F.col(group),
                          F.explode(tokens(text_col)).alias("tok"))
                .filter(F.col("tok") != "")
                .groupBy(group, "tok")
                .agg(F.count("*").cast("long").alias(n_col)))

    # each side's frequency frame is referenced twice (totals + the
    # full-outer join): checkpoint it so the corpus is scanned ONCE per
    # side (unmaterialized, Catalyst re-plans the scan subtree per
    # reference — the original form read the corpus 4x), and totals stay
    # a map-side-combinable agg broadcast back (no per-group window that
    # would funnel a language's whole vocabulary through one task). The
    # checkpointed frame is vocabulary-sized — sublinear in corpus.
    from parquet_index_spark.operators._ckpt import checkpoint_corpus
    fa = checkpoint_corpus(freqs(df_a, "na"))
    fb = checkpoint_corpus(freqs(df_b, "nb"))
    ta = fa.groupBy(group).agg(F.sum("na").alias("Ta"),
                               F.count("*").alias("va"))
    tb = fb.groupBy(group).agg(F.sum("nb").alias("Tb"),
                               F.count("*").alias("vb"))
    # LEFT totals joins: a group present in only ONE snapshot is the
    # monitor's loudest event (a language appearing or vanishing is
    # TV = 1 by the empty-distribution convention) — inner joins dropped
    # exactly that row
    j = (fa.join(fb, [group, "tok"], "full_outer")
         .na.fill(0, ["na", "nb"])
         .join(F.broadcast(ta), group, "left")
         .join(F.broadcast(tb), group, "left"))
    contrib = F.expr(
        "abs(CAST(na AS DECIMAL(38,0)) * Tb - CAST(nb AS DECIMAL(38,0)) * Ta)")
    return (j.groupBy(group)
            .agg(F.sum(contrib).alias("__num"),
                 F.max("Ta").alias("__ta"), F.max("Tb").alias("__tb"),
                 F.max("va").alias("__va"), F.max("vb").alias("__vb"))
            .select(F.col(group),
                    F.coalesce("__va", F.lit(0)).alias("vocab_a"),
                    F.coalesce("__vb", F.lit(0)).alias("vocab_b"),
                    F.when(F.col("__ta").isNull()
                           | F.col("__tb").isNull(), F.lit(1.0))
                    .otherwise(
                        F.round(F.col("__num").cast("double")
                                / (F.lit(2.0) * F.col("__ta").cast("double")
                                   * F.col("__tb").cast("double")), 6))
                    .alias("tv_distance"))
            .orderBy(group))
