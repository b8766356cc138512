"""Text-analysis column functions for the training-data pipeline
(driver extension surface, SURVEY.md §7 step 9): tokenization, quality
stats, language ID, document fingerprinting.

All hot-path logic is built-in pyspark.sql.functions (JVM, whole-stage
codegen) — no Python UDFs. Every function has an exact DuckDB twin in
plans/queries.py; tokenization is regex-based and engine-agnostic.

At 100 TB: these are embarrassingly parallel narrow ops (no shuffle except
the final per-doc aggregate of the exploded token stream, which combines
map-side), so they scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# tiny per-language stopword lists for the n-gram/stopword language heuristic
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]
STOPWORDS_ES = ["el", "la", "de", "y", "que", "en", "un", "es", "por", "con"]
STOPWORDS_DE = ["der", "die", "das", "und", "zu", "in", "ist", "ein", "mit", "von"]


def normalize(col: Column) -> Column:
    """Lowercase + collapse non-alphanumerics to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(col), TOKEN_SPLIT_RE, " "))


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode to one row per (doc, token). Whitespace+punct regex
    tokenizer — the 'BPE-ish regex' path is the same explode with a
    different pattern."""
    return (
        # rebalance docs before the explode (single-file fixture scans are
        # one partition; doc-size skew wants the same at corpus scale).
        # Explicit count so AQE can't coalesce the small pre-explode shuffle.
        df.repartition(df.sparkSession.sparkContext.defaultParallelism,
                       F.col(id_col))
        .select(id_col, F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("token"))
        .filter(F.col("token") != "")
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality stats: char/token counts, punctuation count,
    stopword ratio, mean token length."""
    toks = tokens(df, text_col, id_col)
    stop = F.col("token").isin(STOPWORDS_EN)
    tok_agg = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(stop.cast("int")).alias("n_stopwords"),
        F.sum(F.length("token")).alias("_tok_chars"),
    )
    base = df.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z0-9 ]", "")).alias("n_punct"),
    )
    return (
        base.join(tok_agg, id_col, "left")
        .select(
            id_col, "n_chars", "n_punct",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_stopwords", F.lit(0)).alias("n_stopwords"),
            (F.coalesce("n_stopwords", F.lit(0))
             / F.nullif(F.coalesce("n_tokens", F.lit(0)), F.lit(0))).alias("stopword_ratio"),
            (F.col("_tok_chars")
             / F.nullif(F.coalesce("n_tokens", F.lit(0)), F.lit(0))).alias("mean_token_len"),
        )
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language heuristic with a deterministic argmax
    (ties broken en > es > de > und)."""
    toks = tokens(df, text_col, id_col)
    scores = toks.groupBy(id_col).agg(
        F.sum(F.col("token").isin(STOPWORDS_EN).cast("int")).alias("en_hits"),
        F.sum(F.col("token").isin(STOPWORDS_ES).cast("int")).alias("es_hits"),
        F.sum(F.col("token").isin(STOPWORDS_DE).cast("int")).alias("de_hits"),
    )
    pred = (
        F.when((F.col("en_hits") == 0) & (F.col("es_hits") == 0) & (F.col("de_hits") == 0), "und")
        .when((F.col("en_hits") >= F.col("es_hits")) & (F.col("en_hits") >= F.col("de_hits")), "en")
        .when(F.col("es_hits") >= F.col("de_hits"), "es")
        .otherwise("de")
    )
    return scores.select(id_col, "en_hits", "es_hits", "de_hits", pred.alias("lang_pred"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 of the normalized text (exact-dup key)
    and md5 of its first 64 chars (prefix fingerprint — the cheap
    rolling-hash stand-in)."""
    norm = normalize(F.col(text_col))
    return df.select(
        id_col,
        F.md5(norm).alias("fp_full"),
        F.md5(F.substring(norm, 1, 64)).alias("fp_prefix64"),
    )


# GPT-2-style pre-tokenizer pattern, simplified to the engine-portable
# subset (no \p classes, no lookahead): contraction suffixes, letter runs,
# digit runs, non-space-non-alnum runs — the "BPE-ish regex" token counter.
BPE_TOKEN_RE = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def bpe_token_count(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc token count under the BPE-ish pre-tokenizer regex, plus the
    whitespace-token count for comparison — the cheap proxy for "how many
    LLM tokens is this corpus" that data pipelines run at ingest. Pure
    regexp_extract_all, no explode: one narrow pass."""
    return df.select(
        id_col,
        F.array_size(F.regexp_extract_all(F.col(text_col),
                                          F.lit(BPE_TOKEN_RE),
                                          0)).alias("n_bpe_tokens"),
        F.array_size(
            F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                     lambda t: t != "")
        ).alias("n_ws_tokens"),
    )


def token_array(col: Column) -> Column:
    """Tokenize to an in-row array (the array-based sibling of tokens()):
    lowercase, split on non-alphanumerics, drop empties. Keeping tokens as
    a per-row array lets n-gram / chunking / repetition ops run as narrow
    projections — no explode, no shuffle — which is the whole game at
    corpus scale."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def ngram_array(tok_col: str, n: int) -> Column:
    """Space-joined token n-grams of an array column, as an array
    expression (one per start position; empty when the doc has < n
    tokens). DuckDB twin: ``array_to_string(l[g:g+n-1], ' ')`` over
    ``generate_series(1, greatest(len(l)-(n-1), 0))``."""
    c = tok_col
    return F.expr(
        f"transform(slice({c}, 1, greatest(size({c}) - {n - 1}, 0)),"
        f" (x, i) -> concat_ws(' ', slice({c}, i + 1, {n})))"
    )


def chunk_starts(tok_col: str, stride: int) -> Column:
    """1-based chunk start positions stepping ``stride`` across the token
    array (always at least one start, so empty docs still emit their empty
    chunk for the caller to filter). DuckDB twin:
    ``generate_series(1, greatest(len(l), 1), stride)``."""
    return F.expr(f"sequence(1, greatest(size({tok_col}), 1), {stride})")


# Engine-portable PII patterns (no lookarounds, no \p classes — the subset
# where Java regex and DuckDB/RE2 agree). Deliberately simple: the point is
# the redaction *pipeline* shape; production swaps in its own pattern pack.
PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_PHONE_RE = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3}-?[0-9]{4}"


def pii_redact(col: Column) -> Column:
    """Replace emails then phone numbers with typed placeholder tags.
    Order matters: the email pattern can contain digits-and-dots runs the
    phone pattern would otherwise nibble."""
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts for audit columns."""
    return (
        F.regexp_count(col, F.lit(PII_EMAIL_RE)),
        F.regexp_count(col, F.lit(PII_PHONE_RE)),
    )
