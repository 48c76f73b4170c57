"""Text analysis operators (SURVEY.md §2.10 text_*): tokenization +
stats, TF-IDF, n-grams, quality scoring, language ID, fingerprinting.

All built-in expressions (split/explode/aggregate/regexp) — the hot
path never leaves the JVM. Each function returns a DataFrame and is
oracle-checkable in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Tiny english stopword list used by tokenize/quality/language-id.
#: Deterministic and mirrored literally in the DuckDB oracles.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

#: The modulus/multiplier of the rolling fingerprint (fits in int64 —
#: DuckDB BIGINT overflow errors, so every step stays < 2^63).
FP_MOD = 1_000_000_007
FP_MULT = 31


def tokenize_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token counts: whitespace tokens, regex ([a-z0-9]+)
    tokens (the BPE-ish fallback for unnormalized text), distinct
    tokens, and stopword count."""
    toks = F.split(F.col(text_col), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[a-z0-9]+"), 0)).alias("n_re_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.size(F.array_intersect(toks, stop_arr)).alias("n_stop_kinds"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("n_stop"),
    )


def tfidf(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_tfidf: float = 0.0
) -> DataFrame:
    """Exact TF-IDF per (document, term): tf · ln(N/df).

    Pure DataFrame math (no HashingTF — feature hashing is
    irreproducible across engines). Two aggregations: term counts per
    doc (shuffle on (doc, term)), document frequency (shuffle on term,
    joined back). The df-side join is deliberately UNhinted: web-scale
    vocabularies grow ~O(corpus^0.5+) (typos/URLs/numbers), so a forced
    broadcast of the term dimension would eventually OOM the driver; AQE
    still picks a broadcast join at runtime whenever dfreq's measured
    size is under the threshold, and degrades to a shuffled join —
    correct, not fatal — when it isn't."""
    tokens = df.select(
        F.col(id_col).alias("doc"), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = tokens.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    # tf is already one row per (doc, term), so document frequency is a
    # count over tf — no second explode, no distinct shuffle, and the tf
    # exchange is reused (ReusedExchange) instead of recomputed.
    # The aggregate must REFERENCE the tf column (tf > 0 is always true,
    # so the count is unchanged): with a plain count(1), column pruning
    # drops the partial_count from this branch's copy of the tf
    # subtree, the two Exchanges stop being canonically equal, and AQE
    # runtime reuse cannot fire — measured as a second full
    # scan→explode→partial-agg pass of the token stream (r13 plan
    # audit; plans/r13/text_tfidf_before.txt nodes 12–18).
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, F.lit(1))).alias("df")
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("doc").alias(id_col),
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
        .filter(F.col("tfidf") >= min_tfidf)
    )


def ngram_counts(
    df: DataFrame, n: int = 2, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide word n-gram counts via an index-sequence transform
    over the token array (no self-join; one explode + one hash agg)."""
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]),
    )
    # Guard: sequence(1, 0) DESCENDS in Spark; short docs must yield [].
    grams = F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, lexical diversity, stopword
    ratio — the standard cheap pre-filter before expensive dedup/LLM
    stages. Score = diversity · (1 − stop_ratio), rounded 6dp."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    diversity = n_uniq.cast("double") / n_tok
    stop_ratio = n_stop.cast("double") / n_tok
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        F.round(diversity, 6).alias("diversity"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(diversity * (1 - stop_ratio), 6).alias("quality"),
    )


def language_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    truth_col: str | None = "lang",
) -> DataFrame:
    """Stopword-overlap language heuristic: en if ≥10% of tokens are
    english stopwords (the classic cheap n-gram-profile trick reduced
    to one profile; real corpora would carry one stopword set per
    language and argmax the overlap — same plan shape, more columns).

    ``truth_col`` optionally carries a ground-truth label through for
    evaluation; pass None for corpora without one.
    """
    toks = F.split(F.col(text_col), " ")
    ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / F.size(toks)
    cols = [F.col(id_col)]
    if truth_col is not None:
        cols.append(F.col(truth_col).alias("lang_true"))
    cols += [
        F.round(ratio, 6).alias("en_stop_ratio"),
        F.when(ratio >= 0.1, "en").otherwise("other").alias("lang_pred"),
    ]
    return df.select(*cols)


def document_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Two deterministic fingerprints per document: md5 of the raw text
    (cross-engine byte-exact) and a rolling polynomial hash over tokens
    (acc·31 + len(t)·7 + ascii(t[0]) mod 1e9+7) — the streaming-friendly
    shape used for shift-tolerant chunk dedup."""
    toks = F.split(F.col(text_col), " ")
    codes = F.transform(
        toks, lambda t: (F.length(t) * 7 + F.ascii(t)).cast("long")
    )
    rolling = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_MULT + x) % FP_MOD,
    )
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("md5_fp"),
        rolling.alias("rolling_fp"),
    )


# BPE-style pre-tokenizer pattern (GPT-2 family shape, simplified to the
# RE2-safe subset so the DuckDB oracle matches byte-for-byte): a token is
# an optionally space-prefixed letter run, digit run, or punctuation run.
# Both Spark (Java regex) and DuckDB (RE2) interpret this identically —
# no lookahead, no unicode classes.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token accounting, the unit LLM data budgets are
    priced in: whitespace token count, BPE-ish subword-ish token count
    (regex pre-tokenization — the deterministic upper stage of a real
    BPE tokenizer), and chars-per-token ratio (a compression/quality
    signal: prose ≈4-5, code/noise drifts far off). Pure codegen
    expressions — no UDF, no shuffle; scales as a map-only pass."""
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
    ws = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    n_bpe = F.size(bpe)
    return df.select(
        F.col(id_col),
        F.size(ws).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(F.length(F.col(text_col)) / n_bpe, 6).alias("chars_per_token"),
    )
