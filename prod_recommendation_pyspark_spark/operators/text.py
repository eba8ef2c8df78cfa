"""Text-analysis operators (LLM-data-pipeline extensions; SURVEY §7
Phase F).  Everything is native Catalyst string/regex/higher-order
expressions — no Python in the hot path, so these run at full scan
speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword sets for the n-gram/stopword-voting
# heuristic.  Deliberately tiny: language ID here is a deterministic,
# cheap pre-filter, not a classifier.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los", "un"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour"],
}

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
# — the classic GPT-2-style pre-split shape, kept regex-portable.
BPE_TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count.  Empty/whitespace-only text is 0 tokens
    (``split('')`` yields ``['']`` — size 1 — so guard explicitly)."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col)))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (lowercased)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_TOKEN_PATTERN), 0))


def stopword_hits(col: Column, words: list[str]) -> Column:
    """How many whitespace tokens are in ``words``."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(F.lower(col)), lambda t: F.array_contains(arr, t)))


def language_id(col: Column, fallback: str = "und") -> Column:
    """Stopword-voting language ID: argmax of per-language stopword
    hits, ``fallback`` when no stopwords at all.  Ties break by
    language-code order (deterministic)."""
    scores = [(lang, stopword_hits(col, ws)) for lang, ws in sorted(STOPWORDS.items())]
    best_lang = F.lit(fallback)
    best_score = F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def punct_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, "[^.!?,;:]", ""))


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    return F.length(F.regexp_replace(col, "[^A-Za-z]", "")) / F.greatest(
        F.length(col), F.lit(1)
    )


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0,1]: rewards
    mid-length documents, high alpha ratio, and some punctuation;
    penalizes extreme token lengths.  The exact blend is a policy
    knob — the operator contract is determinism + boundedness."""
    n_tok = token_count(col)
    avg_tok_len = F.length(col) / F.greatest(n_tok, F.lit(1))
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    alpha_term = alpha_ratio(col)
    tok_len_term = F.when((avg_tok_len >= 3) & (avg_tok_len <= 12), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return F.round(
        0.4 * length_term + 0.4 * alpha_term + 0.2 * tok_len_term, 6
    )


def doc_fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text
    (the exact-dedup key; also a stable shard/bucket key via its hex
    prefix)."""
    from prod_recommendation_pyspark_spark.operators.dedup import normalize_text

    return F.md5(normalize_text(col))


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-pass per-document stats projection."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.round(F.length(c) / F.greatest(token_count(c), F.lit(1)), 4).alias(
            "avg_token_len"
        ),
        punct_count(c).alias("n_punct"),
        F.round(alpha_ratio(c), 4).alias("alpha_ratio"),
        quality_score(c).alias("quality"),
        language_id(c).alias("lang_pred"),
        doc_fingerprint(c).alias("fingerprint"),
    )
