"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, fingerprinting.

All JVM-side SQL expressions (whole-stage-codegen'd) — zero Python in the
row path. Designed for the ``documents(doc_id, text, lang, source,
n_chars)`` table but column names are parameters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword seeds for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "est", "pas", "des", "une", "dans", "que"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "un", "por", "con"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty text → empty array."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text", alias: str = "n_tokens") -> DataFrame:
    return df.withColumn(alias, F.size(tokens(F.col(text_col))))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text", alias: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish regex token count: split into word pieces, digits and
    punctuation runs (a cheap stand-in for a real tokenizer's count)."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
    )
    return df.withColumn(alias, F.size(pieces))


def _stopword_hits(col: Column, words: list[str]) -> Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))


def language_id(df: DataFrame, text_col: str = "text", alias: str = "lang_pred") -> DataFrame:
    """Stopword-ratio language ID: the language whose stopword list hits
    most, ties broken alphabetically, 'und' (undetermined) when nothing
    hits. One pass, all codegen."""
    langs = sorted(STOPWORDS)  # alphabetical; index i ↔ langs[i]
    candidates = F.array(
        *[
            F.struct(
                _stopword_hits(F.col(text_col), STOPWORDS[lg]).alias("hits"),
                F.lit(-i).alias("neg_idx"),  # max picks lowest index on ties
            )
            for i, lg in enumerate(langs)
        ]
    )
    best = F.array_max(candidates)
    name = F.element_at(F.array(*[F.lit(lg) for lg in langs]), -best["neg_idx"] + 1)
    return df.withColumn(
        alias, F.when(best["hits"] > 0, name).otherwise(F.lit("und"))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality features + a composite score:
    length, mean word length, alpha ratio, punctuation ratio, stopword
    ratio, uppercase ratio. All ratios in [0,1]; score is a fixed linear
    blend (documented, deterministic)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    toks = tokens(t)
    n_tok = F.size(toks)
    en_stop = _stopword_hits(t, STOPWORDS["en"])
    safe = F.when(n_chars > 0, n_chars).otherwise(F.lit(1))
    safe_tok = F.when(n_tok > 0, n_tok).otherwise(F.lit(1))
    out = (
        df.withColumn("q_n_chars", n_chars)
        .withColumn("q_n_tokens", n_tok)
        .withColumn("q_mean_word_len", n_alpha / safe_tok)
        .withColumn("q_alpha_ratio", n_alpha / safe)
        .withColumn("q_punct_ratio", n_punct / safe)
        .withColumn("q_upper_ratio", n_upper / safe)
        .withColumn("q_stopword_ratio", en_stop / safe_tok)
    )
    score = (
        0.35 * F.least(F.col("q_n_tokens") / 200.0, F.lit(1.0))
        + 0.25 * F.col("q_alpha_ratio")
        + 0.2 * F.least(F.col("q_stopword_ratio") * 2.0, F.lit(1.0))
        + 0.1 * (1.0 - F.least(F.col("q_punct_ratio") * 5.0, F.lit(1.0)))
        + 0.1 * (1.0 - F.least(F.col("q_upper_ratio") * 3.0, F.lit(1.0)))
    )
    return out.withColumn("quality_score", score)


def fingerprint(df: DataFrame, text_col: str = "text", alias: str = "fingerprint") -> DataFrame:
    """Document fingerprint: 64-bit hash of the whitespace-normalized,
    lowercased text (the exact-dedup key; rolling/minhash variants live in
    functions/dedup.py)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(alias, F.xxhash64(norm))
