"""Text-analysis operators for training-data pipelines — all JVM-side
(built-in ``pyspark.sql.functions``, whole-stage-codegen friendly; zero
Python in the hot path). Counts are integers, not ratios, so results
hash-compare exactly against SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "je", "ne", "pas", "un", "une"],
    "es": ["el", "la", "los", "que", "y", "es", "no", "un", "una", "por"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace token count (BPE-ish regex split); empty/blank → 0."""
    t = F.trim(text)
    return (
        F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), token_count_col(F.col(text_col)).alias("n_tokens"))


def quality_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality-scoring raw counts: chars / lowercase letters / digits /
    spaces / punctuation per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        F.length(F.regexp_replace(t, "[^a-z]", "")).cast("long").alias("n_lower"),
        F.length(F.regexp_replace(t, "[^0-9]", "")).cast("long").alias("n_digit"),
        F.length(F.regexp_replace(t, "[^ ]", "")).cast("long").alias("n_space"),
        F.length(F.regexp_replace(t, r"[^.,;:!?'\"-]", "")).cast("long").alias("n_punct"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the case/whitespace-normalized text."""
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint"),
    )


def langid(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-voting language heuristic (n-gram-free variant): the
    language whose stopword list intersects the token set most wins.
    Pure array expressions — no UDF."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(lang)
        for lang, words in _STOPWORDS.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = list(_STOPWORDS)
    best = F.greatest(*[F.col(lang) for lang in langs])
    pred = F.coalesce(
        *[F.when((F.col(lang) == best) & (best > 0), F.lit(lang)) for lang in langs],
        F.lit("unknown"),
    )
    return scored.select(F.col(id_col), pred.alias("lang_pred"))
