"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure Spark SQL expressions (codegen) — the text analogue of the
reference's textmining surface (Vocabulary.hpp:31-46 min-df/max-size
vocabulary + per-column WordIndex), extended with the metrics a corpus
pipeline needs. No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "token_count",
    "word_tokens",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "vocabulary",
    "text_stats",
]

# Tiny per-language stopword marker sets for the n-gram/stopword
# language heuristic (public common-word lists).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "que", "con", "por"],
}


# Tokenizer split classes. The default is pinned to ASCII because the
# driver's DuckDB oracle SQL splits on [^a-z0-9']+ — a Unicode class on
# one side only would silently diverge on any non-ASCII letter (round-1
# ADVICE). Pass charset="unicode" for multilingual corpora (and use the
# matching class in any oracle).
_TOKEN_SPLIT = {"ascii": r"[^a-z0-9']+", "unicode": r"[^\p{L}\p{N}']+"}


def word_tokens(text: Column, charset: str = "ascii") -> Column:
    """Whitespace+punctuation tokenizer (array<string>, lower-cased)."""
    return F.filter(F.split(F.lower(text), _TOKEN_SPLIT[charset]), lambda w: w != "")


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token counting: 'whitespace' = word split; 'bpe_ish' = a regex
    approximating BPE segmentation (contiguous letters / digits /
    punctuation runs, like GPT-2's pre-tokenizer)."""
    if mode == "whitespace":
        return F.size(word_tokens(text))
    if mode == "bpe_ish":
        pieces = F.filter(
            F.split(text, r"(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"),
            lambda p: (p != "") & (p != " "),
        )
        return F.size(pieces)
    raise ValueError(mode)


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: blend of length, punctuation ratio,
    stopword ratio, mean word length sanity (C4/Gopher-style rules)."""
    words = word_tokens(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    stop = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), stop))
    mean_wlen = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(0.0)
    len_ok = F.when((n_words >= 5) & (n_words <= 100000), 1.0).otherwise(0.0)
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(n_stop >= 2, 1.0).otherwise(F.when(n_stop >= 1, 0.5).otherwise(0.0))
    return (len_ok + wlen_ok + punct_ok + stop_ok) / F.lit(4.0)


def language_id(text: Column) -> Column:
    """Stopword-overlap language heuristic: argmax over marker-set hits;
    'und' (undetermined) when nothing matches. One pass, pure arrays."""
    words = F.array_distinct(word_tokens(text))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        m = F.array(*[F.lit(w) for w in markers])
        scores.append(
            F.struct(
                F.size(F.array_intersect(words, m)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.greatest(*scores)  # struct compare: hits first, lang tiebreak
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column, normalize: bool = True) -> Column:
    """64-bit rolling/content fingerprint of normalized text — the
    cheap exact-dup key (xxhash64 over whitespace-normalized, lowered
    content)."""
    t = text
    if normalize:
        t = F.lower(F.trim(F.regexp_replace(t, r"\s+", " ")))
    return F.xxhash64(t)


def vocabulary(
    df: DataFrame, text_col: str, min_df: int = 2, max_size: int = 100000
) -> DataFrame:
    """Corpus vocabulary with document-frequency floor and size cap —
    the reference's textmining::Vocabulary (min document frequency +
    max size, Vocabulary.hpp:31-46). explode → two hash aggs; ordered
    by (df desc, word asc) for determinism."""
    words = df.select(
        F.explode(F.array_distinct(word_tokens(F.col(text_col)))).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .where(F.col("doc_freq") >= min_df)
        .orderBy(F.desc("doc_freq"), F.asc("word"))
        .limit(max_size)
    )


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-pass per-document stat battery (no shuffle at all — pure map)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_words"),
        F.length(t).alias("n_chars"),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
    )
