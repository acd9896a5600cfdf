"""Text analysis operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything here is pure Catalyst expressions (JVM-side, codegen'd) so
the operators cost one projection — no Python workers — and each has a
direct ANSI-SQL analog for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
}


def word_count(text_col: str = "text") -> F.Column:
    """Whitespace token count (empty string -> 0)."""
    return F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )


def bpe_ish_token_count(text_col: str = "text") -> F.Column:
    """BPE-ish token estimate: count of word-piece matches (letter runs,
    digit runs, single punctuation) — a regex proxy for subword
    tokenizers."""
    return F.size(
        F.expr(rf"regexp_extract_all({text_col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")
    )


def punct_ratio(text_col: str = "text") -> F.Column:
    stripped = F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(F.col(text_col)), F.lit(1))


def upper_ratio(text_col: str = "text") -> F.Column:
    kept = F.regexp_replace(F.col(text_col), r"[^A-Z]", "")
    return F.length(kept) / F.greatest(F.length(F.col(text_col)), F.lit(1))


def mean_word_len(text_col: str = "text") -> F.Column:
    no_space = F.regexp_replace(F.col(text_col), r"\s", "")
    return F.length(no_space) / F.greatest(word_count(text_col), F.lit(1))


def stopword_ratio(text_col: str = "text", lang: str = "en") -> F.Column:
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hits = F.size(F.array_intersect(words, F.array(*[F.lit(s) for s in STOPWORDS[lang]])))
    return hits / F.greatest(F.size(words), F.lit(1))


def quality_score(text_col: str = "text") -> F.Column:
    """Composite [0,1] quality heuristic: length sweet spot, low punct
    noise, sane word lengths."""
    length_ok = F.least(F.length(F.col(text_col)) / F.lit(200.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(text_col) * 4, F.lit(0.0))
    wl = mean_word_len(text_col)
    wl_ok = F.when((wl >= 3) & (wl <= 9), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_ok * 0.4 + punct_pen * 0.4 + wl_ok * 0.2).alias("quality")


def lang_guess(text_col: str = "text") -> F.Column:
    """Stopword-voting language ID across the four lists (greatest hit
    count wins; ties resolve in en/de/fr/es order)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    scores = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(s) for s in sw])))
        for lang, sw in STOPWORDS.items()
    }
    expr = F.lit("unknown")
    for lang in reversed(list(STOPWORDS)):
        s = scores[lang]
        expr = F.when(s >= F.greatest(*[scores[o] for o in STOPWORDS if o != lang], F.lit(1)), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text_col: str = "text") -> F.Column:
    """64-bit document fingerprint of the normalized text (lowercased,
    whitespace collapsed) — xxhash64, stable JVM-side."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return F.xxhash64(F.trim(norm))


def fingerprint_md5(text_col: str = "text") -> F.Column:
    """Portable 64-bit fingerprint of the normalized text: the first 16
    hex digits of md5 — identical in any engine with md5(), which makes
    it the oracle-checkable variant (xxhash64 above is the faster
    JVM-native one)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return F.substring(F.md5(norm), 1, 16)


def _trunc6(col: F.Column) -> F.Column:
    # floor-truncation, not round: engines' round-half semantics can
    # disagree on identical doubles at exact grid boundaries
    return F.floor(col * 1000000) / 1000000


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        word_count(text_col).alias("n_words"),
        bpe_ish_token_count(text_col).alias("n_tokens_bpe"),
        _trunc6(punct_ratio(text_col)).alias("punct_ratio"),
        _trunc6(mean_word_len(text_col)).alias("mean_word_len"),
        _trunc6(stopword_ratio(text_col)).alias("stopword_ratio_en"),
        fingerprint(text_col).alias("fingerprint"),
    )
