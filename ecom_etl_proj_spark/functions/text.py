"""Text expression builders — all JVM-side (no Python UDFs).

Every helper returns a Column built from pyspark.sql.functions, so the
whole text pipeline stays inside WholeStageCodegen. The DuckDB oracle SQL
mirrors each expression with DuckDB list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword lists for the n-gram/stopword language
# heuristic. Public common-word lists.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "la", "los", "y", "es", "una"),
}


def tokens(col: str = "text") -> Column:
    """Whitespace tokens of the lowercased text.

    NULL text coalesces to '' BEFORE splitting: without the guard,
    ``F.size(split(NULL))`` yields -1, which silently poisons every
    downstream token-count sum (n_tokens, OOV rates, quality ratios)
    the moment a NULL document appears. With it, a NULL doc behaves
    like an empty one ([''] — one empty token, same as genuinely empty
    text), keeping engine behavior total and monotone. The driver
    corpus never contains NULL text, so oracle parity is unaffected;
    a DuckDB mirror that must match NULL-bearing data should apply the
    same ``coalesce(text, '')``.
    """
    return F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), " ")


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: str = "text") -> Column:
    return F.size(F.array_distinct(tokens(col)))


def stopword_ratio(lang: str, col: str = "text") -> Column:
    """Fraction of tokens that are stopwords of the given language."""
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    toks = f"split(lower(trim({col})), ' ')"
    return F.expr(
        f"size(filter({toks}, x -> x IN ({words}))) / cast(size({toks}) as double)"
    )


def punct_ratio(col: str = "text") -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowercasing."""
    low = F.lower(F.col(col))
    clean = F.regexp_replace(low, "[^a-z0-9 ]", "")
    return (F.length(low) - F.length(clean)) / F.length(low).cast("double")


def word_shingles(n: int, col: str = "text") -> Column:
    """Distinct n-word shingles (the MinHash/Jaccard unit)."""
    toks = f"split(lower(trim({col})), ' ')"
    # Guard: sequence(1, 0) in Spark yields a DESCENDING [1, 0], so short
    # texts must short-circuit to an empty array explicitly.
    return F.expr(
        f"CASE WHEN size({toks}) < {n} THEN array()"
        f" ELSE array_distinct(transform(sequence(1, size({toks}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({toks}, i, {n})))) END"
    )


def fingerprint(col: str = "text") -> Column:
    """Deterministic content fingerprint: md5 of the canonical form."""
    return F.md5(F.lower(F.trim(F.col(col))))
