"""Text-analysis expression builders: tokenization, language ID, quality
scoring, token counting, document fingerprinting.

All pure Column expressions (codegen'd, UDF-free) so every one of them is
oracle-checkable against an identical SQL formula.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from syslog_kafka_spark.functions.hashes import hash64, hash64_sql

# Minimal per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately tiny and frozen: the gated oracle
# reproduces the same lists, so they must never drift casually.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lower-cased text (empty strings removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: words + digits + punctuation runs, the
    regex family BPE vocabularies approximate. Deterministic proxy for
    tokenizer cost estimation at corpus scale."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"([A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s])"), 1)
    return F.size(pieces)


def stopword_hits(col: Column | str, lang: str) -> Column:
    """How many of ``lang``'s marker words appear as tokens."""
    toks = tokens(col)
    hits = [F.when(F.array_contains(toks, w), 1).otherwise(0) for w in LANG_MARKERS[lang]]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def lang_id(col: Column | str) -> Column:
    """Argmax language over marker-word hit counts ('und' when all zero).

    Ties break by language code order (deterministic, matches the oracle's
    greatest-by-(count, reverse-code) formulation).
    """
    scores = [(lang, stopword_hits(col, lang)) for lang in sorted(LANG_MARKERS)]
    best = None
    best_score = None
    for lang, score in scores:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            # strictly-greater keeps the earlier (alphabetically first) lang on ties
            take = score > best_score
            best = F.when(take, F.lit(lang)).otherwise(best)
            best_score = F.when(take, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Deterministic quality heuristics used for corpus filtering."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = tokens(c)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digits = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    mean_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
        "digit_ratio": F.round(n_digits.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
        "mean_token_len": F.round(mean_tok, 4),
        "uniq_token_ratio": F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.greatest(n_tokens, F.lit(1)), 4
        ),
    }


def fingerprint(col: Column | str, prefix_len: int = 64) -> Column:
    """Document fingerprint: hash64 of (normalized prefix, length bucket).

    Rolling-hash-style content signature cheap enough to compute per
    document at corpus scale; collisions indicate near-identical heads.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return hash64(
        F.concat(
            F.substring(norm, 1, prefix_len),
            F.lit("|"),
            (F.length(norm) / F.lit(16)).cast("bigint").cast("string"),
        )
    )


def fingerprint_sql(expr: str, prefix_len: int = 64) -> str:
    """DuckDB twin of :func:`fingerprint`."""
    norm = f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"
    key = (
        f"substr({norm}, 1, {prefix_len}) || '|' || "
        f"CAST(CAST(floor(length({norm}) / 16) AS BIGINT) AS VARCHAR)"
    )
    return hash64_sql(key)
