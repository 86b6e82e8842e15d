"""Text-analysis column functions for the training-data pipeline surface
(engine-scope addition — the reference has no text ops; SURVEY.md §2.10).

Everything is a pure Column expression over built-in functions (split,
transform, aggregate, regexp) — JVM-side, no Python UDFs — and every
hash is ``md5``-based so the DuckDB oracle can reproduce results
bit-for-bit (Spark's xxhash64/hash have no DuckDB twin).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the language-ID heuristic. Real
# deployments swap in a proper table; the mechanism (broadcast join +
# argmax over per-language hit ratios) is what matters at scale.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "for", "on", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "ist", "auf", "ein"),
    "fr": ("le", "la", "de", "et", "un", "que", "est", "pour", "dans", "avec"),
    "pt": ("o", "a", "de", "que", "e", "em", "um", "para", "com", "por"),
}

_WORD_RE = "[A-Za-z0-9]+"


def tokens(col: str | Column) -> Column:
    """Lower-cased whitespace tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "\\s+"), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """Sub-word-ish token count: alphanumeric runs + each remaining
    non-space symbol counts as one token (a cheap BPE proxy)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.regexp_count(c, F.lit(_WORD_RE))
    symbols = F.regexp_count(c, F.lit("[^A-Za-z0-9\\s]"))
    return words + symbols


def char_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit("[^A-Za-z0-9\\s]")) / F.greatest(
        F.length(c), F.lit(1)
    )


def mean_token_len(col: str | Column) -> Column:
    t = tokens(col)
    total = F.aggregate(
        t, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)
    )
    return total / F.greatest(F.size(t), F.lit(1))


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    t = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return hits / F.greatest(F.size(t), F.lit(1))


def quality_score(col: str | Column) -> Column:
    """Heuristic document quality in [0, 1]: rewards moderate length,
    penalizes punctuation soup and degenerate token lengths. The exact
    recipe is arbitrary; determinism and SQL-expressibility are the
    contract (oracle mirrors it term by term)."""
    length_term = F.least(char_count(col) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(4.0), F.lit(1.0))
    tok_len = mean_token_len(col)
    tok_term = F.when((tok_len >= 3) & (tok_len <= 10), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return (length_term + punct_term + tok_term) / F.lit(3.0)


def lang_scores(col: str | Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit ratios (the language-ID signal)."""
    return [(lang, stopword_ratio(col, lang)) for lang in STOPWORDS]


def lang_id(col: str | Column) -> Column:
    """Argmax language by stopword ratio; deterministic tiebreak by
    language code order; 'und' (undetermined) when no stopword hits."""
    scores = lang_scores(col)
    best = F.greatest(*[s for _, s in scores])
    out: Column = F.lit("und")
    # Build right-to-left so earlier languages win ties.
    for lang, score in reversed(scores):
        out = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(col: str | Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    token multiset — robust to token reordering, cheap, and exactly
    reproducible in SQL (oracle: md5 of the same canonical string)."""
    canonical = F.array_join(F.array_sort(tokens(col)), " ")
    return F.md5(canonical)
