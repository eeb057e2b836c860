"""Text-analysis column expressions for the LLM-data-pipeline operators:
normalization, tokenization, shingling, quality metrics, language ID,
and content fingerprints.

Everything is built-in column algebra (JVM-side, codegen-friendly). The
expressions are deliberately mirrorable in ANSI/DuckDB SQL so the driver
can oracle-check them: same regex classes, same 1-based list indexing,
same integer-count → double-division arithmetic.

Design lineage: the reference's only text processing is name/tag
normalization (scripts/etl_snapshot_topn.py:32-37) and dict-keyed feature
flags (src/analysist/deck_type.py:38-82); these operators generalize that
feature-extraction pattern to document corpora (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A compact English stopword set (public-domain common words).
EN_STOPWORDS = (
    "the a an and or of to in is are was were be been on for with as at by "
    "it this that from not"
).split()

# Distinctive marker tokens per language for the n-gram/stopword heuristic
# language classifier. First match in CJK → zh; otherwise argmax of marker
# counts with deterministic preference order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "los", "las", "una", "es"),
    "fr": ("le", "les", "des", "une", "est"),
    "de": ("der", "die", "und", "nicht", "ist"),
}
LANG_ORDER = ("en", "es", "fr", "de")


def normalize_text(col: Column) -> Column:
    """Lowercase; every non-alphanumeric char becomes a space."""
    return F.lower(F.regexp_replace(col, "[^a-zA-Z0-9 ]", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text, empties removed.

    ``array_remove`` instead of a ``filter`` lambda: higher-order
    functions are interpreted (no codegen); array_remove stays compiled.
    """
    return F.array_remove(F.split(normalize_text(col), "\\s+"), "")


def py_tokens(text: str | None) -> list[str]:
    """THE driver-side Python twin of :func:`tokens` (same character
    class, lowercasing, empty-token drop). Single source of truth:
    every operator that tokenizes on the driver (DSIR term fits, BM25
    query normalization) and every test twin must use this — two
    independent mirrors of one Spark tokenizer drift, and a drift here
    silently breaks the term-keyed DuckDB oracle rows."""
    import re

    return [
        t for t in re.sub(r"[^a-zA-Z0-9 ]", " ", text or "").lower().split() if t
    ]


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern (public: openai/gpt-2 encoder.py),
# restricted to constructs with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): contraction suffixes, letter runs, digit
# runs, punctuation runs, residual whitespace. This is the "BPE-ish"
# accounting unit — the merge step itself is model-specific, but token
# COUNTS at this granularity track BPE vocab counts closely enough for
# corpus budgeting.
BPE_PRETOKEN_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?\\p{L}+"
    "| ?\\p{N}+"
    "| ?[^\\s\\p{L}\\p{N}]+"
    "|\\s+"
)


def bpe_pretokens(col: Column) -> Column:
    """BPE-style pre-tokens of the RAW text (case/punctuation kept —
    unlike :func:`tokens`, which normalizes first)."""
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))


def bpe_pretoken_count(col: Column) -> Column:
    return F.size(bpe_pretokens(col))


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) — the MinHash/Jaccard unit.

    1-based ``element_at`` indexing mirrors DuckDB list indexing so the
    oracle SQL produces the identical shingle set.
    """
    idx = F.sequence(F.lit(1), F.size(tokens_col) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens_col) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


# ---------------------------------------------------------------------------
# Quality metrics
# ---------------------------------------------------------------------------

def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ]."""
    stripped = F.length(F.regexp_replace(col, "[^a-zA-Z0-9 ]", ""))
    return (F.length(col) - stripped).cast("double") / F.nullif(
        F.length(col), F.lit(0)
    )


def avg_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total.cast("double") / F.nullif(F.size(toks), F.lit(0))


def stopword_ratio(col: Column) -> Column:
    """Fraction of tokens that are common-English stopwords."""
    toks = tokens(col)
    sw = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return sw.cast("double") / F.nullif(F.size(toks), F.lit(0))


def quality_score(col: Column) -> Column:
    """Heuristic [0,1] quality score: rewards reasonable length and word
    shape, penalizes punctuation noise. Deterministic double arithmetic —
    mirrorable in SQL term-for-term."""
    n_tok = token_count(col).cast("double")
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    shape_term = F.when(
        (avg_token_len(col) >= 2.0) & (avg_token_len(col) <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    noise_term = F.lit(1.0) - F.least(
        F.coalesce(punct_ratio(col), F.lit(0.0)) * 2.0, F.lit(1.0)
    )
    return F.round(
        0.4 * length_term + 0.3 * shape_term + 0.3 * noise_term, 6
    )


# ---------------------------------------------------------------------------
# Language ID (marker-token heuristic)
# ---------------------------------------------------------------------------

def lang_id(col: Column) -> Column:
    """CJK presence → zh; else argmax of per-language marker-token counts
    (ties broken by LANG_ORDER); no markers at all → 'und'."""
    toks = tokens(col)
    counts = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    expr = F.when(col.rlike("[\\u4e00-\\u9fff]"), F.lit("zh")).when(
        best <= 0, F.lit("und")
    )
    for lang in LANG_ORDER:
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# Fingerprints
# ---------------------------------------------------------------------------

def content_fingerprint(col: Column) -> Column:
    """Exact-dedup key: md5 of the normalized text (md5 so the DuckDB
    oracle can compute the identical value)."""
    return F.md5(normalize_text(col))


def fast_fingerprint(col: Column) -> Column:
    """64-bit engine-side fingerprint (xxhash64) — cheaper than md5 at
    100 TB; not oracle-mirrorable, used in internal plans only."""
    return F.xxhash64(normalize_text(col))
