"""Corpus cleaning: PII scrubbing as pure column algebra.

The redaction pass every training-data pipeline runs before
tokenization (emails, URLs, IPs, phone numbers → typed placeholder
tokens). All expressions are ``regexp_replace`` chains — JVM-side,
whole-stage-codegen, zero UDFs — so at 100 TB the scrub rides the scan
like any other projection: no shuffle, no Python.

Pattern scope, honestly stated: these are the standard high-precision
patterns (the same family C4/Gopher-style pipelines use), not an
NER-grade PII system — a name or street address in free text needs a
model, which would slot in as a Pandas-UDF stage like the multimodal
decoders. Patterns avoid constructs whose semantics differ between
Java regex and RE2/Python so the tests can oracle them with ``re``.

No reference analog (the reference never handles free text); this is
the training-pipeline extension surface, alongside functions/text.py's
quality metrics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: URLs first (they may contain '@' userinfo and digit
# runs that the email/phone patterns would otherwise bite into).
URL_PATTERN = r"(?:https?://|www\.)[^\s<>\"']+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# Phone numbers, three alternatives in decreasing specificity:
#   A. '+CC'-prefixed international form (any grouping, 7-13 digits)
#   B. parenthesized area code then 6-13 more digits
#   C. bare DDD[ .-]DDDD[ .-]DDDD triple with size floors (mid ≥ 3,
#      last ≥ 4 digits)
# The size floors are what keep high precision: ISO dates
# (2024-01-15: middle group 2 digits), dotted dates (2024.08.13), and
# digit-grouped amounts (10 000 000: last group 3 digits) do NOT
# match; plain integers never match (a separator is required).
PHONE_PATTERN = (
    r"\+[0-9]{1,3}[ .-]?(?:\([0-9]{2,4}\)[ .-]?)?(?:[0-9][ .-]?){6,12}[0-9]"
    r"|\([0-9]{2,4}\)[ .-]?(?:[0-9][ .-]?){5,12}[0-9]"
    r"|\b[0-9]{2,4}[ .-][0-9]{3,4}[ .-][0-9]{4,6}\b"
)


def scrub_urls(col: Column, repl: str = "<URL>") -> Column:
    return F.regexp_replace(col, URL_PATTERN, repl)


def scrub_emails(col: Column, repl: str = "<EMAIL>") -> Column:
    return F.regexp_replace(col, EMAIL_PATTERN, repl)


def scrub_ipv4(col: Column, repl: str = "<IP>") -> Column:
    return F.regexp_replace(col, IPV4_PATTERN, repl)


def scrub_phones(col: Column, repl: str = "<PHONE>") -> Column:
    return F.regexp_replace(col, PHONE_PATTERN, repl)


def scrub_pii(col: Column) -> Column:
    """The composed scrub in collision-safe order:
    URL → EMAIL → IP → PHONE (URLs may embed '@' and digit runs; IPs
    would otherwise be eaten by the phone pattern's digit groups)."""
    return scrub_phones(scrub_ipv4(scrub_emails(scrub_urls(col))))


# ---------------------------------------------------------------------------
# Unicode hygiene (the scrub BEFORE the scrub: crawled text arrives
# with control bytes, zero-width characters, exotic spaces, and
# decode-failure replacement characters)
# ---------------------------------------------------------------------------

# C0 (minus \t\n\r) + DEL + C1 + zero-width (ZWSP/ZWNJ/ZWJ) + BOM.
CONTROL_CHARS_PATTERN = (
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f"
    "\u200b-\u200d\ufeff]"
)
# Every Unicode space separator that is not a plain ASCII space:
# NBSP, Ogham, en-quad..hair space, line/para sep, narrow NBSP,
# math space, CJK ideographic space.
UNICODE_SPACES_PATTERN = (
    "[\u00a0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]"
)


def strip_control_chars(col: Column) -> Column:
    """Remove control and zero-width characters (keeping ``\\t \\n \\r``
    — they are document structure). Codegen ``regexp_replace``."""
    return F.regexp_replace(col, CONTROL_CHARS_PATTERN, "")


def normalize_spaces(col: Column) -> Column:
    """Map every non-ASCII Unicode space separator (NBSP, en/em/thin
    spaces, ideographic space, …) to a plain space — token boundaries
    become uniform for everything downstream (tokenize, shingles,
    BPE). Does NOT collapse runs; that is a formatting decision left
    to the caller."""
    return F.regexp_replace(col, UNICODE_SPACES_PATTERN, " ")


def replacement_char_ratio(col: Column) -> Column:
    """Fraction of characters that are U+FFFD — the decode-failure
    marker. A high ratio means the upstream bytes→text decode was
    wrong (mojibake); pipelines gate on it like a quality score.
    Empty text → 0.0; NULL text → NULL (a missing document is
    UNSCOREABLE, not clean — a 0.0 would sail through any
    ``ratio <= t`` gate)."""
    n = F.length(col)
    bad = F.length(col) - F.length(F.regexp_replace(col, "�", ""))
    return (
        F.when(col.isNull(), F.lit(None).cast("double"))
        .when(n > 0, bad.cast("double") / n)
        .otherwise(F.lit(0.0))
    )


def clean_text(col: Column) -> Column:
    """The composed pre-tokenization hygiene pass: control/zero-width
    strip → space normalization. Pure codegen; compose with
    :func:`scrub_pii` for the full cleaning stage."""
    return normalize_spaces(strip_control_chars(col))


def normalize_unicode_text(
    df,
    text_col: str = "text",
    form: str = "NFC",
):
    """Unicode normalization (NFC by default) as an Arrow-batched
    ``mapInPandas`` stage — Spark has no normalization builtin, and
    canonical equivalence matters for dedup (``é`` as one codepoint vs
    ``e`` + combining accent hash differently while rendering
    identically). Replaces ``text_col`` in place; NULL rows stay NULL.
    Per-row CPU, no shuffle — the same legitimate-Python shape as
    ``decompress_text``. For ASCII-dominated corpora the fast path is
    cheap (``unicodedata.is_normalized`` short-circuits)."""
    import unicodedata
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    kept = [f for f in df.schema if f.name != text_col]
    schema = T.StructType(kept + [T.StructField(text_col, T.StringType(), True)])
    kept_names = [f.name for f in kept]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[kept_names].copy()
            out[text_col] = [
                t
                if t is None or unicodedata.is_normalized(form, t)
                else unicodedata.normalize(form, t)
                for t in pdf[text_col]
            ]
            yield out

    return df.mapInPandas(run, schema)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-row match counts for audit/reporting (e.g. 'how much PII did
    this source contribute'). Counts are taken on the PROGRESSIVELY
    scrubbed text — emails counted after URLs are redacted, IPs after
    emails, phones after IPs — so each count equals the number of
    redactions :func:`scrub_pii` performs for that category (an email
    inside a URL's userinfo is one URL redaction, not also an email)."""
    after_urls = scrub_urls(col)
    after_emails = scrub_emails(after_urls)
    after_ips = scrub_ipv4(after_emails)
    return {
        "n_urls": F.regexp_count(col, F.lit(URL_PATTERN)),
        "n_emails": F.regexp_count(after_urls, F.lit(EMAIL_PATTERN)),
        "n_ipv4": F.regexp_count(after_emails, F.lit(IPV4_PATTERN)),
        "n_phones": F.regexp_count(after_ips, F.lit(PHONE_PATTERN)),
    }
