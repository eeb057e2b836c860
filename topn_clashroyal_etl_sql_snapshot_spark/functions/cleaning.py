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
# International-ish phone numbers: optional +CC, then 7+ digits in
# groups separated by spaces/dots/dashes/parens. Deliberately requires
# a separator or '+' prefix so plain integers (years, ids) survive.
PHONE_PATTERN = (
    r"(?:\+[0-9]{1,3}[ .-]?)?(?:\([0-9]{2,4}\)[ .-]?)?"
    r"[0-9]{2,4}[ .-][0-9]{2,4}[ .-][0-9]{2,6}"
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


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-row match counts for audit/reporting (e.g. 'how much PII did
    this source contribute') — same patterns, `regexp_count`."""
    return {
        "n_urls": F.regexp_count(col, F.lit(URL_PATTERN)),
        "n_emails": F.regexp_count(col, F.lit(EMAIL_PATTERN)),
        "n_ipv4": F.regexp_count(col, F.lit(IPV4_PATTERN)),
        "n_phones": F.regexp_count(col, F.lit(PHONE_PATTERN)),
    }
