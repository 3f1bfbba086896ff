"""PII detection and redaction for training-corpus curation.

Emails, NANP-style phone numbers, and IPv4 literals are the three
patterns every public-corpus release scrubs (the C4/Dolma-style regex
pass). Everything here is native `regexp_replace` / `regexp_extract_all`
— JVM-side, whole-stage codegen, no Python, no shuffle.

The pattern strings are the single source of truth: the catalog query's
DuckDB oracle interpolates these exact literals, and they deliberately use
only the regex subset where Java's engine and RE2 agree (character
classes, bounded repetition, ``\\b``, ``\\d`` — no backreferences, no
lookaround), so redaction output is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# replacement tokens contain no digits or '@', so later passes can never
# re-match inside an earlier pass's output
_PASSES = (
    (EMAIL_PATTERN, "<EMAIL>"),
    (PHONE_PATTERN, "<PHONE>"),
    (IPV4_PATTERN, "<IP>"),
)


def pii_counts_exprs(text: Column) -> dict[str, Column]:
    """Per-document match counts on the ORIGINAL text (audit before
    redaction): {'n_emails', 'n_phones', 'n_ips'}."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_PATTERN), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_PATTERN), 0)),
    }


def scrub_pii_expr(text: Column) -> Column:
    """Redact emails → phones → IPv4s, in that order (emails first so an
    address's host part is never half-eaten by the IP pass)."""
    out = text
    for pattern, token in _PASSES:
        out = F.regexp_replace(out, pattern, token)
    return out
