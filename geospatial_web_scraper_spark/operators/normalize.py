"""Unicode text normalization for the webtext pipeline: NFC + control
strip + whitespace canonicalization.

Real crawled text arrives in mixed normalization forms (combining marks
vs precomposed, compatibility singletons like U+212B, Hangul jamo,
exotic spaces, stray control bytes). Every downstream content hash —
exact dedup md5, MinHash shingles, winnow fingerprints — treats
``cafe\\u0301`` and ``café`` as different documents unless the corpus is
normalized FIRST, so this pass belongs ahead of the dedup family at
100 TB (one Arrow-batched map, no shuffle, no state).

Engine split, chosen per step:

- **NFC** has no native Catalyst expression, so it is the one justified
  Arrow ``pandas_udf`` (``unicodedata.normalize`` — CPython and DuckDB's
  ``nfc_normalize`` (utf8proc) both implement UAX #15 canonical
  composition; parity over combining marks, singletons, jamo and
  stacked diacritics is pinned by tests and the oracle).
- **Control strip + space canonicalization** are NATIVE
  ``regexp_replace`` (JVM codegen, no Python): patterns are built from
  explicit codepoints in the Java∩RE2 portable subset (the pii.py
  discipline) and shared verbatim with the DuckDB oracle — note DuckDB
  ``regexp_replace`` needs the explicit ``'g'`` flag where Spark's is
  global by default.

The synthetic documents corpus is pure ASCII, so the catalog query
decorates each row with a deterministic probe suffix (``doc_id % n``
into PROBES) covering the interesting normalization classes — both
engines build the identical decorated input (the probe literals are
rendered as chr() concatenations in SQL, bypassing every string-escape
dialect difference).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: deterministic decoration probes — one per normalization class:
#: NFC fixed point, combining acute (composes), stacked ring+acute
#: (composes), angstrom-sign singleton (→ Å), Hangul jamo (→ syllable),
#: exotic spaces (NFC-stable, canonicalized by the cleaner), a control
#: byte (stripped), and the empty suffix (fully unchanged row).
PROBES: list[str] = [
    "café",
    "café",
    "Ǻngstrom",
    "Å sign",
    "각 jamo",
    "  　spaced",
    "bell\x07\x1fctl",
    "",
]

#: C0/C1-ish control characters to delete (keep \t \n \r for the
#: whitespace collapse). Same escape syntax in Java regex and RE2.
CONTROL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"

#: Unicode space separators canonicalized to ASCII space BEFORE the
#: collapse (neither engine's \\s covers these). ASCII-escaped \\x{...}
#: codepoint syntax — accepted by BOTH Java regex and RE2, so the very
#: same pattern string is embedded in the DuckDB oracle.
EXOTIC_SPACE_CODEPOINTS: list[int] = [
    0x00A0, 0x1680, *range(0x2000, 0x200B),
    0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
]
SPACE_CLASS = (
    "[" + "".join("\\x{%04x}" % cp for cp in EXOTIC_SPACE_CODEPOINTS) + "]"
)

#: ASCII whitespace run (explicit — Java \\s and RE2 \\s differ on \\x0b)
WS_RUN = r"[ \t\n\r]+"


def _nfc_kernel(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: None if x is None else unicodedata.normalize("NFC", x)
    )


def nfc_expr(col: Column) -> Column:
    """NFC-normalize a string column (NULL-preserving). Arrow-batched
    ``pandas_udf`` — the one step with no native expression; see module
    doc for the cross-engine parity argument."""
    return F.pandas_udf(_nfc_kernel, T.StringType())(col)


def clean_expr(col: Column) -> Column:
    """The native post-NFC cleanup: delete control bytes, map exotic
    Unicode spaces to ASCII space, collapse whitespace runs, trim.
    Pure JVM regexp_replace chain — stays inside codegen."""
    c = F.regexp_replace(col, CONTROL_CLASS, "")
    c = F.regexp_replace(c, SPACE_CLASS, " ")
    c = F.regexp_replace(c, WS_RUN, " ")
    return F.trim(c)


def normalize_text_expr(col: Column) -> Column:
    """NFC then cleanup — the full canonicalization a content-hash
    pipeline applies before any dedup signature."""
    return clean_expr(nfc_expr(col))


def probe_suffix_expr(id_col: Column) -> Column:
    """Deterministic decoration: ``' ' + PROBES[id % len(PROBES)]``
    (test/bench harness — real corpora are already messy)."""
    arr = F.array(*[F.lit(p) for p in PROBES])
    return F.concat(
        F.lit(" "), F.element_at(arr, (id_col % len(PROBES) + 1).cast("int"))
    )


def _sql_chr_literal(s: str) -> str:
    """Render a Python string as a dialect-proof SQL expression built
    entirely from chr() calls (empty string → '')."""
    if not s:
        return "''"
    return " || ".join(f"chr({ord(ch)})" for ch in s)


def probes_sql_list() -> str:
    """The PROBES table as a DuckDB list literal of chr() concats —
    byte-identical to the Spark-side literals with zero escaping risk."""
    return "[" + ", ".join(_sql_chr_literal(p) for p in PROBES) + "]"
