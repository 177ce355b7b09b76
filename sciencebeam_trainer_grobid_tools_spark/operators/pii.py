"""PII detection + scrubbing over a text column — pure Catalyst regexps.

Standard training-data hygiene (CCNet / RefinedWeb / Dolma ship the same
stage): detect and redact emails, IPv4 addresses and US-style phone
numbers before the corpus is used for training.  Everything compiles to
JVM ``regexp_*`` expressions inside whole-stage codegen — a 100 TB scrub
pass is IO-bound, no Python anywhere.

The patterns are deliberately conservative and RE2-COMPATIBLE (no
lookarounds, no backreferences), so the exact same strings run under
Java's regex engine here and under RE2 in the DuckDB oracle — the oracle
query plants deterministic PII derived from ``doc_id`` and verifies the
scrubbed text and per-type counts value-for-value across engines.

Redaction replaces each match with a typed placeholder token
(``<EMAIL>`` / ``<IP>`` / ``<PHONE>``) rather than deleting it: span
offsets downstream shift, but sentence shape (and token counts under the
whitespace tokenizer) stay stable.

Known false-positive classes (the price of conservative, RE2-compatible
patterns): the IPv4 regex matches any dotted digit quad, so version
strings like ``"upgrade to 1.2.3.4"`` or section numbers ``"see
10.2.3.1"`` redact to ``<IP>``; the phone pattern matches any
``ddd-ddd-dddd`` digit shape, e.g. ``"ISBN 555-123-4567"``.  Scrubbing
is deliberately biased toward recall — a leaked identifier in a
training corpus costs more than a mangled version string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+"
IPV4_PATTERN = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_PATTERN = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

# scrub order matters: emails first (their local parts may contain digit
# runs), then IPs (dotted digits), then phones
_SCRUB_STEPS = (
    (EMAIL_PATTERN, "<EMAIL>"),
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
)


def count_emails(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0))


def count_ipv4(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(IPV4_PATTERN), 0))


def count_phones(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PHONE_PATTERN), 0))


def scrub_pii(text: Column) -> Column:
    """Text with every email/IPv4/phone replaced by its placeholder."""
    out = text
    for pattern, token in _SCRUB_STEPS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-type PII counts, a ``pii_found`` flag and the scrubbed
    text.  Counts are taken BEFORE scrubbing; the flag gates a filter or
    a quarantine split without recomputing the regexps."""
    text = F.col(text_col)
    n_emails = count_emails(text)
    n_ips = count_ipv4(text)
    n_phones = count_phones(text)
    return df.select(
        "*",
        n_emails.alias("pii_emails"),
        n_ips.alias("pii_ipv4"),
        n_phones.alias("pii_phones"),
        (n_emails + n_ips + n_phones > 0).alias("pii_found"),
        scrub_pii(text).alias("scrubbed_text"),
    )
