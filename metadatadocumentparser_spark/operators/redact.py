"""PII redaction — the masking pass every public-corpus training pipeline
runs before release (C4/Dolma-style email/phone/IP scrubbing).

Pure native projection (regexp_count + a regexp_replace chain): one scan,
zero shuffle, whole-stage codegen. Patterns deliberately use only regex
syntax with identical semantics in Java regex (Spark) and RE2 (DuckDB):
character classes, bounded repetition, \\d, \\b — no backrefs, no
lookaround — so the redacted output is byte-identical cross-engine and the
operator is oracle-checkable end-to-end (md5 of the redacted text).

Replacement order matters and is fixed: emails first (their local parts
contain digits a phone pattern could half-match), then phones, then IPs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RX = "\\+?\\d{1,3}[ -]\\d{3}[ -]\\d{4}"
IPV4_RX = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

_CHAIN = (
    (EMAIL_RX, "<EMAIL>"),
    (PHONE_RX, "<PHONE>"),
    (IPV4_RX, "<IP>"),
)


def redacted_text(text_col: Column) -> Column:
    """The masked text (fixed email → phone → IP replacement order)."""
    out = text_col
    for rx, token in _CHAIN:
        out = F.regexp_replace(out, rx, token)
    return out


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_emails, n_phones, n_ips, redacted): per-doc PII hit counts
    plus the masked text. Each count is taken on the text AS THE MASKING
    CHAIN SEES IT (phones counted after emails are masked, IPs after
    both): counting everything on the original text would claim matches
    the mask never removed — e.g. a phone-shaped substring inside an
    email's local part is consumed by the <EMAIL> mask, so it must not
    count as a phone. Counts therefore equal the number of tokens the
    mask actually inserted. The chain is driven by _CHAIN — the single
    encoding of pattern order (r5 review: a hand-unrolled copy here
    could drift from redacted_text's)."""
    count_names = ("n_emails", "n_phones", "n_ips")
    staged, cols = F.col(text_col), []
    for (rx, token), name in zip(_CHAIN, count_names):
        cols.append(F.regexp_count(staged, F.lit(rx)).cast("bigint").alias(name))
        staged = F.regexp_replace(staged, rx, token)
    return df.select(
        F.col(id_col).alias("id"), *cols, staged.alias("redacted")
    )
