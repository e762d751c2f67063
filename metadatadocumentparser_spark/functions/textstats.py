"""Text-analysis kernels for training-data pipelines — all native columns.

Language-ID (marker/charset heuristic), quality scoring (length/punct/
stopword ratios), token counting, and document fingerprinting, expressed so
the identical arithmetic is reproducible in ANSI SQL (the DuckDB oracles in
__spark_entry__.py mirror these formulas term for term).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PUNCT = ".,;:!?()[]{}'\"-"
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is")
# marker words per language for the n-gram/marker heuristic
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "una"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish regex variant: see bpe_token_count).
    NULL text counts as empty (0) — unguarded, every term would be NULL
    and a NULL quality score silently PASSES `score < min` gates
    (r5 review)."""
    text = F.coalesce(text, F.lit(""))
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    """Rough BPE-ish subword count: alnum runs + punctuation singles.
    NULL text counts as empty (see token_count)."""
    text = F.coalesce(text, F.lit(""))
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"), 0))
    )


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.translate(text, PUNCT, ""))


def stopword_count(text: Column, stopwords=STOPWORDS_EN) -> Column:
    # operates on the PASSED column (an earlier F.expr form hardcoded the
    # literal name 'text' and silently counted the wrong column)
    sw = list(stopwords)
    return F.size(F.filter(F.split(text, " "), lambda x: x.isin(*sw)))


def _word_count(words: Column, marker: str) -> Column:
    # factory, not a default-arg lambda (PySpark infers HOF arity from the
    # python lambda's parameter count)
    return F.size(F.filter(words, lambda x: x == marker))


def marker_count(text: Column, markers) -> Column:
    """Word-exact marker occurrences: count tokens equal to each marker.
    (The earlier length-minus-replace over ' word ' undercounted ADJACENT
    repeats — consecutive markers share one space, so 'der der der'
    counted 2 — skewing lang-ID's marker competition. list_filter /
    filter-equality is exactly reproducible in DuckDB and overlap-free.)"""
    words = F.split(text, " ")
    total = F.lit(0)
    for m in markers:
        total = total + _word_count(words, m)
    return total.cast("bigint")


def non_ascii_ratio(text: Column) -> Column:
    ascii_only = F.regexp_replace(text, r"[^\x00-\x7F]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        (F.length(text) - F.length(ascii_only)) / F.length(text)
    )


def lang_id(text: Column) -> Column:
    """Marker-word + charset heuristic → {zh,de,fr,es,en}. Deterministic,
    SQL-mirrorable; not a real classifier. NULL text -> 'en' (the
    empty-text default), never NULL."""
    text = F.coalesce(text, F.lit(""))
    de = marker_count(text, LANG_MARKERS["de"])
    fr = marker_count(text, LANG_MARKERS["fr"])
    es = marker_count(text, LANG_MARKERS["es"])
    return (
        F.when(non_ascii_ratio(text) > 0.3, F.lit("zh"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("en"))
    )


def quality_score(text: Column) -> Column:
    """0..1 quality: length term + low-punct term + stopword term (raw
    double; callers scale with half_up_e4 for cross-engine hashing).
    NULL text scores as empty text, never NULL (a NULL score silently
    passes `score < min` gates)."""
    text = F.coalesce(text, F.lit(""))
    words = token_count(text).cast("double")
    length_term = F.least(words / 200.0, F.lit(1.0)) * 0.5
    pr = punct_count(text).cast("double") / F.greatest(F.length(text), F.lit(1))
    sw = stopword_count(text).cast("double") / F.greatest(words, F.lit(1.0))
    return length_term + (1.0 - pr) * 0.2 + sw * 0.3


def half_up_scaled(col: Column, digits: int) -> Column:
    """floor(x·10^d + 0.5) as BIGINT — explicit half-up rounding that is
    bit-deterministic across engines (Spark round() is HALF_UP on BigDecimal
    while DuckDB rounds half-even for doubles; at exact .5 boundaries they
    disagree — this form cannot). Non-negative inputs only."""
    return F.floor(col * float(10 ** digits) + 0.5).cast("bigint")


def fingerprint(text: Column) -> Column:
    """Normalized-text content fingerprint (exact-dedup key)."""
    return F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))
