"""F2/P7/P8 — formula detection as native column arithmetic.

Reference ``extractors/formula.py:17-169``. Symbol counts use the
length-minus-translate trick (JVM-side, no UDF); regex features use
``rlike`` (Java dialect — patterns adjusted where Python's unicode ``\\w``
differs, see MATH_FRACTION_JAVA); the weighted score is built with the
exact addition order of the reference so doubles match bit-for-bit.

Score recipe (formula.py:80-123):
  score = sym_count·0.4 + char_count·0.1 + 0.6·[strong indicator]
        + 0.4·[math regex] + 0.3·[has ^ or _] + 0.2·[fraction \\w+/\\w+]
        + 0.2·[font_size < 10] + 0.4·[len < 50 ∧ density > 0.2]
  density = (sym_count + char_count) / len
  threshold 0.8 strict / 0.7 normal; strict zeroes the score when no strong
  indicator and density < 0.3; confidence = min(score, 1.0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# formula.py:35-36 — exact alphabets
MATH_SYMBOLS = "∫∑∏√±×÷≈≠≤≥∞∂∇αβγδεζηθλμπρσφψωΔΣΠΩ"
MATH_CHARS = "+-*/=()[]{}^_∈∉⊂⊃∪∩|<>;:!%"
# formula.py:39 — all strong indicators are single chars → one alphabet
STRONG_CHARS = "=∫∑∏√∂∇≈≠≤≥∞∈∉"

# The two alphabets are DISJOINT, so count-in-union == sym_count +
# char_count — one translate scan decides the zero-count fast path
# (see formula_score_cols' gating proof) instead of two.
ALL_MATH_CHARS = MATH_SYMBOLS + MATH_CHARS

# formula.py:43-50 — positive patterns (`{` escaped for the Java parser,
# semantics unchanged). All are evaluated under `(?U)`
# (UNICODE_CHARACTER_CLASS) so Java's \s/\d/\w behave like Python's re
# (NBSP is \s, Greek letters are \w, etc.).
MATH_PATTERNS_JAVA = [
    r"[a-zA-Z]\s*\([a-zA-Z0-9,\s]+\)\s*=",
    r"\\[a-zA-Z]+",
    r"_\s*\{[^}]+\}",
    r"\^\s*\{[^}]+\}",
    r"[a-zA-Z]_[a-zA-Z0-9]",
    r"[0-9]+\s*[\+\-\*\/]\s*[0-9]+",
]
# formula.py:105 uses Python \w (unicode)
MATH_FRACTION_JAVA = r"(?U)\w+/\w+"

# formula.py:54-62 — negative patterns (both Python and Java `$` match
# before a final line terminator)
NON_MATH_PATTERNS_JAVA = [
    r"Fig\.\s*\d+",
    r"Table\s*\d+",
    r"\d{4}-\d{2}-\d{2}",
    r"Page\s*\d+",
    r"https?://",
    r"www\.",
    r"^[A-Z][a-z]+ \d+$",
]


# single-pass alternations (one regex scan instead of 6-7 per block; the
# per-branch semantics of "any(re.search(p) for p in ...)" are identical);
# (?U) applies to the whole alternation
MATH_PATTERNS_COMBINED = "(?U)" + "|".join(f"(?:{p})" for p in MATH_PATTERNS_JAVA)
NON_MATH_PATTERNS_COMBINED = "(?U)" + "|".join(
    f"(?:{p})" for p in NON_MATH_PATTERNS_JAVA
)


def _count_in_alphabet(col: Column, alphabet: str) -> Column:
    """Chars of col drawn from alphabet, via length − translate-delete."""
    return F.length(col) - F.length(F.translate(col, alphabet, ""))


# The EXACT char set Python str.strip() strips: every code point whose
# str.isspace() is True — the Unicode White_Space property plus
# \x1c-\x1f (FS/GS/RS/US). Enumerated over the full Unicode range (29
# chars, pinned by test_stripped_chars_is_python_isspace).
_STRIP_CHARS = "".join(
    chr(c)
    for c in (
        0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
        0x85, 0xA0, 0x1680,
        0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
        0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
    )
)


def stripped_text(text: Column) -> Column:
    """block.text.strip() (formula.py:67) — btrim over the exact
    str.isspace() char set. r6: this replaces a (?U)-regex
    regexp_replace that dominated the formula stage: a huge Filter
    condition inlines every textual occurrence of its subexpressions
    (FilterExec generates predicate code without common-subexpression
    elimination), so the strip ran ~15× per candidate block; as a plain
    charset trim it is cheap enough not to matter. Output byte-identical
    (A/B'd exceptAll on the full 6M-turn staging: 0 both ways; goldens
    green)."""
    return F.btrim(text, F.lit(_STRIP_CHARS))


def is_formula_candidate(t: Column) -> Column:
    """P8 min-length (formula.py:69-70) + P7 negative regexes (:73)."""
    return (F.length(t) >= 2) & ~t.rlike(NON_MATH_PATTERNS_COMBINED)


def formula_score_cols(t: Column, font_size: Column, strict_mode: bool = False):
    """Returns (score, confidence, passes_threshold) columns for stripped
    text t. Addition order mirrors formula.py:77-114 exactly.

    Fast path: when sym_count + char_count == 0 the score is forced to 0.
    PROOF this never changes which blocks pass: with zero counts, every
    strong indicator is absent (all 14 strong chars are members of the two
    alphabets), patterns p1/p3/p4/p5/p6 and the fraction each require a
    counted char ((), =, _, ^, {}, +-*/), '^'/'_' are counted chars, and
    density = 0 kills the short-block bonus — so the max attainable score
    is 0.4 (p2, a backslash command) + 0.2 (small font) = 0.6 < 0.7 ≤
    threshold. Gating skips three regex scans for every prose block (the
    vast majority at corpus scale); emitted confidences are unaffected
    because gated blocks never pass."""
    length = F.length(t)
    sym = _count_in_alphabet(t, MATH_SYMBOLS)
    chr_ = _count_in_alphabet(t, MATH_CHARS)
    density = (sym + chr_) / length  # int/int → double in Spark SQL

    has_strong = _count_in_alphabet(t, STRONG_CHARS) > 0

    any_pattern = t.rlike(MATH_PATTERNS_COMBINED)

    fs_ok = font_size.isNotNull() & (font_size != 0.0)

    full_score = (
        sym.cast("double") * 0.4
        + chr_.cast("double") * 0.1
        + F.when(has_strong, 0.6).otherwise(0.0)
        + F.when(any_pattern, 0.4).otherwise(0.0)
        + F.when(t.contains("^") | t.contains("_"), 0.3).otherwise(0.0)
        + F.when(t.rlike(MATH_FRACTION_JAVA), 0.2).otherwise(0.0)
        + F.when(fs_ok & (font_size < 10), 0.2).otherwise(0.0)
        + F.when((length < 50) & (density > 0.2), 0.4).otherwise(0.0)
    )

    threshold = 0.8 if strict_mode else 0.7
    if strict_mode:
        # formula.py:119-123 — zero out without strong evidence
        full_score = F.when(~has_strong & (density < 0.3), F.lit(0.0)).otherwise(full_score)

    # CASE WHEN evaluates branches lazily (codegen and interpreted alike):
    # prose blocks never reach the regex branch
    score = F.when(sym + chr_ == 0, F.lit(0.0)).otherwise(full_score)

    passes = score >= F.lit(threshold)
    confidence = F.least(score, F.lit(1.0))
    return score, confidence, passes
