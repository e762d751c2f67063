"""F5 — text→LaTeX heuristic as a native replace/regexp chain.

Reference ``utils.py:3-69``. Replacement ORDER is part of the semantics
(e.g. Greek replacement precedes the sub/superscript regexes, so the
``\\w``-class rules only ever see ASCII after it) — the maps below are
ordered lists, applied sequentially exactly as the reference's dict loops.

Python ``\\w`` is unicode; the Java side uses ``[\\p{L}\\p{N}_]`` which
agrees on the letters/digits/underscore alphabet this pipeline emits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# utils.py:19-25 — exact order
GREEK_MAP = [
    ("α", r"\alpha"), ("β", r"\beta"), ("γ", r"\gamma"), ("δ", r"\delta"),
    ("ε", r"\epsilon"), ("ζ", r"\zeta"), ("η", r"\eta"), ("θ", r"\theta"),
    ("λ", r"\lambda"), ("μ", r"\mu"), ("π", r"\pi"), ("ρ", r"\rho"),
    ("σ", r"\sigma"), ("φ", r"\phi"), ("ψ", r"\psi"), ("ω", r"\omega"),
    ("Δ", r"\Delta"), ("Σ", r"\Sigma"), ("Π", r"\Pi"), ("Ω", r"\Omega"),
]

# utils.py:31-52 — exact order
SYMBOL_MAP = [
    ("≈", r"\approx"), ("≠", r"\neq"), ("≤", r"\leq"), ("≥", r"\geq"),
    ("∞", r"\infty"), ("∂", r"\partial"), ("∇", r"\nabla"), ("∫", r"\int"),
    ("∑", r"\sum"), ("∏", r"\prod"), ("√", r"\sqrt"), ("±", r"\pm"),
    ("×", r"\times"), ("÷", r"\div"), ("∈", r"\in"), ("∉", r"\notin"),
    ("⊂", r"\subset"), ("⊃", r"\supset"), ("∪", r"\cup"), ("∩", r"\cap"),
]


def latex_heuristic(text: Column) -> Column:
    x = text
    for src, dst in GREEK_MAP:
        x = F.replace(x, F.lit(src), F.lit(dst))
    for src, dst in SYMBOL_MAP:
        x = F.replace(x, F.lit(src), F.lit(dst))
    # utils.py:59-63 — a^b → a^{b}, a_b → a_{b}; (?U) makes Java \w match
    # Python's unicode \w
    x = F.regexp_replace(x, r"(?U)\^(\w)", r"^{$1}")
    x = F.regexp_replace(x, r"(?U)_(\w)", r"_{$1}")
    # utils.py:66-67 — wrap in math mode
    return F.when(x.startswith("$"), x).otherwise(F.concat(F.lit("$"), x, F.lit("$")))
