"""Native Catalyst expression layer — zero per-row Python.

Every classification / scoring / conversion rule of the reference is
re-expressed here as pyspark.sql.functions column expressions so it runs
inside whole-stage codegen (SURVEY.md §2.7): block-type classifier (F1),
formula score (F2) + filters (P7/P8), LaTeX heuristic (F5), the boilerplate
decision tree, HTML metadata regexes, and text-analysis kernels.
"""

from .classify import classify_block_type  # noqa: F401
from .formula import formula_score_cols, is_formula_candidate  # noqa: F401
from .latex import latex_heuristic  # noqa: F401
from .boilerplate import is_content  # noqa: F401
from .htmlmeta import html_author, html_date, html_title  # noqa: F401
