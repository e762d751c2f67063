"""DOM heuristics for title/author/date metadata — native regexp_extract.

The north rule's "DOM heuristics for title/author/date metadata fields".
Pattern strings are shared with the oracle (which applies them with Python
``re``); all are dialect-safe between Java and Python regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TITLE_PATTERN = r"<title[^>]*>([^<]*)</title>"
H1_PATTERN = r"<h1[^>]*>([^<]*)</h1>"
AUTHOR_PATTERN = r'<meta\s+name="author"\s+content="([^"]*)"'
DATE_PATTERN = r'<meta\s+property="article:published_time"\s+content="([^"]*)"'
TIME_PATTERN = r'<time[^>]+datetime="([^"]*)"'


def _extract(col: Column, pattern: str) -> Column:
    v = F.regexp_extract(col, pattern, 1)
    return F.when(v == "", F.lit(None).cast("string")).otherwise(v)


def html_title(col: Column) -> Column:
    """<title> else first <h1> else null."""
    return F.coalesce(_extract(col, TITLE_PATTERN), _extract(col, H1_PATTERN))


def html_author(col: Column) -> Column:
    return _extract(col, AUTHOR_PATTERN)


def html_date(col: Column) -> Column:
    """article:published_time else <time datetime=...> else null."""
    return F.coalesce(_extract(col, DATE_PATTERN), _extract(col, TIME_PATTERN))
