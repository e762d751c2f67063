"""F1 — block-type classifier as a native expression chain.

Reference ``layout.py:89-109``: header if y0 < 0.1·page_h; footer if
y1 > 0.9·page_h; title if font_size > 16; heading if font_size > 12; else
text — in that priority order. The reference's ``if font_size and ...``
treats 0.0 (and None) as falsy → replicated with the ``!= 0.0`` guard.

Blocks the reference never classifies (pdfplumber lines text.py:183-188,
whole-page fallbacks text.py:96-104) carry ``needs_classify = false`` and
get the literal dataclass default "text" (data_types.py:12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def classify_block_type(
    bbox: Column, font_size: Column, page_height: Column, needs_classify: Column
) -> Column:
    y0 = bbox[1]
    y1 = bbox[3]
    fs_ok = font_size.isNotNull() & (font_size != 0.0)
    chain = (
        F.when(y0 < page_height * 0.1, F.lit("header"))
        .when(y1 > page_height * 0.9, F.lit("footer"))
        .when(fs_ok & (font_size > 16), F.lit("title"))
        .when(fs_ok & (font_size > 12), F.lit("heading"))
        .otherwise(F.lit("text"))
    )
    return F.when(needs_classify, chain).otherwise(F.lit("text"))
