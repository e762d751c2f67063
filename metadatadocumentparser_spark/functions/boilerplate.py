"""Boilerplate classification as a native CASE chain over window features.

The NumWordsRulesClassifier decision tree (Kohlschütter et al., WSDM 2010 /
boilerpipe) evaluated with prev/next-segment features from F.lag/F.lead —
the classic Spark shape for neighbor-dependent per-row logic. Container
override: anything under nav/header/footer/aside/script/style/form is
boilerplate regardless.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_content(
    words: Column,
    link_density: Column,
    prev_words: Column,
    prev_link_density: Column,
    next_words: Column,
    boiler_container: Column,
) -> Column:
    """Mirror of htmlseg.classify_segment (the oracle's Python tree)."""
    tree = F.when(link_density > 0.333333, F.lit(False)).otherwise(
        F.when(
            prev_link_density <= 0.555556,
            F.when(
                words <= 16,
                F.when(next_words <= 15, prev_words > 4).otherwise(F.lit(True)),
            ).otherwise(F.lit(True)),
        ).otherwise(
            F.when(words <= 40, next_words > 17).otherwise(F.lit(True))
        )
    )
    return (~boiler_container) & tree
