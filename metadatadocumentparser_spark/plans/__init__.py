"""Logical plans: the end-to-end extraction pipeline and lineage/resume."""

from .corpus_prep import corpus_prep, file_scan_count  # noqa: F401
from .pipeline import (  # noqa: F401
    parse_transcripts,
    blocks_of,
    formulas_of,
    images_of,
    tables_of,
    meta_of,
    segments_of,
    turns_of,
    outputs_of,
    extract_all,
    extract_all_materialized,
    register_extraction_views,
)
