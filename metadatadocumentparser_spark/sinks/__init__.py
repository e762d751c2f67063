"""Sinks & serialization: canonical struct (K1), JSON (K2), TOON (K3),
export-format comparison (K5, README contract), image file sink (K6),
method comparison (A5), column visualization (K7)."""

from .export import (  # noqa: F401
    canonical_struct,
    canonical_struct_from_parsed,
    export,
    compare_export_formats,
    compare_extraction_methods,
    export_json,
    export_toon,
    save_images,
    toon_encode,
    visualize_columns,
)
