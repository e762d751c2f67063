"""Real table-extraction seam: camelot / tabula call shapes → table records.

The reference shells out to Camelot (ghostscript) and Tabula (JPype) —
``camelot.read_pdf(str(path), pages='all', flavor='lattice',
suppress_stdout=True)`` and ``tabula.read_pdf(str(path), pages='all',
multiple_tables=True, silent=True)`` (reference extractors/table.py:25-82)
— neither library exists in this container, so both are soft-imported with
availability flags exactly like the reference, and the result-shape
converters are pure functions tested against library-shaped fixtures.

Output records match docparse.extract_tables (table_index global across
the document, bbox floats, data list-of-list strings, extraction_method).
"""

from __future__ import annotations

try:  # pragma: no cover - exercised only where camelot is installed
    import camelot  # type: ignore

    CAMELOT_AVAILABLE = True
except ImportError:  # pragma: no cover
    camelot = None
    CAMELOT_AVAILABLE = False

try:  # pragma: no cover - exercised only where tabula is installed
    import tabula  # type: ignore

    TABULA_AVAILABLE = True
except ImportError:  # pragma: no cover
    tabula = None
    TABULA_AVAILABLE = False


def camelot_shaped_to_records(tables) -> list[dict]:
    """Camelot result list → table records. Each item needs the attribute
    surface the reference touches: ``.page`` (1-based), ``._bbox``
    (optional), ``.df.values.tolist()`` (reference table.py:42-49)."""
    out = []
    for idx, t in enumerate(tables):
        bbox = getattr(t, "_bbox", None)
        out.append(
            {
                "table_index": idx,
                "page_num": int(t.page) - 1,  # camelot is 1-based
                "bbox": [float(b) for b in bbox] if bbox is not None else None,
                "data": [[str(c) for c in row] for row in t.df.values.tolist()],
                "extraction_method": "camelot",
            }
        )
    return out


def tabula_shaped_to_records(dfs) -> list[dict]:
    """Tabula result (list of DataFrames) → table records. Tabula exposes
    no page numbers or bboxes (reference table.py:76-81)."""
    return [
        {
            "table_index": idx,
            "page_num": 0,
            "bbox": None,
            "data": [[str(c) for c in row] for row in df.values.tolist()],
            "extraction_method": "tabula",
        }
        for idx, df in enumerate(dfs)
    ]


def extract_tables_from_pdf(pdf_path: str, table_method: str = "camelot") -> list[dict]:
    """Real extraction over a PDF path; unavailable/unknown method → []
    with the reference's swallow-and-continue posture (table.py:27-29,
    56-58; errors never fail the document)."""
    try:
        if table_method == "camelot":
            if not CAMELOT_AVAILABLE:
                return []
            tables = camelot.read_pdf(
                str(pdf_path), pages="all", flavor="lattice", suppress_stdout=True
            )
            return camelot_shaped_to_records(tables)
        if table_method == "tabula":
            if not TABULA_AVAILABLE:
                return []
            dfs = tabula.read_pdf(
                str(pdf_path), pages="all", multiple_tables=True, silent=True
            )
            return tabula_shaped_to_records(dfs)
    except Exception:
        return []
    return []
