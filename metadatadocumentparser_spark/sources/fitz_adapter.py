"""Real-PDF ingestion seam: PyMuPDF (fitz) shapes → payload structures.

The engine's operators all consume ``payload.DocPayload`` (via
``docparse.parse_doc``); inside this sandbox the only testable producer is
the ``%%PAGE/%%BLK/%%SP`` markup parser. This module is the adapter a user
points at a parquet of REAL PDF bytes: it maps the exact PyMuPDF call
shapes the reference uses —

- ``page.get_text("dict")`` block→line→span tree
  (reference extractors/text.py:38-53),
- ``page.get_drawings()`` / ``page.get_images()`` + ``get_image_rects``
  (reference layout.py:193-199, extractors/image.py:22-41),
- ``doc.metadata`` trailer keys (reference parser.py:127-150)

— into ``payload.Page``/``Block``/``Line``/``Span``/``ImageRec`` so every
downstream operator (column layout, classification, formula stage, spans)
runs unchanged. ``fitz`` is soft-imported like the reference's optional
dependencies; the dict-level functions are pure and tested against
fitz-shaped fixtures without the library.

Span offsets: the markup parser's offsets index into the payload text; a
real PDF has no such source string, so the adapter assigns running offsets
into the concatenation of span texts in document visit order (page, block,
line, span) — span/start/end remain consistent, monotone and disjoint,
which is what the downstream span algebra relies on.
"""

from __future__ import annotations

from ..payload import Block, DocPayload, ImageRec, Line, Page, Span

try:  # pragma: no cover - exercised only where PyMuPDF is installed
    import fitz  # type: ignore

    FITZ_AVAILABLE = True
except ImportError:  # pragma: no cover
    fitz = None
    FITZ_AVAILABLE = False

_META_KEYS = (
    "title",
    "author",
    "subject",
    "creator",
    "producer",
    "creationDate",
    "modDate",
)


def page_dict_to_page(
    pdict: dict,
    width: float,
    height: float,
    drawings: list | None = None,
    images: list | None = None,
    offset: int = 0,
) -> tuple[Page, int]:
    """One ``page.get_text("dict")`` result → payload.Page.

    ``drawings``: list of (x0, y0, x1, y1) rect tuples (the reference keeps
    only ``p["rect"]`` per drawing path, layout.py:193-195).
    ``images``: list of dicts with the ``doc.extract_image`` fields the
    reference keeps (width, height, colorspace, ext) plus the bbox from
    ``page.get_image_rects`` (image.py:25-41).
    Returns (page, next_offset) so spans stay globally monotone.
    """
    blocks = []
    for b in pdict.get("blocks", ()):
        if b.get("type") != 0:  # 0 = text block (text.py:43)
            continue
        lines = []
        for ln in b.get("lines", ()):
            spans = []
            for sp in ln.get("spans", ()):
                t = sp.get("text", "")
                spans.append(
                    Span(
                        size=float(sp.get("size", 0.0)),
                        font=str(sp.get("font", "")),
                        text=t,
                        start=offset,
                        end=offset + len(t),
                    )
                )
                offset += len(t)
            lines.append(
                Line(
                    bbox=tuple(ln.get("bbox", (0.0, 0.0, 0.0, 0.0))),
                    direction=tuple(ln.get("dir", (1.0, 0.0))),
                    spans=spans,
                )
            )
        blocks.append(Block(bbox=tuple(b["bbox"]), lines=lines))
    imgs = [
        ImageRec(
            bbox=tuple(im.get("bbox", (0.0, 0.0, 0.0, 0.0))),
            width=int(im.get("width", 0)),
            height=int(im.get("height", 0)),
            colorspace=str(im.get("colorspace", "")),
            ext=str(im.get("ext", "")),
            # doc.extract_image()["image"] payload (reference image.py:33-41)
            image_bytes=im.get("image"),
        )
        for im in (images or [])
    ]
    page = Page(
        w=float(width),
        h=float(height),
        blocks=blocks,
        words=[],  # pdfplumber word scan needs its own adapter (see module doc)
        images=imgs,
        tables=[],  # table methods shell out, see sources/table_adapter.py
        draws=[tuple(d) for d in (drawings or [])],
    )
    return page, offset


def fitz_shaped_to_payload(pages: list[dict], metadata: dict | None) -> DocPayload:
    """Pure dict-level assembly (testable without fitz). Each entry of
    ``pages``: {"width", "height", "dict", "drawings", "images"} where
    "dict" is a ``get_text("dict")``-shaped tree."""
    out_pages, offset = [], 0
    for p in pages:
        page, offset = page_dict_to_page(
            p["dict"],
            p["width"],
            p["height"],
            drawings=p.get("drawings"),
            images=p.get("images"),
            offset=offset,
        )
        out_pages.append(page)
    meta = None
    if metadata is not None:
        meta = {k: metadata[k] for k in _META_KEYS if metadata.get(k)}
    return DocPayload(
        meta=meta, meta_error=False, pages=out_pages, html=None, html_start=0
    )


def pdf_bytes_to_payload(data: bytes) -> DocPayload:
    """Real ingestion: PDF bytes → DocPayload via fitz (requires PyMuPDF).

    Mirrors the reference's per-page calls; metadata errors are swallowed
    into meta_error=True exactly like parser.py:148-150."""
    if not FITZ_AVAILABLE:
        raise ImportError(
            "PyMuPDF (fitz) is not installed; pdf_bytes_to_payload needs it. "
            "Dict-shaped ingestion (fitz_shaped_to_payload) works without."
        )
    doc = fitz.open(stream=data, filetype="pdf")
    try:  # finally-close: per-page failures must not leak native MuPDF handles
        pages = []
        for page in doc:
            images = []
            for idx, info in enumerate(page.get_images()):
                xref = info[0]
                rects = page.get_image_rects(xref)
                base = doc.extract_image(xref)
                images.append(
                    {
                        "bbox": tuple(rects[0]) if rects else (0, 0, 0, 0),
                        "width": base["width"],
                        "height": base["height"],
                        "colorspace": base.get("colorspace"),
                        "ext": base["ext"],
                        "image": base.get("image"),
                    }
                )
            drawings = [tuple(p["rect"]) for p in page.get_drawings()]
            pages.append(
                {
                    "width": page.rect.width,
                    "height": page.rect.height,
                    "dict": page.get_text("dict"),
                    "drawings": drawings,
                    "images": images,
                }
            )
        # only the METADATA read swallows into meta_error (parser.py:148-150
        # scope) — an assembly failure is a real defect and must propagate
        try:
            metadata = doc.metadata
        except Exception:
            metadata = None
        if metadata is None:
            payload = fitz_shaped_to_payload(pages, None)
            payload.meta_error = True
        else:
            payload = fitz_shaped_to_payload(pages, metadata)
        return payload
    finally:
        doc.close()


def parse_pdf_bytes(data: bytes, **parse_kwargs):
    """PDF bytes → the full parse_turn output dict (docparse.parse_doc)."""
    from ..docparse import parse_doc

    return parse_doc(pdf_bytes_to_payload(data), len(data), **parse_kwargs)
