"""Adapter seams for real-PDF ingestion (sources/fitz_adapter.py) and real
table extraction (sources/table_adapter.py).

The fitz adapter is validated by driving the SAME document content through
both ingestion paths — the %%-markup parser and a PyMuPDF-shaped dict tree
(``page.get_text("dict")`` structure, reference extractors/text.py:38-53) —
and asserting the full extraction pipeline (docparse.parse_doc) produces
identical blocks, layout vote, extracted text, images and metadata. Span
offsets differ by design (markup offsets vs concatenated-stream offsets),
so span *lengths* are compared.
"""

from __future__ import annotations

from metadatadocumentparser_spark.docparse import parse_doc, parse_turn
from metadatadocumentparser_spark.sources.fitz_adapter import (
    FITZ_AVAILABLE,
    fitz_shaped_to_payload,
    pdf_bytes_to_payload,
)
from metadatadocumentparser_spark.sources.table_adapter import (
    camelot_shaped_to_records,
    tabula_shaped_to_records,
)

# one page: a title-ish block, a body block, a vertical-text line (P3),
# a block fully inside an image (P4), an in-margin header block (P5)
_SPANS = {
    "title": ("Quarterly Energy Report", 18.0, "Helv"),
    "body": (
        "The consumption of renewable energy grew steadily across regions",
        11.0,
        "Times",
    ),
    "body2": (
        "while fossil generation declined for the third consecutive year",
        11.0,
        "Times",
    ),
    "vert": ("VERTICAL WATERMARK TEXT", 11.0, "Times"),
    "inimg": ("caption trapped inside figure", 9.0, "Times"),
    "head": ("running header", 8.0, "Times"),
}


def _markup() -> str:
    s = _SPANS
    return "\n".join(
        [
            "%%DOC title=Report;author=Ana;creationDate=D:20260101;modDate=D:20260102",
            "%%PAGE 612 792",
            # header block inside top margin (y1 < 50)
            "%%BLK 72 20 540 34",
            "%%LN 72 20 540 32 1 0",
            f"%%SP {s['head'][1]} {s['head'][2]}|{s['head'][0]}",
            # title
            "%%BLK 72 100 540 124",
            "%%LN 72 100 540 122 1 0",
            f"%%SP {s['title'][1]} {s['title'][2]}|{s['title'][0]}",
            # body (two lines in one block)
            "%%BLK 72 150 540 190",
            "%%LN 72 150 540 168 1 0",
            f"%%SP {s['body'][1]} {s['body'][2]}|{s['body'][0]}",
            "%%LN 72 170 540 188 1 0",
            f"%%SP {s['body2'][1]} {s['body2'][2]}|{s['body2'][0]}",
            # vertical line block (direction (0,1) → excluded, P3)
            "%%BLK 560 200 580 500",
            "%%LN 560 200 580 500 0 1",
            f"%%SP {s['vert'][1]} {s['vert'][2]}|{s['vert'][0]}",
            # image + a block fully inside it (P4)
            "%%IMG 100 300 400 500 300 200 DeviceRGB png",
            "%%BLK 120 320 380 340",
            "%%LN 120 320 380 338 1 0",
            f"%%SP {s['inimg'][1]} {s['inimg'][2]}|{s['inimg'][0]}",
            "%%DRAW 50 600 562 604",
        ]
    )


def _fitz_shaped() -> tuple[list, dict]:
    s = _SPANS

    def span(key):
        text, size, font = s[key]
        return {"text": text, "size": size, "font": font}

    def blk(bbox, *lines):
        return {"type": 0, "bbox": bbox, "lines": list(lines)}

    def ln(bbox, d, *spans):
        return {"bbox": bbox, "dir": d, "spans": list(spans)}

    pdict = {
        "blocks": [
            blk((72, 20, 540, 34), ln((72, 20, 540, 32), (1, 0), span("head"))),
            blk((72, 100, 540, 124), ln((72, 100, 540, 122), (1, 0), span("title"))),
            blk(
                (72, 150, 540, 190),
                ln((72, 150, 540, 168), (1, 0), span("body")),
                ln((72, 170, 540, 188), (1, 0), span("body2")),
            ),
            blk((560, 200, 580, 500), ln((560, 200, 580, 500), (0, 1), span("vert"))),
            blk((120, 320, 380, 340), ln((120, 320, 380, 338), (1, 0), span("inimg"))),
            {"type": 1, "bbox": (100, 300, 400, 500)},  # image block: skipped
        ]
    }
    pages = [
        {
            "width": 612,
            "height": 792,
            "dict": pdict,
            "drawings": [(50, 600, 562, 604)],
            "images": [
                {
                    "bbox": (100, 300, 400, 500),
                    "width": 300,
                    "height": 200,
                    "colorspace": "DeviceRGB",
                    "ext": "png",
                }
            ],
        }
    ]
    metadata = {
        "title": "Report",
        "author": "Ana",
        "subject": "",
        "creator": "",
        "producer": "",
        "creationDate": "D:20260101",
        "modDate": "D:20260102",
    }
    return pages, metadata


def _strip_offsets(parsed):
    """Drop every offset-bearing field: markup offsets index into payload
    text (including markup between spans), adapter offsets index into the
    concatenated span stream — same lengths-of-text, different coordinates."""
    blocks = [
        {k: v for k, v in b.items() if k not in ("span_start", "span_end", "spans")}
        for b in parsed["blocks"]
    ]
    return blocks, parsed["extracted_text"], parsed["column_layout"], parsed["images"]


def test_fitz_adapter_matches_markup_pipeline():
    markup_out = parse_turn(_markup())
    pages, metadata = _fitz_shaped()
    adapter_out = parse_doc(fitz_shaped_to_payload(pages, metadata), file_size=999)

    assert _strip_offsets(adapter_out) == _strip_offsets(markup_out)
    # metadata maps the same trailer keys (creationDate→creation_date etc.)
    for k in ("title", "author", "creation_date", "modification_date", "num_pages", "page_sizes"):
        assert adapter_out["meta"][k] == markup_out["meta"][k], k
    # adapter spans are monotone, disjoint, length-consistent
    spans = adapter_out["spans"]
    assert all(s < e for s, e in spans)
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))


def test_fitz_adapter_empty_metadata_and_pages():
    out = parse_doc(fitz_shaped_to_payload([], None), file_size=7)
    assert out["blocks"] == [] and out["extracted_text"] == ""
    assert out["meta"]["file_size"] == 7 and out["meta"]["num_pages"] == 0


def test_pdf_bytes_requires_fitz():
    if FITZ_AVAILABLE:  # pragma: no cover - env-dependent
        return
    try:
        pdf_bytes_to_payload(b"%PDF-1.4 fake")
        raise AssertionError("expected ImportError")
    except ImportError:
        pass


class _FakeDF:
    def __init__(self, rows):
        self.values = _FakeValues(rows)


class _FakeValues:
    def __init__(self, rows):
        self._rows = rows

    def tolist(self):
        return self._rows


class _FakeCamelotTable:
    def __init__(self, page, bbox, rows):
        self.page = page
        self._bbox = bbox
        self.df = _FakeDF(rows)


def test_camelot_shape_conversion():
    recs = camelot_shaped_to_records(
        [_FakeCamelotTable(2, (10.0, 20.0, 200.0, 120.0), [["a", 1], ["b", 2]])]
    )
    assert recs == [
        {
            "table_index": 0,
            "page_num": 1,  # camelot is 1-based
            "bbox": [10.0, 20.0, 200.0, 120.0],
            "data": [["a", "1"], ["b", "2"]],
            "extraction_method": "camelot",
        }
    ]


def test_tabula_shape_conversion():
    recs = tabula_shaped_to_records([_FakeDF([["x", "y"]]), _FakeDF([["z", 9]])])
    assert [r["table_index"] for r in recs] == [0, 1]
    assert recs[1]["data"] == [["z", "9"]]
    assert all(r["extraction_method"] == "tabula" for r in recs)


def test_fitz_real_pdf_roundtrip():
    """When PyMuPDF is present, build a tiny real PDF in-memory, round-trip
    it through pdf_bytes_to_payload → parse_doc and assert block/meta/span
    invariants — the adapter is then proven against the real library, not
    only fitz-shaped fixtures. Skips cleanly where fitz is absent (this
    container), keeping CI truthful about what is proven."""
    import pytest

    fitz = pytest.importorskip("fitz")

    from metadatadocumentparser_spark.docparse import parse_doc
    from metadatadocumentparser_spark.sources.fitz_adapter import pdf_bytes_to_payload

    doc = fitz.open()
    page = doc.new_page(width=612, height=792)
    page.insert_text((72, 100), "Hello structural world", fontsize=11)
    page.insert_text((72, 130), "Second line of text", fontsize=11)
    doc.set_metadata({"title": "Tiny", "author": "Adapter Test"})
    data = doc.tobytes()

    payload = pdf_bytes_to_payload(data)
    assert len(payload.pages) == 1
    parsed = parse_doc(payload, file_size=len(data))
    texts = [b["text"] for b in parsed["blocks"]]
    assert any("Hello structural world" in t for t in texts)
    assert parsed["meta"]["title"] == "Tiny"
    assert parsed["meta"]["author"] == "Adapter Test"
    assert parsed["meta"]["num_pages"] == 1
    # span invariants: monotone, disjoint, within the synthetic text space
    spans = parsed["spans"]
    assert all(s[0] <= s[1] for s in spans)
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))


# --------------------------------------------------------------------------
# vendored real-PDF fixture (tests/data/minimal.pdf): one page, Helvetica
# "Spark graft fixture" at (72, 700), Info /Title /Author. The expected
# get_text("dict")-shaped tree below is what the adapter consumes from it —
# so the mapping half of pdf_bytes_to_payload executes in CI even where
# PyMuPDF is absent (the live decode test stays importorskip-gated).
# --------------------------------------------------------------------------

import os as _os

_FIXTURE_PDF = _os.path.join(_os.path.dirname(__file__), "data", "minimal.pdf")
_FIXTURE_TEXT = "Spark graft fixture"
_FIXTURE_TREE = {
    "blocks": [
        {
            "type": 0,
            "bbox": (72.0, 689.0, 168.0, 703.0),
            "lines": [
                {
                    "bbox": (72.0, 689.0, 168.0, 703.0),
                    "dir": (1.0, 0.0),
                    "spans": [
                        {"text": _FIXTURE_TEXT, "size": 11.0, "font": "Helvetica"}
                    ],
                }
            ],
        }
    ]
}
_FIXTURE_META = {"title": "Tiny Fixture", "author": "Graft Test"}


def test_vendored_pdf_structurally_valid():
    """The checked-in fixture is a well-formed single-page PDF: header,
    the objects the trailer points at, a correct xref offset table."""
    data = open(_FIXTURE_PDF, "rb").read()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    xref_at = int(data[data.rindex(b"startxref") + 9 :].split()[0])
    assert data[xref_at : xref_at + 4] == b"xref"
    # every xref entry must point at its "<i> 0 obj" header
    # (line 0 = "xref", 1 = "0 7", 2 = the free entry; objects follow)
    table = data[xref_at:].split(b"\n")[3:9]
    for i, entry in enumerate(table, start=1):
        off = int(entry.split()[0])
        assert data[off:].startswith(f"{i} 0 obj".encode()), i
    assert b"(" + _FIXTURE_TEXT.encode() + b")" in data
    assert b"/Title (Tiny Fixture)" in data


class _FakeRect:
    width, height = 612.0, 792.0


class _FakePage:
    rect = _FakeRect()

    def get_images(self):
        return []

    def get_drawings(self):
        return []

    def get_text(self, kind):
        assert kind == "dict"
        return _FIXTURE_TREE


class _FakeDoc:
    def __init__(self, metadata):
        self.metadata = metadata
        self.closed = False

    def __iter__(self):
        return iter([_FakePage()])

    def close(self):
        self.closed = True


def test_pdf_bytes_to_payload_mapping(monkeypatch):
    """Drives pdf_bytes_to_payload's REAL-library branch (page loop,
    drawings/images calls, metadata handling, finally-close) against a
    fake fitz serving the vendored fixture's expected tree — the branch
    that used to be skip-gated now executes in every CI run; only the
    native decode itself stays behind importorskip."""
    from metadatadocumentparser_spark.sources import fitz_adapter as fa

    data = open(_FIXTURE_PDF, "rb").read()
    made = []

    class _FakeFitz:
        @staticmethod
        def open(stream=None, filetype=None):
            assert stream == data and filetype == "pdf"
            doc = _FakeDoc(dict(_FIXTURE_META))
            made.append(doc)
            return doc

    monkeypatch.setattr(fa, "fitz", _FakeFitz)
    monkeypatch.setattr(fa, "FITZ_AVAILABLE", True)
    payload = fa.pdf_bytes_to_payload(data)
    assert made[0].closed  # native handle released
    assert not payload.meta_error and payload.meta == _FIXTURE_META
    assert len(payload.pages) == 1 and payload.pages[0].w == 612.0
    [blk] = payload.pages[0].blocks
    [ln] = blk.lines
    [sp] = ln.spans
    assert sp.text == _FIXTURE_TEXT and sp.font == "Helvetica" and sp.size == 11.0
    assert (sp.start, sp.end) == (0, len(_FIXTURE_TEXT))

    parsed = parse_doc(payload, file_size=len(data))
    assert any(_FIXTURE_TEXT in b["text"] for b in parsed["blocks"])
    assert parsed["meta"]["title"] == "Tiny Fixture"
    assert parsed["meta"]["num_pages"] == 1

    # metadata read raising must swallow into meta_error (parser.py:148-150
    # scope), never fail the document
    class _Exploding(_FakeDoc):
        def __init__(self):
            self.closed = False

        @property
        def metadata(self):
            raise RuntimeError("boom")

    class _FakeFitz2:
        @staticmethod
        def open(stream=None, filetype=None):
            return _Exploding()

    monkeypatch.setattr(fa, "fitz", _FakeFitz2)
    p2 = fa.pdf_bytes_to_payload(data)
    assert p2.meta_error and p2.meta is None and len(p2.pages) == 1


def test_fitz_live_decode_of_vendored_fixture():
    """Where PyMuPDF exists, the vendored bytes must decode to the
    checked-in expectations: same text, same font, same metadata — pinning
    the fixture and the fake-fitz tree to the real library's output."""
    import pytest

    fitz = pytest.importorskip("fitz")

    data = open(_FIXTURE_PDF, "rb").read()
    doc = fitz.open(stream=data, filetype="pdf")
    assert doc.page_count == 1
    tree = doc[0].get_text("dict")
    spans = [
        sp
        for b in tree["blocks"]
        if b.get("type") == 0
        for ln in b["lines"]
        for sp in ln["spans"]
    ]
    assert [s["text"] for s in spans] == [_FIXTURE_TEXT]
    assert spans[0]["font"] == "Helvetica" and abs(spans[0]["size"] - 11.0) < 0.01
    assert doc.metadata["title"] == "Tiny Fixture"
    doc.close()

    payload = pdf_bytes_to_payload(data)
    [sp] = payload.pages[0].blocks[0].lines[0].spans
    assert sp.text == _FIXTURE_TEXT
