"""Tokenizer for the synthetic per-turn document payload markup.

Each transcript turn's ``text`` column carries a document payload in a
line-oriented markup that plays the role the raw PDF byte stream plays for
the reference parser (the PyMuPDF ``page.get_text("dict")`` block→line→span
tree, reference ``extractors/text.py:38-53``; pdfplumber word dicts,
``extractors/text.py:164-181``; embedded image records,
``extractors/image.py:14-44``; trailer metadata, ``parser.py:127-150``).

Grammar (lines separated by ``\\n``; numbers are decimal floats):

    %%DOC key=value;key=value;...        document metadata (PDF trailer analogue)
    %%PAGE <w> <h>                       begin page
    %%DRAW <x0> <y0> <x1> <y1>           vector-drawing rect (layout.py:144,193-195)
    %%IMG <x0> <y0> <x1> <y1> <w> <h> <colorspace> <ext> [<hexbytes>]   embedded image
        (optional 9th token: hex-encoded payload bytes — the reference's
        ImageData.image_bytes, extractors/image.py:33-41 / data_types.py:23)
    %%BLK <x0> <y0> <x1> <y1>            begin text block
    %%LN <x0> <y0> <x1> <y1> <dx> <dy>   begin line (dir=(dx,dy), layout.py:211-215)
    %%SP <size> <font>|<text to EOL>     span; text starts right after '|'
    %%WORD <x0> <x1> <top> <bottom>|<w>  pdfplumber-style word record
    %%TBL <x0> <y0> <x1> <y1>            begin table
    %%ROW cell|cell|...                  table row
    %%HTML                               the REST of the payload is raw HTML
                                         (north-rule boilerplate-strip axis)

Character-span offsets: every ``%%SP`` / ``%%WORD`` records the absolute
(start, end) offsets of its text inside the original turn ``text`` — these
flow through the whole pipeline unchanged (the north rule's per-turn
char-span equality contract).

Malformed lines are skipped (the reference swallows per-stage errors rather
than failing the document, ``parser.py:148-150``); a malformed ``%%DOC``
sets ``meta_error`` and yields metadata with only ``file_size`` populated.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass(slots=True)
class Span:
    size: float
    font: str
    text: str
    start: int  # char offset of text in the turn payload
    end: int


@dataclass(slots=True)
class Line:
    bbox: tuple  # (x0, y0, x1, y1) floats
    direction: tuple  # (dx, dy)
    spans: list = field(default_factory=list)


@dataclass(slots=True)
class Block:
    bbox: tuple
    lines: list = field(default_factory=list)


@dataclass(slots=True)
class Word:
    x0: float
    x1: float
    top: float
    bottom: float
    text: str
    start: int
    end: int


@dataclass(slots=True)
class ImageRec:
    bbox: tuple
    width: int
    height: int
    colorspace: str
    ext: str
    # real decoded payload bytes (reference ImageData.image_bytes,
    # extractors/image.py:33-41); None when the source carries none
    image_bytes: Optional[bytes] = None


@dataclass(slots=True)
class TableRec:
    bbox: tuple
    rows: list = field(default_factory=list)  # list[list[str]]


@dataclass(slots=True)
class Page:
    w: float
    h: float
    blocks: list = field(default_factory=list)
    words: list = field(default_factory=list)
    images: list = field(default_factory=list)
    tables: list = field(default_factory=list)
    draws: list = field(default_factory=list)  # list of bbox tuples


@dataclass(slots=True)
class DocPayload:
    meta: Optional[dict]  # raw key->value from %%DOC, or None
    meta_error: bool
    pages: list
    html: Optional[str]  # raw html text, or None
    html_start: int  # char offset of html text in the payload


_DOC_KEYS = (
    "title",
    "author",
    "subject",
    "creator",
    "producer",
    "creationDate",
    "modDate",
)


def _floats(parts, n):
    if len(parts) < n:
        return None
    try:
        return [float(p) for p in parts[:n]]
    except ValueError:
        return None


def parse_payload(text: str) -> DocPayload:
    """Tokenize one turn payload. Never raises on malformed input.

    r6 perf: this is the parse kernel's inner loop (once per payload
    line); branches are ordered by tag frequency (%%SP / %%LN dominate),
    float parsing is inlined (no per-line _floats call + list build for
    the hot tags), and records are constructed with positional args
    (keyword construction of slotted dataclasses measures ~30% slower).
    Page-scoped tags (%%SP needs a line, %%LN a block, …) carry their
    guard inside the branch — identical skip behavior to the old
    page-guard-first ladder, since a line/block/table can only exist
    under a page."""
    meta = None
    meta_error = False
    pages: list = []
    html = None
    html_start = 0

    page = None
    block = None
    line = None
    table = None

    # one C-level split beats a find/slice loop ~40% on line iteration
    # (same offsets: line_start accumulates len(raw)+1 per line)
    pos = 0
    for raw in text.split("\n"):
        line_start = pos
        pos += len(raw) + 1

        if not raw.startswith("%%"):
            continue
        sep = raw.find(" ")
        if sep == -1:
            tag = raw
            rest = ""
        else:
            tag = raw[:sep]
            rest = raw[sep + 1 :]

        if tag == "%%SP":
            if line is None:
                continue
            bar = rest.find("|")
            if bar == -1:
                continue
            head = rest[:bar].split()
            if len(head) < 2:
                continue
            try:
                size = float(head[0])
            except ValueError:
                continue
            start = line_start + 5 + bar + 1  # len("%%SP") + 1
            sp_text = rest[bar + 1 :]
            line.spans.append(
                Span(size, head[1], sp_text, start, start + len(sp_text))
            )
        elif tag == "%%LN":
            if block is None:
                continue
            p = rest.split()
            if len(p) < 6:
                continue
            try:
                b0 = float(p[0]); b1 = float(p[1]); b2 = float(p[2])
                b3 = float(p[3]); d0 = float(p[4]); d1 = float(p[5])
            except ValueError:
                continue
            line = Line((b0, b1, b2, b3), (d0, d1))
            block.lines.append(line)
        elif tag == "%%WORD":
            if page is None:
                continue
            bar = rest.find("|")
            if bar == -1:
                continue
            p = rest[:bar].split()
            if len(p) < 4:
                continue
            try:
                x0 = float(p[0]); x1 = float(p[1])
                tp = float(p[2]); bt = float(p[3])
            except ValueError:
                continue
            start = line_start + 7 + bar + 1  # len("%%WORD") + 1
            w_text = rest[bar + 1 :]
            page.words.append(
                Word(x0, x1, tp, bt, w_text, start, start + len(w_text))
            )
        elif tag == "%%BLK":
            if page is None:
                continue
            f = _floats(rest.split(), 4)
            if f is not None:
                block = Block(tuple(f))
                page.blocks.append(block)
                line = None
        elif tag == "%%ROW":
            if table is not None:
                table.rows.append(rest.split("|"))
        elif tag == "%%DRAW":
            if page is None:
                continue
            f = _floats(rest.split(), 4)
            if f is not None:
                page.draws.append(tuple(f))
        elif tag == "%%IMG":
            if page is None:
                continue
            parts = rest.split()
            f = _floats(parts, 6)
            if f is not None and len(parts) >= 8:
                img_bytes = None
                if len(parts) >= 9:
                    try:
                        img_bytes = bytes.fromhex(parts[8])
                    except ValueError:
                        img_bytes = None  # malformed hex swallowed like all payload errors
                page.images.append(
                    ImageRec(
                        tuple(f[:4]), int(f[4]), int(f[5]), parts[6], parts[7],
                        img_bytes,
                    )
                )
        elif tag == "%%PAGE":
            f = _floats(rest.split(), 2)
            if f is None:
                continue
            page = Page(f[0], f[1])
            pages.append(page)
            block = line = table = None
        elif tag == "%%TBL":
            if page is None:
                continue
            f = _floats(rest.split(), 4)
            if f is not None:
                table = TableRec(tuple(f))
                page.tables.append(table)
        elif tag == "%%DOC":
            meta = {}
            try:
                for kv in rest.split(";"):
                    if not kv:
                        continue
                    k, _, v = kv.partition("=")
                    if k not in _DOC_KEYS:
                        raise ValueError(k)
                    meta[k] = v
            except ValueError:
                meta = None
                meta_error = True
        elif tag == "%%HTML":
            html_start = line_start + len(raw) + 1
            html = text[html_start:]
            break
        # unknown %%-directives are skipped

    return DocPayload(meta=meta, meta_error=meta_error, pages=pages, html=html, html_start=html_start)
