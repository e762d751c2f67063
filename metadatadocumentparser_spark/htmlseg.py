"""Structural HTML segmentation for the boilerplate-strip axis.

The north rule adds HTML boilerplate stripping (DOM tree build,
tag/text-density classification, readability-style block scoring) to the
reference's PDF path. The reference has no HTML code; this stage derives
from the published shallow-text-features approach (Kohlschütter, Fankhauser,
Nejdl — "Boilerplate Detection using Shallow Text Features", WSDM 2010; the
boilerpipe NumWordsRulesClassifier decision tree) and Arc90-readability-style
container rules. Same scoring *shape* as the reference's block classifier /
formula-density scorer (layout.py:89-109, formula.py:76-123): density +
position features → class.

This module is the *structural* half (tag tokenize → text segments with
word counts, link density, container path, char spans). The classification
decision tree itself is native Catalyst SQL (functions/boilerplate.py) in
the engine and pure Python in the oracle.
"""

from __future__ import annotations

import re

TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*?(/?)>")

# Tags whose open/close flushes the current segment (block-level).
BLOCK_TAGS = frozenset(
    """html head body title meta link p div h1 h2 h3 h4 h5 h6 ul ol li table
    tr td th nav header footer aside article section main br hr blockquote
    pre form script style time noscript figure figcaption""".split()
)

# Containers whose descendants are boilerplate by construction.
BOILER_CONTAINERS = frozenset(
    "nav header footer aside script style form head title noscript".split()
)

# Content inside these is not visible text at all.
INVISIBLE = frozenset("script style head title meta link noscript".split())


def segment_html(html: str, base_offset: int = 0):
    """Tokenize HTML into text segments.

    Returns list of dicts: seg_idx, text, start, end (char offsets into the
    turn payload), tag_path, words, link_density, boiler_container.
    Segments with zero words are dropped.
    """
    # r6 perf: visibility ("any tag on the stack is INVISIBLE") and the
    # boiler-container test are maintained as incremental depth counters
    # on push/pop instead of re-scanning the stack per text node; flush()
    # strips each piece once. Identical segments, golden-pinned.
    stack: list = []
    anchor_depth = 0
    inv_depth = 0  # stack entries in INVISIBLE
    boiler_depth = 0  # stack entries in BOILER_CONTAINERS
    segments: list = []
    pieces: list = []  # (text, start, end, in_anchor)
    seg_path = ""
    seg_boiler = False

    def flush():
        nonlocal pieces
        if pieces:
            nz = [(p, s) for p in pieces for s in (p[0].strip(),) if s]
            if nz:
                text = " ".join(s for _, s in nz)
                words = len(text.split())
                if words > 0:
                    anchor_words = sum(
                        len(p[0].split()) for p in pieces if p[3]
                    )
                    ld = anchor_words / words
                    segments.append(
                        {
                            "seg_idx": len(segments),
                            "text": text,
                            "start": nz[0][0][1],
                            "end": nz[-1][0][2],
                            "tag_path": seg_path,
                            "words": words,
                            "link_density": ld,
                            "boiler_container": seg_boiler,
                        }
                    )
        pieces = []

    pos = 0
    for m in TAG_RE.finditer(html):
        raw_text = html[pos : m.start()]
        if raw_text:
            if inv_depth == 0 and raw_text.strip():
                if not pieces:
                    seg_path = "/".join(stack)
                    seg_boiler = boiler_depth > 0
                pieces.append(
                    (
                        raw_text,
                        base_offset + pos + (len(raw_text) - len(raw_text.lstrip())),
                        base_offset + m.start() - (len(raw_text) - len(raw_text.rstrip())),
                        anchor_depth > 0,
                    )
                )
        closing, tag, self_close = m.group(1), m.group(2).lower(), m.group(3)
        if tag in BLOCK_TAGS:
            flush()
        if tag == "a":
            if closing:
                anchor_depth = max(0, anchor_depth - 1)
            elif not self_close:
                anchor_depth += 1
        elif not self_close and tag not in ("br", "hr", "meta", "link", "img", "input"):
            if closing:
                for i in range(len(stack) - 1, -1, -1):
                    if stack[i] == tag:
                        for t in stack[i:]:
                            if t in INVISIBLE:
                                inv_depth -= 1
                            if t in BOILER_CONTAINERS:
                                boiler_depth -= 1
                        del stack[i:]
                        break
            else:
                stack.append(tag)
                if tag in INVISIBLE:
                    inv_depth += 1
                if tag in BOILER_CONTAINERS:
                    boiler_depth += 1
        pos = m.end()

    tail = html[pos:]
    if tail and tail.strip() and inv_depth == 0:
        if not pieces:
            seg_path = "/".join(stack)
            seg_boiler = boiler_depth > 0
        pieces.append(
            (
                tail,
                base_offset + pos + (len(tail) - len(tail.lstrip())),
                base_offset + len(html) - (len(tail) - len(tail.rstrip())),
                anchor_depth > 0,
            )
        )
    flush()
    return segments


def classify_segment(words, link_density, prev_words, prev_ld, next_words) -> bool:
    """NumWordsRulesClassifier decision tree (Kohlschütter et al., WSDM 2010 /
    boilerpipe classifiers). True = content. Used by the ORACLE; the engine
    evaluates the identical tree as a native CASE/Window expression
    (functions/boilerplate.py)."""
    if link_density > 0.333333:
        return False
    if prev_ld <= 0.555556:
        if words <= 16:
            if next_words <= 15:
                return prev_words > 4
            return True
        return True
    else:
        if words <= 40:
            return next_words > 17
        return True
