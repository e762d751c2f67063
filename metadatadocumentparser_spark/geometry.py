"""Integer-rect geometry + the reference's multi-column detection recipe.

Re-implements the rect algebra the reference gets from ``fitz.IRect``
(floor/ceil integer rects; ``&`` intersection; ``|`` union; ``in``
containment; ``.is_empty``) and the order-dependent column-box algorithm
``LayoutAnalyzer._column_boxes`` (reference ``layout.py:140-272``) — the
hardest operator in the inventory (SURVEY.md §2.8). The greedy join is
inherently sequential *per page*, but pages/turns are independent, so in
Spark this runs inside the grouped parse kernel (one turn per group); the
engine never shuffles for it.

Rects are plain 4-tuples ``(x0, y0, x1, y1)``.
"""

from __future__ import annotations

import math


def irect(b):
    """Smallest integer rect containing float rect b (fitz.IRect(rect))."""
    return (
        int(math.floor(b[0])),
        int(math.floor(b[1])),
        int(math.ceil(b[2])),
        int(math.ceil(b[3])),
    )


def is_empty(r) -> bool:
    return r[0] >= r[2] or r[1] >= r[3]


def intersect(a, b):
    return (max(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), min(a[3], b[3]))


def union(a, b):
    """Union of two rects; either may be None (empty-rect identity)."""
    if a is None:
        return b
    if b is None:
        return a
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def contains(outer, inner) -> bool:
    return (
        outer[0] <= inner[0]
        and outer[1] <= inner[1]
        and inner[2] <= outer[2]
        and inner[3] <= outer[3]
    )


def in_bbox(bb, bboxes) -> int:
    """1-based index of first container of bb, else 0 (layout.py:165-170)."""
    for i, bbox in enumerate(bboxes):
        if contains(bbox, bb):
            return i + 1
    return 0


def intersects_bboxes(rect, bboxes) -> bool:
    """True if rect intersects any bbox (layout.py:274-279)."""
    for bbox in bboxes:
        if not is_empty(intersect(rect, bbox)):
            return True
    return False


def _can_extend(temp, bb, bboxlist, vert_bboxes) -> bool:
    """Exact replica of the reference's can_extend (layout.py:155-163),
    including its quirk of re-testing the vert intersection inside the loop
    (and vacuously passing when bboxlist is empty)."""
    for b in bboxlist:
        if (not intersects_bboxes(temp, vert_bboxes)) and (
            b is None or b == bb or is_empty(intersect(temp, b))
        ):
            continue
        return False
    return True


def column_boxes(page, header_margin: float = 50, footer_margin: float = 50, no_image_text: bool = True):
    """Multi-column detection for one page (reference layout.py:140-272).

    ``page`` is a payload.Page. Emulation of ``page.get_text(..., clip=clip)``:
    a line participates iff its bbox lies fully inside the clip region.

    Returns the final column rects sorted by (x0, y0) — left column fully
    before right column (layout.py:270).
    """
    clip = (0.0, 0.0 + header_margin, page.w, page.h - footer_margin)

    # Vector drawings → path rects sorted (y0, x0) (layout.py:193-195)
    path_bboxes = sorted((irect(d) for d in page.draws), key=lambda b: (b[1], b[0]))
    # Image rects (layout.py:198-199)
    img_bboxes = [irect(im.bbox) for im in page.images]

    vert_bboxes = []
    bboxes = []
    for blk in page.blocks:
        kept = [ln for ln in blk.lines if contains(clip, ln.bbox)]
        if not kept:
            continue
        bbox0 = None
        for ln in kept:
            bbox0 = union(bbox0, irect(ln.bbox))

        # Drop text contained in images (layout.py:207-208)
        if no_image_text and in_bbox(bbox0, img_bboxes):
            continue

        # Vertical text → obstacle, not candidate (layout.py:211-215)
        if kept[0].direction != (1.0, 0.0):
            vert_bboxes.append(bbox0)
            continue

        # Shrink to union of >1-char lines (layout.py:217-223)
        srect = None
        for ln in kept:
            t = "".join(s.text.strip() for s in ln.spans)
            if len(t) > 1:
                srect = union(srect, irect(ln.bbox))
        if srect is None or is_empty(srect):
            continue
        bboxes.append(srect)

    # Sort by (background, y0, x0) (layout.py:229)
    bboxes.sort(key=lambda k: (in_bbox(k, path_bboxes), k[1], k[0]))

    # extend_right (layout.py:172-190)
    width = int(page.w)
    for i, bb in enumerate(bboxes):
        if in_bbox(bb, path_bboxes):
            continue
        if in_bbox(bb, img_bboxes):
            continue
        temp = (bb[0], bb[1], width, bb[3])
        if intersects_bboxes(temp, path_bboxes + vert_bboxes + img_bboxes):
            continue
        if _can_extend(temp, bb, bboxes, vert_bboxes):
            bboxes[i] = temp
    bboxes = [b for b in bboxes if b is not None]

    if not bboxes:
        return []

    # Greedy column join (layout.py:238-263) — order-dependent, sequential
    nblocks = [bboxes[0]]
    for bb in bboxes[1:]:
        check = False
        for j in range(len(nblocks)):
            nbb = nblocks[j]
            # never join across columns
            if bb is None or nbb[2] < bb[0] or bb[2] < nbb[0]:
                continue
            # never join across different backgrounds
            if in_bbox(nbb, path_bboxes) != in_bbox(bb, path_bboxes):
                continue
            # aligned within 5pt and vertically within 10pt (layout.py:256-257)
            if abs(nbb[0] - bb[0]) < 5 and abs(nbb[2] - bb[2]) < 5:
                if bb[1] < nbb[3] + 10:
                    nblocks[j] = union(nbb, bb)
                    check = True
                    break
        if not check:
            nblocks.append(bb)

    nblocks.sort(key=lambda b: (b[0], b[1]))
    return nblocks
