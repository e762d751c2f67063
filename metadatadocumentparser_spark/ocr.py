"""Pluggable OCR strategy seam (reference extractors/ocr.py:7-69).

The reference defines an ``ExternalOCR`` ABC with ``image_to_latex(bytes) ->
Optional[str]`` and a Mathpix implementation that posts a base64 PNG to a
public OCR endpoint with a 10s timeout, falling back to the text heuristic
on any failure (formula.py:147-152).

In the engine the strategy object is serialized into a mapInPandas closure
(executor-side batch post-processing of detected formulas). Network calls
from executors are disabled in this sandbox, so MathpixOCR here constructs
the same request payload but never sends it — it returns None, which takes
the reference's documented fallback path (heuristic LaTeX). Tests inject a
deterministic FakeOCR to exercise the seam.
"""

from __future__ import annotations

import base64
from abc import ABC, abstractmethod
from typing import Iterator, Optional


class ExternalOCR(ABC):
    """Strategy interface (ocr.py:7-22)."""

    @abstractmethod
    def image_to_latex(self, image_bytes: bytes) -> Optional[str]:
        """Return LaTeX for the formula image, or None to fall back."""


class MathpixOCR(ExternalOCR):
    """Mathpix-shaped strategy (ocr.py:24-69). Builds the documented
    request (base64 PNG payload, 10s timeout) but performs no network I/O
    in this environment — always returns None (heuristic fallback)."""

    URL = "https://api.mathpix.com/v3/text"
    TIMEOUT_S = 10

    def __init__(self, app_id: str = "", app_key: str = ""):
        self.app_id = app_id
        self.app_key = app_key

    def build_request(self, image_bytes: bytes) -> dict:
        return {
            "url": self.URL,
            "headers": {"app_id": self.app_id, "app_key": self.app_key},
            "json": {
                "src": "data:image/png;base64," + base64.b64encode(image_bytes).decode(),
                "formats": ["latex_styled"],
            },
            "timeout": self.TIMEOUT_S,
        }

    def image_to_latex(self, image_bytes: bytes) -> Optional[str]:
        # Network disabled by design; reference semantics on failure:
        # return None → caller falls back to the heuristic.
        return None


class DebugOCR(ExternalOCR):
    """Deterministic strategy for tests/debugging: tags the output with the
    image fingerprint so the OCR-wins-over-heuristic path is observable."""

    def image_to_latex(self, image_bytes: bytes) -> Optional[str]:
        return f"\\ocr{{{image_bytes[:2].hex()}}}"


def formula_image_stub(
    conv_id: str, turn_idx: int, page_num: int, formula_index: int
) -> bytes:
    """F8 stand-in (formula.py:131-142 renders the bbox+2pt region at 3×
    into PNG bytes). No rasterizer exists in this container, so the bytes
    are a deterministic function of the formula key — the BinaryType
    plumbing (schema, batching, OCR input) is real, the pixels are not."""
    seed = f"fimg:{conv_id}:{turn_idx}:{page_num}:{formula_index}".encode()
    import hashlib

    return hashlib.sha256(seed).digest()


def apply_ocr(formulas_df, strategy: Optional[ExternalOCR]):
    """Executor-side OCR pass over detected formulas: attaches the F8 image
    bytes and replaces ``latex`` when the strategy yields one (reference
    formula.py:145-152: OCR result wins, heuristic remains the fallback).
    With strategy=None the input is returned unchanged (pure-native path).
    """
    if strategy is None:
        return formulas_df

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            images, latexes = [], []
            for conv_id, turn_idx, page_num, fi, latex in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["page_num"],
                pdf["formula_index"], pdf["latex"],
            ):
                img = formula_image_stub(conv_id, int(turn_idx), int(page_num), int(fi))
                got = strategy.image_to_latex(img)
                images.append(img)
                latexes.append(got if got else latex)
            out = pdf.copy()
            out["latex"] = latexes
            out["image_bytes"] = images
            yield out

    ddl = (
        "conv_id string, turn_idx int, formula_index int, page_num int, "
        "bbox array<double>, formula_text string, latex string, "
        "confidence double, image_bytes binary"
    )
    return formulas_df.mapInPandas(kernel, schema=ddl)
