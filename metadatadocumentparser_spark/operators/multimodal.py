"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as BinaryType columns with a struct of typed
metadata (the reference's ImageData shape, image.py:32-41 /
data_types.py:15-25). The Spark-side plumbing — schema, Arrow batch shape,
mapInPandas signature, partition sizing — is real and tested; the actual
codec step is STUBBED (no image/audio libraries in this container):
``decode_images(..., fake=False)`` raises NotImplementedError, while
``fake=True`` substitutes a deterministic byte-statistics feature vector so
downstream plumbing (resize targets, feature joins) can be exercised.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES_DDL = (
    "conv_id string, turn_idx int, page_num int, image_index int, "
    "width int, height int, ext string, n_bytes bigint, features array<float>"
)


def attach_image_bytes(images: DataFrame) -> DataFrame:
    """Deterministic synthetic payload bytes derived from the image key
    (the reference stores real extract_image() bytes; here the bytes column
    is exercised end-to-end with a stable stand-in)."""
    return images.withColumn(
        "image_bytes",
        F.to_binary(
            F.md5(F.concat_ws(":", "conv_id", "turn_idx", "page_num", "image_index")),
            F.lit("hex"),
        ),
    )


def decode_images(images_with_bytes: DataFrame, fake: bool = False, n_features: int = 8) -> DataFrame:
    """binary → feature vector via Arrow-batched mapInPandas.

    fake=False: NotImplementedError (codec libs absent by design).
    fake=True: deterministic per-byte histogram features (float32).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires a codec library not present in this "
                    "environment; run with fake=True for plumbing tests"
                )
            feats = []
            for blob in pdf["image_bytes"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr % n_features, minlength=n_features).astype(np.float32)
                total = float(arr.size) if arr.size else 1.0
                feats.append((hist / total).tolist())
            out = pdf[
                ["conv_id", "turn_idx", "page_num", "image_index", "width", "height", "ext"]
            ].copy()
            out["n_bytes"] = [len(bytes(b)) for b in pdf["image_bytes"]]
            out["features"] = feats
            yield out

    return images_with_bytes.mapInPandas(kernel, schema=FEATURES_DDL)
