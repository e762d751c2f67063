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
    """Ensure an ``image_bytes`` column on an images table.

    The extraction schema now carries real payload bytes end-to-end
    (payload %%IMG hex / fitz extract_image → ImageRec.image_bytes →
    kernel images struct → images_of), so when the input already has the
    column, rows keep their kernel-produced bytes and only NULLs (sources
    that ship no payload) get the deterministic md5-of-key stand-in. Inputs
    without the column get the stand-in everywhere — same values either
    way, so features are byte-identical across ingestion paths."""
    synthetic = F.to_binary(
        F.md5(F.concat_ws(":", "conv_id", "turn_idx", "page_num", "image_index")),
        F.lit("hex"),
    )
    if "image_bytes" in images.columns:
        return images.withColumn(
            "image_bytes", F.coalesce(F.col("image_bytes"), synthetic)
        )
    return images.withColumn("image_bytes", synthetic)


MEDIA_BLOCK = 16  # bytes per md5 block in the synthetic payload chain


def attach_media_bytes(turns: DataFrame, kind: str, n_blocks: int = 4) -> DataFrame:
    """Deterministic synthetic media payload per turn: an md5 chain
    b_0 = md5(kind:conv:turn), b_i = md5(hex(b_{i-1})), concatenated to
    n_blocks·16 bytes. Real pipelines carry real codec bytes here; the
    chain gives every turn a stable multi-block binary column so the
    windowing/frame plumbing is exercised end-to-end."""
    seed = F.md5(F.concat_ws(":", F.lit(kind), "conv_id", "turn_idx"))
    blocks = [seed]
    for _ in range(n_blocks - 1):
        blocks.append(F.md5(blocks[-1]))
    return turns.withColumn(
        f"{kind}_bytes", F.to_binary(F.concat(*blocks), F.lit("hex"))
    )


def audio_window_energy(
    turns_with_audio: DataFrame, window: int = MEDIA_BLOCK
) -> DataFrame:
    """Audio feature-extraction plumbing: treat the binary column as
    unsigned 8-bit PCM samples and emit per-window RMS-style energy
    (mean((x-128)²), floor-half-up e4). The windowed-energy math is REAL
    (vectorized numpy over Arrow batches); only the payload is synthetic —
    a real deployment decodes its codec into the same sample array first.
    Output: (conv_id, turn_idx, window_idx, energy_e4), one row per full
    window."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            conv, turn, widx, energy = [], [], [], []
            for c, t, blob in zip(pdf["conv_id"], pdf["turn_idx"], pdf["audio_bytes"]):
                if blob is None:  # NULL payload: skip, never fail (r5 review)
                    continue
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                n_win = arr.size // window
                if n_win == 0:
                    continue
                x = arr[: n_win * window].astype(np.float64).reshape(n_win, window)
                e = ((x - 128.0) ** 2).mean(axis=1)
                for i, v in enumerate(e):
                    conv.append(c)
                    turn.append(t)
                    widx.append(i)
                    energy.append(int(np.floor(v * 10000.0 + 0.5)))
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv, dtype="object"),
                    "turn_idx": pd.Series(turn, dtype="int32"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "energy_e4": pd.Series(energy, dtype="int64"),
                }
            )

    return turns_with_audio.mapInPandas(
        kernel, schema="conv_id string, turn_idx int, window_idx int, energy_e4 bigint"
    )


def video_frame_sample(
    turns_with_video: DataFrame, frame_bytes: int = MEDIA_BLOCK, every_n: int = 2
) -> DataFrame:
    """Video frame-sampling plumbing: the binary column is segmented into
    fixed-size pseudo-frames and every ``every_n``-th frame is emitted with
    its content digest. The segmentation/sampling/digest plumbing (schema,
    Arrow batch shape, explode-style fan-out) is real; a real deployment
    replaces the fixed-size segmentation with codec keyframe boundaries —
    that decode step is the honestly-absent piece in this container.
    Output: (conv_id, turn_idx, frame_idx, frame_md5)."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            conv, turn, fidx, fmd5 = [], [], [], []
            for c, t, blob in zip(pdf["conv_id"], pdf["turn_idx"], pdf["video_bytes"]):
                if blob is None:  # NULL payload: skip, never fail (r5 review)
                    continue
                raw = bytes(blob)
                for i in range(0, len(raw) // frame_bytes, every_n):
                    frame = raw[i * frame_bytes : (i + 1) * frame_bytes]
                    conv.append(c)
                    turn.append(t)
                    fidx.append(i)
                    fmd5.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv, dtype="object"),
                    "turn_idx": pd.Series(turn, dtype="int32"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "frame_md5": pd.Series(fmd5, dtype="object"),
                }
            )

    return turns_with_video.mapInPandas(
        kernel, schema="conv_id string, turn_idx int, frame_idx int, frame_md5 string"
    )


def resize_images(
    images_with_bytes: DataFrame, target_w: int, target_h: int, fake: bool = False
) -> DataFrame:
    """Image resize plumbing: every image row re-emitted with the target
    dimensions and a resized payload. fake=False raises (no image codec in
    this container — same seam as decode_images); fake=True produces a
    deterministic stand-in payload by stride-subsampling the source bytes
    to ceil(target_w·target_h/256) bytes, so byte-count scaling, schema and
    Arrow batch shape are exercised end-to-end. Output adds
    (width, height, n_bytes, resized_md5) for the resized payload."""
    import hashlib
    import math as _math

    n_out = max(1, _math.ceil(target_w * target_h / 256))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires a codec library not present in this "
                    "environment; run with fake=True for plumbing tests"
                )
            out = pdf[["conv_id", "turn_idx", "page_num", "image_index", "ext"]].copy()
            md5s, nb = [], []
            for blob in pdf["image_bytes"]:
                raw = bytes(blob) if blob is not None else b""  # NULL == empty
                if len(raw) == 0:
                    md5s.append(hashlib.md5(b"").hexdigest())
                    nb.append(0)
                    continue
                idx = np.linspace(0, len(raw) - 1, num=min(n_out, len(raw)), dtype=np.int64)
                resized = bytes(np.frombuffer(raw, dtype=np.uint8)[idx].tobytes())
                md5s.append(hashlib.md5(resized).hexdigest())
                nb.append(len(resized))
            out["width"] = np.int32(target_w)
            out["height"] = np.int32(target_h)
            out["n_bytes"] = pd.Series(nb, dtype="int64")
            out["resized_md5"] = pd.Series(md5s, dtype="object")
            yield out

    return images_with_bytes.mapInPandas(
        kernel,
        schema=(
            "conv_id string, turn_idx int, page_num int, image_index int, "
            "ext string, width int, height int, n_bytes bigint, resized_md5 string"
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
                arr = np.frombuffer(
                    bytes(blob) if blob is not None else b"", dtype=np.uint8
                )
                hist = np.bincount(arr % n_features, minlength=n_features).astype(np.float32)
                total = float(arr.size) if arr.size else 1.0
                feats.append((hist / total).tolist())
            out = pdf[
                ["conv_id", "turn_idx", "page_num", "image_index", "width", "height", "ext"]
            ].copy()
            out["n_bytes"] = [
                len(bytes(b)) if b is not None else 0 for b in pdf["image_bytes"]
            ]
            out["features"] = feats
            yield out

    return images_with_bytes.mapInPandas(kernel, schema=FEATURES_DDL)
