"""Content-defined chunking (CDC) — split documents at rolling-hash
boundaries so chunk edges track CONTENT, not byte offsets: inserting a
paragraph shifts every fixed-size chunk after it, but leaves all
content-defined chunks except the touched one intact. That makes
chunk-level dedup (chunk_md5 groupBy) robust to insertions — the standard
trick from dedup storage systems (LBFS, Muthitacharoen et al. SOSP'01),
applied here to training-corpus near-dup removal at sub-document grain.

Boundary rule (pure content-defined, reproducible in SQL — no min/max
smoothing state): a cut occurs after the K-gram starting at position i
when rolling_hash_i % DIVISOR == 0; expected chunk length ≈ DIVISOR chars.
Texts shorter than K form one whole-text chunk.

The hash scan is the vectorized numpy kernel shared with winnowing
(fingerprint.rolling_hashes) inside mapInPandas — Arrow-batched, no
per-row Python in the hot path beyond the per-doc slice loop. Chunk rows
are (id, chunk_idx, start, len, chunk_md5); dedup is then a plain
groupBy(chunk_md5) — linear, map-side combinable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fingerprint import K, rolling_hashes

DIVISOR = 64

CHUNK_DDL = "id bigint, chunk_idx int, start bigint, len bigint, chunk_md5 string"


def _chunks_one(text: str) -> list[tuple[int, int]]:
    """(start, end) 0-based char segments of one document."""
    n = len(text)
    if n == 0:
        return []
    hashes = rolling_hashes(text)
    if hashes.size == 0:
        return [(0, n)]
    cuts = np.nonzero(hashes % np.uint64(DIVISOR) == 0)[0]
    starts = [0] + [int(c) + K for c in cuts if int(c) + K < n]
    return list(zip(starts, starts[1:] + [n]))


def content_defined_chunks(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exploded chunk table (id, chunk_idx, start, len, chunk_md5)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, lens, md5s = [], [], [], [], []
            for i, t in zip(pdf["id"], pdf["t"]):
                text = t if isinstance(t, str) else ""
                for ci, (s, e) in enumerate(_chunks_one(text)):
                    ids.append(i)
                    idxs.append(ci)
                    starts.append(s)
                    lens.append(e - s)
                    md5s.append(hashlib.md5(text[s:e].encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "start": pd.Series(starts, dtype="int64"),
                    "len": pd.Series(lens, dtype="int64"),
                    "chunk_md5": pd.Series(md5s, dtype="object"),
                }
            )

    from ._util import ensure_min_parallelism

    # 2 MiB floor: the CDC kernel is a cheap vectorized-numpy pass, so on
    # tiny under-split inputs the guard's shuffle costs MORE than the
    # serial map side (measured: 0.66 s vs 0.93 s on the 0.6 MB bench
    # corpus — the round-3 cdc_chunks regression, BENCH.md round 4);
    # contrast with_shingles' md5-heavy kernel which keeps min_bytes=0.
    # r6: floor lowered 16 MiB → 2 MiB — a single-file ~6 MB corpus (the
    # sf1.0 documents table) sat under the old floor and ran the whole
    # kernel on one core; at ≥2 MB the serial kernel costs well over the
    # ~0.3 s the repartition adds
    src = ensure_min_parallelism(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")),
        min_bytes=2 << 20,
    )
    return src.mapInPandas(kernel, schema=CHUNK_DDL)


def chunk_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Chunk-level exact dedup: one row per repeated chunk content —
    (chunk_md5, cnt, keeper_id, keeper_idx). Chunks appearing once are
    omitted (they need no dedup decision)."""
    ch = content_defined_chunks(df, id_col, text_col)
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.struct("id", "chunk_idx")).alias("k"),
        )
        .where(F.col("cnt") > 1)
        .select(
            "chunk_md5",
            "cnt",
            F.col("k.id").alias("keeper_id"),
            F.col("k.chunk_idx").alias("keeper_idx"),
        )
    )
