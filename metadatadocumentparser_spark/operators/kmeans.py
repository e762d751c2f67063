"""Distributed k-means (Lloyd) over an embedding column — the coarse-
quantizer training path that ivf_cosine_topk's MAX_N_LIST guard points at:
id-stride seeding caps n_list at what a driver collect holds, while Lloyd
rounds keep only (k × dim) centroid state on the driver regardless of
corpus size.

Plan shape per round (the part that must survive 100 TB):
- assignment: one mapInPandas pass — a (batch × k) matmul against the
  broadcast centroid matrix; no shuffle.
- centroid update: the SAME kernel emits per-batch PARTIAL sums — k rows
  of (cluster, sum_vector, count) per Arrow batch — so the explode that
  follows is bounded by (batches × k × dim), independent of corpus rows;
  one tiny (cluster, dim) groupBy finishes the mean. This is the map-side
  combine the naive posexplode-every-row plan (n × dim shuffle rows)
  lacks.
- the k × dim means are collected (bounded driver state, same budget the
  IVF seed already spends) and broadcast into the next round's kernel.

Determinism: seeding is md5-ordered (engine/partitioning-independent);
per-round assignments are argmin with lowest-index tie-break. Centroid
coordinates can differ across partitionings in final ulps (FP sum order),
so tests assert assignment equality on separated data and coordinate
closeness, not byte equality — documented, not hidden.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_K = 8192  # same driver-collect budget as ivf.MAX_N_LIST


def _seed_centroids(emb: DataFrame, id_col: str, vec_col: str, k: int) -> np.ndarray:
    """k deterministic seeds: the k vectors with the smallest md5(id) —
    an order-free, partitioning-free uniform sample (same md5-uniform
    TRICK as sampling.sample_uniform, but deliberately NOT the same
    formula: this hashes md5(id) raw where sample_uniform hashes
    md5('salt:id'). The difference is load-bearing — the pytest numpy
    replicas and every trained-model determinism pin replay exactly
    this ordering, so unifying the two would silently change every
    trained centroid/codebook; noted per the one-definition convention
    in quality.split_column."""
    rows = (
        emb.select(F.col(vec_col).alias("v"), F.md5(F.col(id_col).cast("string")).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"kmeans_fit: k={k} exceeds the corpus size {len(rows)}")
    return np.array([r.v for r in rows], dtype=np.float64)


def _finite_or_raise(vecs: np.ndarray, op: str) -> None:
    """A NaN/Inf element would silently poison every centroid mean and
    every distance it touches — fail loudly instead (same posture as
    quantize's NULL handling, but k-means has no per-element NULL story:
    a partial vector has no position in the space)."""
    if vecs.size and not np.isfinite(vecs).all():
        raise ValueError(
            f"{op}: non-finite embedding element (NaN/Inf) — clean or drop "
            f"these rows upstream (quantize_embeddings maps them to NULL; "
            f"k-means cannot place them)"
        )


def _round_kernel(cents: np.ndarray):
    k, dim = cents.shape

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            ).reshape(len(pdf), dim)
            _finite_or_raise(vecs, "kmeans_fit")
            d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # argmin = lowest index on ties
            clusters, counts = np.unique(assign, return_counts=True)
            sums = np.zeros((len(clusters), dim))
            for j, c in enumerate(clusters):
                sums[j] = vecs[assign == c].sum(axis=0)
            yield pd.DataFrame(
                {
                    "cluster": clusters.astype("int32"),
                    "psum": list(sums),
                    "cnt": counts.astype("int64"),
                }
            )

    return kernel


def _assign_kernel(cents: np.ndarray):
    k, dim = cents.shape

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            ).reshape(len(pdf), dim)
            _finite_or_raise(vecs, "kmeans assignment")
            d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {"id": pdf["id"], "cluster": d2.argmin(axis=1).astype("int32")}
            )

    return kernel


def kmeans_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> dict:
    """Lloyd's algorithm; returns {"centroids": (k, dim) ndarray,
    "assignments": DataFrame (id, cluster), "n_iter": rounds run,
    "converged": max centroid shift ≤ tol before max_iter}.

    Empty clusters keep their previous centroid (k never shrinks —
    deterministic, and the IVF consumer requires exactly n_list lists).
    """
    if k > MAX_K:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds MAX_K={MAX_K}: per-round centroid "
            f"state is k×dim driver-side — shard the corpus or reduce k"
        )
    src = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).localCheckpoint(eager=True)  # one corpus materialization, reused per round
    cents = _seed_centroids(src, "id", "v", k)
    dim = cents.shape[1]

    converged, it = False, 0
    for it in range(1, max_iter + 1):
        partial = src.mapInPandas(
            _round_kernel(cents),
            schema="cluster int, psum array<double>, cnt bigint",
        )
        # (batches × k) partial rows → (cluster, dim) means: tiny shuffle
        stats = (
            partial.select(
                "cluster", "cnt", F.posexplode("psum").alias("d", "s")
            )
            .groupBy("cluster", "d")
            .agg(F.sum("s").alias("s"), F.sum("cnt").alias("n"))
            .collect()
        )
        new = cents.copy()  # empty clusters keep their centroid
        acc = {}
        for r in stats:
            acc.setdefault(r.cluster, [np.zeros(dim), 0])
            acc[r.cluster][0][r.d] = r.s
            acc[r.cluster][1] = r.n
        for c, (s, n) in acc.items():
            new[c] = s / n
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift <= tol:
            converged = True
            break
    assignments = src.mapInPandas(
        _assign_kernel(cents), schema="id bigint, cluster int"
    )
    return {
        "centroids": cents,
        "assignments": assignments,
        "n_iter": it,
        "converged": converged,
    }
