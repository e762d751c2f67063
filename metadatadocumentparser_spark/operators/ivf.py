"""IVF (inverted-file) approximate nearest neighbor — the scale path
complementing the LSH variant in operators/similarity.py.

Coarse quantizer: n_list deterministic centroids (vectors sampled by id
stride — at 100 TB you would train k-means on a sample; deterministic
sampling keeps this reproducible without an iterative driver loop).
Corpus vectors are assigned to their nearest centroid (one vectorized
numpy pass inside mapInPandas — a 64-dim × n_list matmul per Arrow batch);
queries probe the n_probe nearest lists and score only those lists'
members. Candidate set shrinks ~n_list/n_probe-fold versus brute force.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _centroids(emb_rows, n_list: int):
    """n_list unit-normalized centroids from id-stride sampling."""
    if not emb_rows:
        raise ValueError(
            "ivf_cosine_topk: empty corpus — no vectors to seed centroids "
            "from (an unguarded np.linalg.norm would raise an opaque axis "
            "error executor-side instead)"
        )
    mat = np.array([r[1] for r in emb_rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _assign_kernel(cents: np.ndarray, n_probe: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (vecs / norms) @ cents.T  # (batch, n_list)
            order = np.argsort(-sims, axis=1)[:, :n_probe]
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_probe),
                    "list_id": order.reshape(-1).astype("int32"),
                    "probe_rank": np.tile(np.arange(n_probe, dtype="int32"), len(pdf)),
                }
            )
            yield out

    return kernel


# ceiling on n_list: the centroid seed collects n_list*50 vectors to the
# driver (a 64-dim float64 vector ≈ 0.5 KB ⇒ 8192*50 ≈ 200 MB, the most a
# driver collect should ever hold). More lists than this need a distributed
# coarse quantizer (k-means via Pandas-UDF Lloyd rounds), not a bigger
# collect — fail loudly instead of OOMing the driver.
MAX_N_LIST = 8192


def ivf_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_list: int = 16,
    n_probe: int = 4,
    centroids=None,
) -> DataFrame:
    """Same output shape as similarity.cosine_topk (qid, rank, nid, cosine);
    recall < 1 by design (candidates limited to probed lists).

    ``centroids``: optional pre-trained (n_list, dim) array — pass
    ``kmeans_fit(...)["centroids"]`` (operators/kmeans.py) to replace the
    id-stride seed with Lloyd-trained lists (tighter lists → better
    recall at the same n_probe; also the only path past MAX_N_LIST's
    driver-collect budget, since k-means keeps only k×dim driver state)."""
    if centroids is not None:
        import numpy as _np

        cents = _np.asarray(centroids, dtype=_np.float64)
        norms = _np.linalg.norm(cents, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = cents / norms
        n_list = cents.shape[0]
    elif n_list > MAX_N_LIST:
        # same fail-loud pattern as similarity's exact-near-dup cap
        raise ValueError(
            f"ivf_cosine_topk: n_list={n_list} exceeds MAX_N_LIST="
            f"{MAX_N_LIST}: the coarse-quantizer seed collects n_list*50 "
            f"vectors to the driver; beyond this train centroids "
            f"distributed (operators/kmeans.kmeans_fit) and pass them via "
            f"centroids= instead of raising the cap"
        )
    else:
        # deterministic centroid sample: every (count/n_list)-th vector by id
        sample = (
            emb.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
            .orderBy("i")
            .limit(n_list * 50)
        ).collect()
        stride = max(1, len(sample) // n_list)
        cents = _centroids([(r.i, r.v) for r in sample[::stride][:n_list]], n_list)

    # n_probe > n_list means probe-all; unclamped, the assign kernel's
    # argsort slice has n_list columns while repeat() assumes n_probe —
    # a pandas length-mismatch crash in every task (r5 review, the
    # ivfpq_topk clamp's sibling)
    n_probe = min(n_probe, n_list)
    from .similarity import _check_query_count

    _check_query_count(queries, "ivf_cosine_topk")

    e = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    assign_c = e.mapInPandas(
        _assign_kernel(cents, 1), schema="vec_id bigint, list_id int, probe_rank int"
    ).select("vec_id", "list_id")
    corpus = e.join(assign_c, "vec_id").select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"), "list_id"
    )

    q = queries.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    assign_q = q.mapInPandas(
        _assign_kernel(cents, n_probe), schema="vec_id bigint, list_id int, probe_rank int"
    ).select(F.col("vec_id").alias("qid"), "list_id")
    qv = q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))

    from .similarity import cosine_expr

    cand = (
        F.broadcast(assign_q)
        .join(corpus, "list_id")
        .join(F.broadcast(qv), "qid")
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            cosine_expr(F.col("qv"), F.col("nv")).alias("cosine"),
        )
        # no distinct: every corpus vector lives in exactly ONE list
        # (assign n_probe=1) and a query probes n_probe DISTINCT lists
        # (argsort row), so (qid, nid) candidates are already unique —
        # a distinct here would be a full extra shuffle of the scored
        # candidate set (tests/test_fingerprint_ivf.py asserts uniqueness)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cosine")
    )
