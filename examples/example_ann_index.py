"""ANN index walkthrough — the four search strategies over one embedding
corpus, from exact to billion-scale, with measured recall at this corpus:

1. brute-force cosine top-k   — the ground truth (reads every float),
2. IVF                        — k-means lists, probe a few (reads probed
                                lists' floats),
3. PQ + rerank                — 32×-compressed codes, ADC shortlist,
                                floats only for the shortlist,
4. IVF-PQ + rerank            — lists + residual codes: the composition
                                FAISS ships as IVFPQ (reads probed lists'
                                CODES, floats only for the shortlist).

Run: PYTHONPATH=. python examples/example_ann_index.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadatadocumentparser_spark.operators.ivf import ivf_cosine_topk
from metadatadocumentparser_spark.operators.ivfpq import (
    ivfpq_build,
    ivfpq_topk_rerank,
)
from metadatadocumentparser_spark.operators.kmeans import kmeans_fit
from metadatadocumentparser_spark.operators.pq import (
    pq_encode,
    pq_fit,
    pq_topk_rerank,
)
from metadatadocumentparser_spark.operators.similarity import cosine_topk
from metadatadocumentparser_spark.session import get_spark
from metadatadocumentparser_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
K = 10


def main():
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)

    truth = {}
    for r in cosine_topk(emb, queries, k=K).collect():
        truth.setdefault(r.qid, set()).add(r.nid)

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.qid, set()).add(r.nid)
        return sum(len(truth[q] & got.get(q, set())) for q in truth) / (K * len(truth))

    print(f"brute-force cosine: recall 1.00 (definitionally)")

    # IVF: trained lists via distributed k-means
    cents = kmeans_fit(emb, k=8, max_iter=5)["centroids"]
    ivf = ivf_cosine_topk(emb, queries, k=K, n_probe=4, centroids=cents)
    print(f"IVF (8 lists, probe 4): recall {recall(ivf):.2f}")

    # PQ: 32x-compressed codes + ADC shortlist + exact rerank
    books = pq_fit(emb, m=16, k=64, max_iter=5)
    codes = pq_encode(emb, books)
    pq = pq_topk_rerank(codes, emb, queries, books, k=K, shortlist=50)
    print(f"PQ (m=16, k=64) + rerank-50: recall {recall(pq):.2f}")

    # IVF-PQ: lists + residual codes
    idx = ivfpq_build(emb, n_list=8, m=16, k=32, max_iter=5)
    ipq = ivfpq_topk_rerank(idx, emb, queries, k=K, n_probe=8, shortlist=100)
    print(f"IVF-PQ (8 lists, probe-all, rerank-100): recall {recall(ipq):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
