"""Winnowing fingerprints + IVF ANN: determinism, overlap detection,
recall vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadatadocumentparser_spark.operators.fingerprint import (
    _winnow_one,
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from metadatadocumentparser_spark.operators.ivf import ivf_cosine_topk
from metadatadocumentparser_spark.operators.similarity import cosine_topk
from metadatadocumentparser_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_winnow_pure():
    a = _winnow_one("the quick brown fox jumps over the lazy dog " * 4)
    assert a == _winnow_one("the quick brown fox jumps over the lazy dog " * 4)
    assert len(a) > 0
    assert _winnow_one("short") == []
    # shared substring ⇒ shared fingerprints
    doc1 = "prefix AAA " + "common shared passage of text here " * 3 + "tail one"
    doc2 = "other start " + "common shared passage of text here " * 3 + "different"
    assert set(_winnow_one(doc1)) & set(_winnow_one(doc2))


def test_winnow_spark(spark):
    docs = load_table(spark, SF, "documents")
    fp = winnow_fingerprints(docs, "doc_id", "text")
    assert fp.count() > 0
    # deterministic across partitionings
    a = sorted(map(tuple, fp.collect()))
    b = sorted(map(tuple, winnow_fingerprints(docs.repartition(7), "doc_id", "text").collect()))
    assert a == b
    pairs = winnow_overlap_pairs(docs, "doc_id", "text", min_shared=2)
    assert pairs.count() >= 0
    assert set(pairs.columns) == {"id_a", "id_b", "shared"}


def test_ivf_recall(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    brute = {(r.qid, r.nid) for r in cosine_topk(emb, q, k=5).collect()}
    ivf = {(r.qid, r.nid) for r in ivf_cosine_topk(emb, q, k=5, n_list=8, n_probe=4).collect()}
    # probing half the lists should recover a solid share of true neighbors
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.4, recall
    # ivf output shape matches the brute-force contract
    r = ivf_cosine_topk(emb, q, k=3, n_list=8, n_probe=8)  # probe-all ⇒ exact
    exact = {(x.qid, x.rank, x.nid) for x in cosine_topk(emb, q, k=3).collect()}
    assert {(x.qid, x.rank, x.nid) for x in r.collect()} == exact


def test_ivf_candidates_unique(spark):
    """(qid, nid) candidates are unique by construction — one list per
    corpus vector, distinct probed lists per query — which is why
    ivf_cosine_topk carries no .distinct() (it would be a full extra
    shuffle of the scored candidate set)."""
    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    out = ivf_cosine_topk(emb, q, k=10**9, n_list=8, n_probe=4)
    rows = out.select("qid", "nid").collect()
    assert len(rows) == len({(r.qid, r.nid) for r in rows})


# ---------------------------------------------------------------- CDC chunking
def test_cdc_chunks_tile_document():
    """Chunks must tile the document exactly: contiguous, in order, full
    coverage; and boundaries are content-defined (insertion shifts only
    the touched chunk's neighborhood, not everything after it)."""
    from metadatadocumentparser_spark.operators.chunking import _chunks_one

    # varied text (a periodic string has too few distinct k-grams to hit
    # the divisor): ~2000 chars of deterministic pseudo-random words
    text = " ".join(f"w{i * 7919 % 1000}" for i in range(400))
    segs = _chunks_one(text)
    assert segs[0][0] == 0 and segs[-1][1] == len(text)
    assert all(segs[i][1] == segs[i + 1][0] for i in range(len(segs) - 1))
    assert len(segs) > 5  # divisor 64 over ~2000 varied chars must cut

    # content-defined robustness: prepend a paragraph; the chunk CONTENT
    # set far from the edit is preserved (fixed-size chunking would shift
    # every boundary)
    edited = "completely new intro paragraph. " + text
    h0 = {text[s:e] for s, e in segs[2:]}
    h1 = {edited[s:e] for s, e in _chunks_one(edited)}
    assert len(h0 & h1) >= len(h0) - 2

    # degenerate inputs
    assert _chunks_one("") == []
    assert _chunks_one("short") == [(0, 5)]


def test_quantized_ann_rank_agreement(spark):
    """Integration: brute-force top-k over int8-DEQUANTIZED embeddings
    recovers almost all true neighbors of the float corpus — the
    store-compressed/search-cheap path (4× smaller index, recall ≈ 1)."""
    from metadatadocumentparser_spark.operators.quantize import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    deq = dequantize_embeddings(quantize_embeddings(emb, "vec_id", "embedding")).select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    deq_q = deq.where(F.col("vec_id") < 5)
    true = {(r.qid, r.nid) for r in cosine_topk(emb, q, k=10).collect()}
    quant = {(r.qid, r.nid) for r in cosine_topk(deq, deq_q, k=10).collect()}
    recall = len(true & quant) / len(true)
    assert recall >= 0.9, recall


def test_ivf_n_list_guard(spark):
    """n_list beyond the driver-collect ceiling fails loudly with an
    actionable message (the seed collect is bounded; a 100k-list request
    must not become a silent driver OOM)."""
    import pytest
    from metadatadocumentparser_spark.operators.ivf import MAX_N_LIST, ivf_cosine_topk

    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="MAX_N_LIST"):
        ivf_cosine_topk(emb, emb.limit(1), n_list=MAX_N_LIST + 1)
