"""Stupid-backoff n-gram LM (operators/lm.py): exact distributed
counts, Spark-vs-python score agreement, backoff-path hand checks,
gibberish separation, and the corpus_prep classifier-gate integration."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from metadatadocumentparser_spark.operators import lm as lmod
from metadatadocumentparser_spark.operators.lm import (
    ALPHA,
    LMClassifier,
    perplexity_score,
    top_ngrams,
    train_ngram_lm,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(SF_DOCS).select("doc_id", "text").localCheckpoint()


@pytest.fixture(scope="module")
def lm(corpus):
    return train_ngram_lm(corpus, "text", n=3)


def test_counts_exact(spark, corpus, lm):
    """Every count table equals a brute-force python Counter over the
    same tokenization; total == token count."""
    texts = [r.text for r in corpus.collect()]
    toks = [t.split() for t in texts]
    for k in (1, 2, 3):
        exp = Counter(
            " ".join(ts[i : i + k]) for ts in toks for i in range(len(ts) - k + 1)
        )
        got = {r.g: r.c for r in lm["counts"][k].collect()}
        assert got == dict(exp), f"order {k}"
    assert lm["total"] == sum(len(ts) for ts in toks)
    # top_ngrams is the (count desc, gram) head of the real table
    top = [(r.g, r.c) for r in top_ngrams(lm, 3, k=10).collect()]
    assert top == sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]


def test_spark_score_matches_python_mirror(spark, corpus, lm):
    """The join-based perplexity_score equals LMClassifier's in-memory
    scoring loop on every doc (the only divergence channel is ln()'s
    last ulp — tolerance 1e-9)."""
    got = {r.id: (r.n_tokens, r.log_ppl)
           for r in perplexity_score(corpus, "doc_id", "text", lm).collect()}
    cls = LMClassifier(lm)
    for r in corpus.collect():
        n, lp = got[r.doc_id]
        assert n == len(r.text.split())
        assert abs(lp - cls.log_ppl(r.text)) < 1e-9
    # repartition invariance of the distributed path
    got2 = {r.id: r.log_ppl for r in perplexity_score(
        corpus.repartition(13), "doc_id", "text", lm).collect()}
    assert all(abs(got2[i] - got[i][1]) < 1e-12 for i in got2)


def test_backoff_paths_hand_computed(spark):
    """Tiny corpus exercising every CASE branch: seen trigram, trigram
    backoff to bigram, bigram backoff to unigram, OOV floor, and the
    no-penalty start-of-doc orders."""
    train = spark.createDataFrame([(0, "a b c a b d")], "doc_id bigint, text string")
    model = train_ngram_lm(train, "text", n=3)
    q = spark.createDataFrame([(1, "a b c"), (2, "c a b"), (3, "z z")],
                              "doc_id bigint, text string")
    got = {r.id: r.log_ppl for r in perplexity_score(q, "doc_id", "text", model).collect()}
    N = 6.0
    # doc 1: S(a)=2/6; S(b|a)=c(ab)/c(a)=2/2; S(c|ab)=c(abc)/c(ab)=1/2
    exp1 = -(math.log(2 / N) + math.log(1.0) + math.log(0.5)) / 3
    # doc 2: S(c)=1/6; S(a|c)=c(ca)/c(c)=1/1; S(b|ca)=c(cab)/c(ca)=1/1
    exp2 = -(math.log(1 / N) + math.log(1.0) + math.log(1.0)) / 3
    # doc 3: S(z)=1/6 floor; S(z|z)=alpha*S(z)=alpha/6 (bi and ctx unseen)
    exp3 = -(math.log(1 / N) + math.log(ALPHA * (1 / N))) / 2
    assert abs(got[1] - exp1) < 1e-12
    assert abs(got[2] - exp2) < 1e-12
    assert abs(got[3] - exp3) < 1e-12
    # trigram backoff chain: "a b a" — trigram 'a b a' unseen with seen
    # ctx 'a b', and the bigram fallback 'b a' is ALSO unseen, so
    # S(a|ab) = alpha * S(a|b) = alpha * (alpha * c(a)/N) = alpha^2/3
    q2 = spark.createDataFrame([(4, "a b a")], "doc_id bigint, text string")
    lp = perplexity_score(q2, "doc_id", "text", model).collect()[0].log_ppl
    exp4 = -(math.log(2 / N) + math.log(1.0) + math.log(ALPHA * ALPHA * (2 / N))) / 3
    assert abs(lp - exp4) < 1e-12


def test_gibberish_scores_higher(spark, corpus, lm):
    """CCNet's premise on this corpus: token-salad text far from the
    training distribution scores higher log-perplexity than every real
    doc's median."""
    real = perplexity_score(corpus, "doc_id", "text", lm)
    med = real.agg(F.expr("percentile(log_ppl, 0.5)")).collect()[0][0]
    gib = spark.createDataFrame(
        [(999999, " ".join(f"zq{i}x" for i in range(40)))],
        "doc_id bigint, text string",
    )
    gp = perplexity_score(gib, "doc_id", "text", lm).collect()[0].log_ppl
    assert gp > med + 1.0  # OOV floor + backoff penalties dominate


def test_lm_classifier_gate_in_corpus_prep(spark, corpus, lm):
    """LMClassifier plugs into the corpus_prep quality gate: planted
    gibberish docs are dropped by perplexity, real docs survive."""
    from metadatadocumentparser_spark.plans import corpus_prep

    cls = LMClassifier(lm)
    q_real = min(c[1] for c in cls.classify(
        [r.text for r in corpus.collect()]))
    # per-doc DISTINCT gibberish (identical texts would be emptied by
    # the paragraph-dedup stage before the gate ever sees them)
    gib_rows = [(1_000_000 + i, " ".join(f"qzx{j}w{i}" for j in range(30)), "en")
                for i in range(5)]
    docs = corpus.select("doc_id", "text", F.lit("en").alias("lang")).unionByName(
        spark.createDataFrame(gib_rows, "doc_id bigint, text string, lang string")
    )
    out = corpus_prep(
        docs, docs.limit(0), rates={}, default_rate=1.0, capacity=1200,
        n_shards=8, quality_min=q_real, quality_model=cls,
    )
    stats = out["stats"].collect()[0]
    surv = {r.id for r in out["docs"].select("id").collect()}
    assert stats.n_classifier_dropped >= 5
    assert not any(i >= 1_000_000 for i in surv)


def test_lm_guards(spark, corpus, lm, monkeypatch):
    """MAX_LM_ENTRIES fail-loud; zero-token docs score 0.0; n guard;
    order-3 contract enforced at LMClassifier construction (r5 review:
    an n=2 model used to KeyError mid-scoring); non-ASCII whitespace
    tokenizes identically on the python and Spark paths (r5 review:
    str.split also splits NBSP, Java \\s does not)."""
    monkeypatch.setattr(lmod, "MAX_LM_ENTRIES", 10)
    with pytest.raises(ValueError, match="MAX_LM_ENTRIES"):
        LMClassifier(lm)
    monkeypatch.undo()
    with pytest.raises(ValueError, match="order-3"):
        LMClassifier(train_ngram_lm(corpus.limit(20), "text", n=2))
    # NBSP inside a "word": one token on BOTH paths
    nb = spark.createDataFrame(
        [(1, "the\u00a0fast key order")], "doc_id bigint, text string"
    )
    sp = perplexity_score(nb, "doc_id", "text", lm).collect()[0]
    cls = LMClassifier(lm)
    assert sp.n_tokens == 3
    assert abs(sp.log_ppl - cls.log_ppl("the\u00a0fast key order")) < 1e-9
    empty = spark.createDataFrame([(1, ""), (2, None)], "doc_id bigint, text string")
    got = {r.id: (r.n_tokens, r.log_ppl)
           for r in perplexity_score(empty, "doc_id", "text", lm).collect()}
    assert got == {1: (0, 0.0), 2: (0, 0.0)}
    with pytest.raises(ValueError, match="n must be"):
        train_ngram_lm(corpus, "text", n=0)
