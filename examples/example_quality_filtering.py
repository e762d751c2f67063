"""Quality filtering three ways — the pluggable gates a production
corpus prep stacks, each over the same documents table:

1. Gopher repetition signals (operators/quality): native statistical
   gates — duplicate-word / top-n-gram / duplicated-n-gram character
   fractions (Rae et al. 2021 §A1.1).
2. Heuristic classifier (operators/classifier): lang-ID + quality score
   as pure Catalyst expressions — the zero-cost default.
3. CCNet-style LM perplexity (operators/lm): a stupid-backoff n-gram LM
   trained ON the corpus itself; documents far from the corpus
   distribution (token salad, boilerplate soup) score high
   log-perplexity (Wenzek et al. 2020).

The three compose through one seam: corpus_prep(repetition_max=...,
quality_min=..., quality_model=...) — swap LMClassifier for a fastText/
DCLM-style TextClassifier without touching the pipeline.

Run: PYTHONPATH=. python examples/example_quality_filtering.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadatadocumentparser_spark.operators.classifier import classify_documents
from metadatadocumentparser_spark.operators.lm import (
    LMClassifier,
    perplexity_score,
    train_ngram_lm,
)
from metadatadocumentparser_spark.operators.quality import repetition_signals
from metadatadocumentparser_spark.session import get_spark
from metadatadocumentparser_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    # plant two pathological docs among the real ones
    planted = docs.select("doc_id", "text", "lang").unionByName(
        spark.createDataFrame(
            [
                (9_000_001, "spam " * 60 + "tail", "en"),               # repetition
                (9_000_002, " ".join(f"zq{i}x" for i in range(40)), "en"),  # token salad
            ],
            "doc_id bigint, text string, lang string",
        )
    )

    # 1. Gopher repetition: the spam doc maxes dup_word
    rep = repetition_signals(planted, "doc_id", "text")
    worst = rep.orderBy(F.desc("dup_word_e4")).first()
    print(f"[gopher] worst dup_word doc: {worst.id} (dup_word_e4={worst.dup_word_e4})")

    # 2. heuristic classifier (native plan — no Python stage)
    heur = classify_documents(planted, "doc_id", "text")
    print("[heuristic] sample:", heur.orderBy("id").limit(3).collect())

    # 3. LM perplexity: train on the REAL corpus, score everything
    lm = train_ngram_lm(docs, "text", n=3)
    scored = perplexity_score(planted, "doc_id", "text", lm)
    med = scored.where(F.col("id") < 9_000_000).agg(
        F.expr("percentile(log_ppl, 0.5)")
    ).collect()[0][0]
    outliers = scored.where(F.col("log_ppl") > med + 1.0).orderBy(F.desc("log_ppl"))
    print(f"[lm] corpus median log-ppl {med:.3f}; outliers:")
    outliers.show(5)

    # the same model as a corpus_prep-pluggable classifier
    cls = LMClassifier(lm)
    print("[lm-classifier]", cls.classify(["the fast key order sort", "zq0x zq1x zq2x"]))
    spark.stop()


if __name__ == "__main__":
    main()
