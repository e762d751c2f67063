"""Fused corpus-preparation pipeline (plans/corpus_prep.py) — the round-4
composition of the operator suite in production order:

    redact PII → paragraph (C4 span) dedup → quality gates (Gopher
    repetition + pluggable classifier) → MinHash-LSH whole-doc dedup →
    exact-substring (Lee et al. ExactSubstr) span dedup → benchmark
    decontamination → stratified downsampling → FFD packing

versus examples/example_training_pipeline.py (which demonstrates each
operator with a count per stage), this is the fused form a real run uses:
the corpus parquet is scanned exactly ONCE, stage survivors come from one
aggregation, and the final outputs' executed plans contain zero file
scans (plans.file_scan_count; asserted in tests/test_corpus_prep.py,
audited in PLANS.md round 4).

Run: PYTHONPATH=. python examples/example_corpus_prep.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadatadocumentparser_spark.plans import corpus_prep, file_scan_count
from metadatadocumentparser_spark.session import get_spark
from metadatadocumentparser_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    benchmark = docs.where(F.col("doc_id") % 97 == 0)  # held-out eval slice

    out = corpus_prep(
        docs,
        benchmark,
        rates={"en": 0.8, "de": 0.5},
        default_rate=0.3,
        capacity=1200,
        n_shards=8,
        repetition_max={"dup_word_e4": 9500},  # Gopher gate, released text
        quality_min=0.05,   # classifier gate — heuristic default here;
                            # pass quality_model=YourTextClassifier() to
                            # swap in a fastText/DCLM-style scorer
        substr_k=8,         # ExactSubstr: cut every duplicated >=8-token
                            # span from ALL its occurrences
    )
    stats = out["stats"].collect()[0]
    print(
        f"input {stats.n_input} -> para-dedup {stats.n_after_para} "
        f"(-{stats.n_paras_deduped} paragraphs) -> quality gates "
        f"-{stats.n_quality_dropped} gopher -{stats.n_classifier_dropped} "
        f"classifier -> near-dedup {stats.n_after_dedup} -> substr "
        f"-{stats.n_substr_removed} tokens -> decontaminated "
        f"{stats.n_after_dedup - stats.n_contaminated} -> sampled "
        f"{stats.n_final} docs"
    )
    packed = out["packed"].localCheckpoint(eager=True)
    n_packs = packed.count()
    agg = packed.agg(
        F.sum("n_docs").alias("d"), F.sum("total_tokens").alias("t")
    ).collect()[0]
    print(f"packed into {n_packs} sequences: {agg.d} docs, {agg.t} tokens")
    print(
        "file scans in final plans (scan-count bound):",
        file_scan_count(out["docs"]),
        file_scan_count(out["packed"]),
        file_scan_count(out["stats"]),
    )
    spark.stop()


if __name__ == "__main__":
    main()
