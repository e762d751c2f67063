"""End-to-end training-data pipeline over the documents table — the
round-2 operator suite composed the way a corpus-preparation job would
chain them:

    quality gate (repetition + score) → exact dedup → near-dup dedup
    (MinHash-LSH clusters) → chunk-grain dedup (CDC) → benchmark
    decontamination → PII redaction → stratified downsampling →
    deterministic train/val/test split

Every operator here is oracle-checked individually by the driver
(`__spark_entry__.py`); this example shows the composition. At 100 TB the
same plan holds: each stage is a linear shuffle (hash-groupBy, banded
join, bucketized blocking) — no all-pairs anywhere.

Run: PYTHONPATH=. python examples/example_training_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadatadocumentparser_spark.operators import dedup, quality
from metadatadocumentparser_spark.operators.chunking import chunk_dedup_groups
from metadatadocumentparser_spark.session import get_spark
from metadatadocumentparser_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    # 1. quality gate: drop highly repetitive documents (Gopher rules)
    rep = quality.repetition_signals(docs, "doc_id", "text")
    keep = rep.where(
        (F.col("dup_word_e4") < 9000) & (F.col("top_bigram_e4") < 5000)
    ).select(F.col("id").alias("doc_id"))
    gated = docs.join(keep, "doc_id")
    print(f"quality gate: {docs.count()} -> {gated.count()} docs")

    # 1b. paragraph-level dedup (C4-style): drop spans repeated across the
    #     corpus before whole-doc dedup (the synthetic docs are single-line,
    #     so each is one '\n'-paragraph and nothing drops here; real corpora
    #     have multi-paragraph docs with shared boilerplate)
    from metadatadocumentparser_spark.operators.paradedup import paragraph_dedup

    pd_stats = paragraph_dedup(gated, "doc_id", "text")
    n_dropped = pd_stats.agg(
        F.sum(F.col("n_paras") - F.col("n_kept"))
    ).collect()[0][0]
    print(f"paragraph dedup would drop {n_dropped or 0} repeated paragraphs")

    # 2. exact dedup: keep one doc per normalized-content hash
    groups = dedup.exact_dedup_groups(gated, "doc_id", "text")
    keepers = groups.select(F.col("keeper").alias("doc_id"))
    exact = gated.join(keepers, "doc_id")
    print(f"exact dedup:  -> {exact.count()} docs")

    # 3. near-dup dedup: MinHash-LSH candidate graph -> connected
    #    components -> keep the cluster keeper only
    clusters = dedup.dedup_clusters(exact, "doc_id", "text")
    drop = clusters.where(F.col("id") != F.col("label")).select(
        F.col("id").alias("doc_id")
    )
    near = exact.join(drop, "doc_id", "left_anti")
    print(f"near dedup:   -> {near.count()} docs")

    # 4. chunk-grain dedup report (CDC): repeated chunk content across docs
    dup_chunks = chunk_dedup_groups(near, "doc_id", "text")
    print(f"repeated CDC chunks across corpus: {dup_chunks.count()}")

    # 5. decontamination vs a held-out benchmark slice
    benchmark = docs.where(F.col("doc_id") % 97 == 0)
    contaminated = quality.decontaminate(near, benchmark, "doc_id", "text")
    clean = near.join(
        contaminated.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
    )
    print(f"decontaminate: -> {clean.count()} docs")

    # 6. PII redaction: mask emails/phones/IPs before release (the masked
    #    text replaces the raw text from here on)
    from metadatadocumentparser_spark.operators.redact import redact_pii

    red = redact_pii(clean, "doc_id", "text")
    n_pii = red.agg(
        F.sum(F.col("n_emails") + F.col("n_phones") + F.col("n_ips"))
    ).collect()[0][0]
    print(f"PII redaction: {n_pii or 0} spans masked")
    clean = clean.drop("text").join(
        red.select(F.col("id").alias("doc_id"), F.col("redacted").alias("text")),
        "doc_id",
    )

    # 7. per-language downsampling (deterministic, engine-portable)
    from metadatadocumentparser_spark.operators.sampling import stratified_sample

    sampled = stratified_sample(
        clean, "lang", "doc_id", {"en": 0.8, "de": 0.5}, default_rate=0.3
    )
    print(f"stratified sample: -> {sampled.count()} docs")

    # 8. deterministic split (stable under repartitioning/cluster size)
    split = quality.split_assign(sampled, "doc_id")
    split.groupBy("split").count().orderBy("split").show()

    spark.stop()


if __name__ == "__main__":
    main()
