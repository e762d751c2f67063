"""Order-of-magnitude scaling evidence for the corpus-prep operators
(r4 verdict task #7): time the doc-grain operators on the sf0.1
documents table and on a deterministic 10x replication of it, and
report per-op wall-time ratios. A ratio <= ~10 means the operator's
work grows (sub-)linearly with the corpus; super-linear ratios flag a
scale hazard.

Replication: each doc appears ``scale`` times with a distinct id
(doc_id*16+rep) and a per-replica suffix token, so ids never collide
and paragraphs stay distinct (paradedup workload is preserved); the
near-identical replica texts intentionally raise near-dup density —
minhash's candidate volume grows linearly here (each original doc's
replicas form one bounded clique), which is the workload a crawl with
mirrored pages produces.

Usage: python tools/bench_ops_scale.py [scale=10] — prints a table;
paste into BENCH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from metadatadocumentparser_spark.operators import dedup  # noqa: E402
from metadatadocumentparser_spark.operators.packing import pack_sequences  # noqa: E402
from metadatadocumentparser_spark.operators.paradedup import paragraph_dedup  # noqa: E402
from metadatadocumentparser_spark.operators.quality import (  # noqa: E402
    repetition_ngram_signals,
)
from metadatadocumentparser_spark.operators.substrdedup import (  # noqa: E402
    exact_substring_dedup,
)
from metadatadocumentparser_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(spark, docs, scale: int):
    # repartition BEFORE the checkpoint: the sf0.1 table is one parquet
    # file, so the crossJoin inherits ONE partition and every operator's
    # map side would run on a single core (measured: gopher_ngrams 423 s
    # at 100x was mostly serialization, not operator cost). A real corpus
    # at this size arrives in many splits; 64 matches the bench shuffle
    # partitioning.
    if scale > 1024:
        raise ValueError("replicate: scale > 1024 would collide doc ids")
    reps = spark.range(max(scale, 1)).select(F.col("id").cast("int").alias("rep"))
    return (
        docs.crossJoin(F.broadcast(reps))
        .select(
            # 1024·doc_id + rep: collision-free up to scale 1024 (the
            # first sweep used ·16 and collided at 100× — one doc's gram
            # positions joined another doc's token array)
            (F.col("doc_id") * 1024 + F.col("rep")).alias("doc_id"),
            F.concat(
                "text", F.lit(" rep"), F.col("rep").cast("string")
            ).alias("text"),
        )
        .repartition(64)
    )


def main():
    # Two levels a DECADE apart, both large enough that fixed scheduling
    # overhead (~0.3 s/job on this host) is amortized: the sf0.1 documents
    # table is only ~1.5 MB, so 1x-vs-10x ratios measure overhead, not the
    # operator (first attempt showed ratios < 1). Default 10x vs 100x.
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    spark = get_spark(app_name="mdp-bench-ops-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    corpora = {
        lo: replicate(spark, base, lo).localCheckpoint(eager=True),
        hi: replicate(spark, base, hi).localCheckpoint(eager=True),
    }
    scale, lines = hi, []
    n1, nS = corpora[lo].count(), corpora[hi].count()
    lines.append(f"docs: {n1} at {lo}x, {nS} at {hi}x (decade ratio {hi / lo:.0f})")

    # aggregates over COMPUTED columns, never bare .count(): for operators
    # ending in a unique-key left join or pure projection, count() lets
    # Catalyst eliminate the whole operator (join elimination + pruning)
    # and times only the scan (measured: substr_dedup "ratio 1.00" with
    # count(), 0 joins in the count plan). See BENCH.md round 5.
    ops = {
        "paradedup": lambda d: paragraph_dedup(d, "doc_id", "text")
        .agg(F.sum(F.length("text_dedup")), F.sum("n_kept")).collect(),
        "minhash_lsh": lambda d: dedup.minhash_lsh_pairs(d, "doc_id", "text").count(),
        "pack_sequences": lambda d: pack_sequences(
            d.select("doc_id", F.length("text").alias("sz")), "doc_id", "sz", 1200
        ).agg(F.sum("total_tokens"), F.sum("n_docs")).collect(),
        "gopher_ngrams": lambda d: repetition_ngram_signals(d, "doc_id", "text")
        .agg(F.sum("top_3gram_e4"), F.sum("dup_10gram_e4")).collect(),
        "substr_dedup": lambda d: exact_substring_dedup(d, "doc_id", "text", k=8)
        .agg(F.sum(F.length("text_dedup")), F.sum("n_removed")).collect(),
    }

    # warm codegen on the small corpus
    for fn in ops.values():
        fn(corpora[lo])

    results = {}
    for name, fn in ops.items():
        row = {}
        for s in (lo, hi):
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                fn(corpora[s])
                dt = time.monotonic() - t0
                best = dt if best is None or dt < best else best
            row[s] = best
        results[name] = row
        lines.append(
            f"{name:16s} {lo}x {row[lo]:7.3f} s   {hi}x {row[hi]:7.3f} s"
            f"   ratio {row[hi] / row[lo]:5.2f} (linear = {hi / lo:.0f})"
        )
    text = "\n".join(lines)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    spark.stop()
    return results


if __name__ == "__main__":
    main()
