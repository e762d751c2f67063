"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...}

Headline load = the flagship extraction pipeline over a deterministic synth
transcript corpus sized to the scale factor (~6M turns/sf → 600k at sf0.1),
plus representative operator queries over $SPARK_GRAFT_SF_DIR testdata.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), MDP_BENCH_TURNS (override corpus size).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from metadatadocumentparser_spark import synth  # noqa: E402
from metadatadocumentparser_spark.operators import dedup, sessionize, similarity  # noqa: E402
from metadatadocumentparser_spark.plans import formulas_of, parse_transcripts, turns_of  # noqa: E402
from metadatadocumentparser_spark.session import get_spark  # noqa: E402
from metadatadocumentparser_spark.sources import load_table  # noqa: E402

HOT_FACTOR = 100  # conv 0 carries 1000 turns — the skew exercise


def corpus_path(sf: float, n_turns: int) -> str:
    return f"/tmp/mdp_bench_corpus_sf{sf}_{n_turns}"


def ensure_corpus(spark, sf: float, n_turns: int) -> str:
    """Materialize the deterministic corpus once (generation excluded from
    extraction timing)."""
    path = corpus_path(sf, n_turns)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        n_convs = max(2, (n_turns - 10 * HOT_FACTOR) // 10)
        df = synth.synth_df(spark, n_convs, hot_factor=HOT_FACTOR)
        # 128 splits: fine enough granularity that a 32-core wave has no
        # straggler tail (4 waves/core-set at the largest level)
        df.repartition(128).write.mode("overwrite").parquet(path)
    return path


def bench_extract(spark, path: str, timings: dict):
    """The multi-output path a 100 TB job takes (jobs/extract.py /
    extract_all_materialized): ONE Python kernel pass materialized to a
    parquet staging layer, every output table derived from the staged
    (columnar, column-pruned) read. Nobody pays N kernel passes for N
    outputs. Reported per stage:
      parse_stage       — kernel + staging write (min-of-2, steady state)
      extract_turns     — turns aggregate from the staged layer
      extract_formulas  — formula stage from the staged layer
    plus cold_first_run_sec (first execution incl. codegen/JIT compile,
    which amortizes to zero at scale)."""
    df = spark.read.parquet(path)
    staging = path + "_parsed_stage"

    # warm the exact codegen paths on a slice (generated-class compile)
    warm = parse_transcripts(df.limit(2000), repartition=False)
    warm.write.mode("overwrite").parquet(staging)
    wst = spark.read.parquet(staging)
    turns_of(wst).agg(F.count("*")).collect()
    formulas_of(wst).agg(F.count("*")).collect()

    # min-of-3 per stage: this host carries external noisy-neighbor load
    # (observed loadavg ~10 with zero local processes), inflating wall time
    # 1.5-2× in bad windows; the minimum is the steady-state number a
    # dedicated cluster sees (same policy as tools/bench_scaling.py)
    n_rows = 0
    cold = 0.0

    def run_parse():
        parse_transcripts(df, repartition=False).write.mode("overwrite").parquet(staging)

    def run_turns():
        nonlocal n_rows
        row = turns_of(spark.read.parquet(staging)).agg(
            F.count("*").alias("n"),
            F.sum(F.length("extracted_text")).alias("chars"),
            F.sum(F.size("spans")).alias("spans"),
        ).collect()[0]
        n_rows = row["n"]

    def run_formulas():
        formulas_of(spark.read.parquet(staging)).agg(
            F.count("*"), F.sum("confidence")
        ).collect()

    stages = (
        ("parse_stage", run_parse),
        ("extract_turns", run_turns),
        ("extract_formulas", run_formulas),
    )
    for name, fn in stages:
        best = None
        for i in range(3):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            if i == 0:
                cold += dt
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
    timings["cold_first_run_sec"] = round(cold, 3)
    return n_rows


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_turns = int(os.environ.get("MDP_BENCH_TURNS", str(int(6_000_000 * sf))))

    # corpus generation in a throwaway session: 600k synth turns leave
    # enough GC/heap residue to distort the measured extraction timings
    gen = get_spark(app_name="mdp-bench-gen", master=f"local[{cpus}]")
    gen.sparkContext.setLogLevel("ERROR")
    path = ensure_corpus(gen, sf, n_turns)
    gen.stop()

    spark = get_spark(app_name="mdp-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings = {}
    n_rows = bench_extract(spark, path, timings)
    turns_per_sec = round(
        n_rows
        / (
            timings["parse_stage"]
            + timings["extract_turns"]
            + timings["extract_formulas"]
        ),
        1,
    )

    def timed(name, fn):
        # min-of-2: single-shot op timings on this host show 1.5-2×
        # noisy-neighbor outliers (same policy as the extraction stages)
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    li = load_table(spark, sf_dir, "lineitem")
    timed(
        "tpch_q1",
        lambda: li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), F.count("*"))
        .collect(),
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    timed(
        "tpch_q3",
        lambda: li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .orderBy(F.desc("rev"))
        .limit(10)
        .collect(),
    )
    docs = load_table(spark, sf_dir, "documents")
    timed("minhash_lsh", lambda: dedup.minhash_lsh_pairs(docs, "doc_id", "text").count())
    emb = load_table(spark, sf_dir, "embeddings")
    timed(
        "cosine_topk",
        lambda: similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=5).count(),
    )
    ev = load_table(spark, sf_dir, "events")
    timed("sessionize", lambda: sessionize.sessionize(ev).count())
    from metadatadocumentparser_spark.operators.asof import events_asof
    from metadatadocumentparser_spark.operators.chunking import content_defined_chunks

    timed("asof_join", lambda: events_asof(ev, "click", "view").count())
    timed(
        "cdc_chunks",
        lambda: content_defined_chunks(docs, "doc_id", "text").count(),
    )
    # round-3/4 corpus-prep operators (NOTE: added in r4 — the "value"
    # total covers more ops than r1-r3 JSONs; turns_per_sec is unchanged)
    from metadatadocumentparser_spark.operators.packing import pack_sequences
    from metadatadocumentparser_spark.operators.paradedup import paragraph_dedup
    from metadatadocumentparser_spark.operators.quantize import quantize_embeddings
    from metadatadocumentparser_spark.operators.quality import (
        repetition_ngram_signals,
    )

    # NOTE (r5 bench-integrity fix): these actions aggregate COMPUTED
    # columns, never bare .count() — for operators ending in a unique-key
    # left join or a pure projection, Catalyst ELIMINATES the entire
    # operator under count() (join elimination + column pruning) and the
    # timing measures only the scan. r4's paradedup/quantize/gopher
    # readings had that flaw; see BENCH.md round 5.
    timed(
        "paradedup",
        lambda: paragraph_dedup(docs, "doc_id", "text")
        .agg(F.sum(F.length("text_dedup")), F.sum("n_kept"))
        .collect(),
    )
    timed(
        "pack_sequences",
        lambda: pack_sequences(
            docs.select("doc_id", F.length("text").alias("sz")), "doc_id", "sz", 1200
        )
        .agg(F.sum("total_tokens"), F.sum("n_docs"))
        .collect(),
    )
    timed(
        "quantize",
        lambda: quantize_embeddings(emb, "vec_id", "embedding")
        .agg(F.sum("scale"), F.sum(F.aggregate("qvec", F.lit(0), lambda a, x: a + x)))
        .collect(),
    )
    timed(
        "gopher_ngrams",
        lambda: repetition_ngram_signals(docs, "doc_id", "text")
        .agg(F.sum("top_3gram_e4"), F.sum("dup_10gram_e4"))
        .collect(),
    )
    # round-5: exact-substring dedup (Lee et al. remove-all spans)
    from metadatadocumentparser_spark.operators.substrdedup import (
        exact_substring_dedup,
    )

    timed(
        "substr_dedup",
        lambda: exact_substring_dedup(docs, "doc_id", "text", k=8)
        .agg(F.sum(F.length("text_dedup")), F.sum("n_removed"))
        .collect(),
    )
    # round-5: CCNet-style LM — training (count tables materialize inside
    # train_ngram_lm) and join-based perplexity scoring, timed separately
    from metadatadocumentparser_spark.operators.lm import (
        perplexity_score,
        train_ngram_lm,
    )

    lm_model = {}

    def _lm_train():
        lm_model["m"] = train_ngram_lm(docs, "text", n=3)

    timed("lm_train", _lm_train)
    timed(
        "lm_score",
        lambda: perplexity_score(docs, "doc_id", "text", lm_model["m"])
        .agg(F.sum("log_ppl"), F.sum("n_tokens"))
        .collect(),
    )

    total = round(sum(v for k, v in timings.items() if k != "cold_first_run_sec"), 3)
    print(
        json.dumps(
            {
                "metric": "extraction+ops wall time (headline: turns/sec at sf)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "turns_per_sec": turns_per_sec,
                "corpus_turns": n_rows,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
