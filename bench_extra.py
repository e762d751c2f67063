"""Per-query isolation harness for optimization work (guide §1.4).

NOT the frozen driver bench (bench.py) — this file exists so each query can
be timed in isolation (same aggregates bench.py runs, so numbers are
comparable) and so the physical plan of every query can be captured to
plans/r06/<name>_<tag>.txt for the optimization log.

NOTE: each repetition REBUILDS the DataFrame (exactly like bench.py's
lambdas do) — re-collecting a single DataFrame object re-uses its
materialized AQE query stages, which silently turns the second repeat
into a no-op and makes min-of-N meaningless.

Usage:
    python bench_extra.py --tag before --only gopher_ngrams,substr_dedup
    python bench_extra.py --tag after            # all queries, 2 repeats

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, MDP_BENCH_TURNS as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import corpus_path, ensure_corpus  # noqa: E402
from metadatadocumentparser_spark.operators import dedup, sessionize, similarity  # noqa: E402
from metadatadocumentparser_spark.plans import formulas_of, parse_transcripts, turns_of  # noqa: E402
from metadatadocumentparser_spark.session import get_spark  # noqa: E402
from metadatadocumentparser_spark.sources import load_table  # noqa: E402

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def save_plan(df, name: str, tag: str):
    os.makedirs(PLANS_DIR, exist_ok=True)
    with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
        f.write(df._jdf.queryExecution().explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        ))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--only", default="")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_turns = int(os.environ.get("MDP_BENCH_TURNS", str(int(6_000_000 * sf))))

    spark = get_spark(app_name="mdp-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings = {}

    def timed(name, mk, action=lambda d: d.collect()):
        """mk: () -> DataFrame, rebuilt per repetition; action executes it."""
        if only is not None and name not in only:
            return
        if not args.no_plans:
            save_plan(mk(), name, args.tag)
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(args.repeats):
            t0 = time.monotonic()
            action(mk())
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"  {name}: {best:.3f}s", flush=True)

    # ---- extraction stages (same staged shape as bench.bench_extract) ----
    want_extract = only is None or only & {"parse_stage", "extract_turns", "extract_formulas"}
    if want_extract:
        path = corpus_path(sf, n_turns)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            ensure_corpus(spark, sf, n_turns)
        df = spark.read.parquet(path)
        staging = path + "_parsed_stage_extra"
        # warm codegen
        parse_transcripts(df.limit(2000), repartition=False).write.mode(
            "overwrite"
        ).parquet(staging)
        wst = spark.read.parquet(staging)
        turns_of(wst).agg(F.count("*")).collect()
        formulas_of(wst).agg(F.count("*")).collect()
        timed(
            "parse_stage",
            lambda: parse_transcripts(df, repartition=False),
            action=lambda d: d.write.mode("overwrite").parquet(staging),
        )
        timed(
            "extract_turns",
            lambda: turns_of(spark.read.parquet(staging)).agg(
                F.count("*").alias("n"),
                F.sum(F.length("extracted_text")).alias("chars"),
                F.sum(F.size("spans")).alias("spans"),
            ),
        )
        timed(
            "extract_formulas",
            lambda: formulas_of(spark.read.parquet(staging)).agg(
                F.count("*"), F.sum("confidence")
            ),
        )

    # ---- operator queries (identical aggregates to bench.py) ----
    li = load_table(spark, sf_dir, "lineitem")
    timed(
        "tpch_q1",
        lambda: li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), F.count("*")),
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
        .limit(10),
    )
    docs = load_table(spark, sf_dir, "documents")
    timed(
        "minhash_lsh",
        lambda: dedup.minhash_lsh_pairs(docs, "doc_id", "text"),
        action=lambda d: d.count(),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    timed(
        "cosine_topk",
        lambda: similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=5),
        action=lambda d: d.count(),
    )
    ev = load_table(spark, sf_dir, "events")
    timed("sessionize", lambda: sessionize.sessionize(ev), action=lambda d: d.count())
    from metadatadocumentparser_spark.operators.asof import events_asof
    from metadatadocumentparser_spark.operators.chunking import content_defined_chunks

    timed("asof_join", lambda: events_asof(ev, "click", "view"), action=lambda d: d.count())
    timed(
        "cdc_chunks",
        lambda: content_defined_chunks(docs, "doc_id", "text"),
        action=lambda d: d.count(),
    )
    from metadatadocumentparser_spark.operators.packing import pack_sequences
    from metadatadocumentparser_spark.operators.paradedup import paragraph_dedup
    from metadatadocumentparser_spark.operators.quantize import quantize_embeddings
    from metadatadocumentparser_spark.operators.quality import repetition_ngram_signals

    timed(
        "paradedup",
        lambda: paragraph_dedup(docs, "doc_id", "text").agg(
            F.sum(F.length("text_dedup")), F.sum("n_kept")
        ),
    )
    timed(
        "pack_sequences",
        lambda: pack_sequences(
            docs.select("doc_id", F.length("text").alias("sz")), "doc_id", "sz", 1200
        ).agg(F.sum("total_tokens"), F.sum("n_docs")),
    )
    timed(
        "quantize",
        lambda: quantize_embeddings(emb, "vec_id", "embedding").agg(
            F.sum("scale"), F.sum(F.aggregate("qvec", F.lit(0), lambda a, x: a + x))
        ),
    )
    timed(
        "gopher_ngrams",
        lambda: repetition_ngram_signals(docs, "doc_id", "text").agg(
            F.sum("top_3gram_e4"), F.sum("dup_10gram_e4")
        ),
    )
    from metadatadocumentparser_spark.operators.substrdedup import exact_substring_dedup

    timed(
        "substr_dedup",
        lambda: exact_substring_dedup(docs, "doc_id", "text", k=8).agg(
            F.sum(F.length("text_dedup")), F.sum("n_removed")
        ),
    )
    from metadatadocumentparser_spark.operators.lm import perplexity_score, train_ngram_lm

    lm_model = {}

    def _lm_train():
        lm_model["m"] = train_ngram_lm(docs, "text", n=3)

    if only is None or "lm_train" in only:
        spark.sparkContext.setJobDescription("lm_train")
        best = None
        for _ in range(args.repeats):
            t0 = time.monotonic()
            _lm_train()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        spark.sparkContext.setJobDescription(None)
        timings["lm_train"] = round(best, 3)
        print(f"  lm_train: {best:.3f}s", flush=True)
    if only is None or "lm_score" in only:
        if "m" not in lm_model:
            lm_model["m"] = train_ngram_lm(docs, "text", n=3)
        timed(
            "lm_score",
            lambda: perplexity_score(docs, "doc_id", "text", lm_model["m"]).agg(
                F.sum("log_ppl"), F.sum("n_tokens")
            ),
        )

    print(json.dumps({"tag": args.tag, "sf": sf, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
