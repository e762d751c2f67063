"""spark-submit entry point for the fused corpus-prep pipeline
(plans/corpus_prep.py):

    spark-submit --py-files mdp_spark.zip jobs/corpus_prep.py \\
        --input /path/documents.parquet --benchmark /path/eval.parquet \\
        --output /path/out [--id-col doc_id] [--text-col text] \\
        [--strata-col lang] [--rates en=0.8,de=0.5] [--default-rate 0.3] \\
        [--capacity 2048] [--shards 64] [--normalize NFC]

Writes three parquet tables under --output: survivors/ (id, text, strata,
n_tokens), packed/ (FFD packs) and stats/ (1-row stage-survivor counts),
and prints the stats row as one JSON line. The corpus parquet is scanned
exactly once (see plans/corpus_prep.py docstring and PLANS.md round 4).
"""

from __future__ import annotations

import argparse
import json


def _parse_rates(s: str | None) -> dict[str, float]:
    if not s:
        return {}
    out = {}
    for kv in s.split(","):
        k, _, v = kv.partition("=")
        out[k.strip()] = float(v)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--benchmark", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--strata-col", default="lang")
    p.add_argument("--rates", default=None, help="lang=rate,... (default keeps all)")
    p.add_argument("--default-rate", type=float, default=1.0)
    p.add_argument("--capacity", type=int, default=2048)
    p.add_argument("--shards", type=int, default=64)
    p.add_argument("--normalize", default=None, choices=[None, "NFC", "NFKC"])
    p.add_argument("--substr-k", type=int, default=None,
                   help="exact-substring dedup window (tokens); off when unset")
    p.add_argument("--quality-min", type=float, default=None,
                   help="heuristic quality gate threshold; off when unset")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("mdp-corpus-prep")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from metadatadocumentparser_spark.plans import corpus_prep

    rates = _parse_rates(args.rates)
    out = corpus_prep(
        spark.read.parquet(args.input),
        spark.read.parquet(args.benchmark),
        id_col=args.id_col,
        text_col=args.text_col,
        strata_col=args.strata_col,
        rates=rates or {},
        default_rate=args.default_rate,
        capacity=args.capacity,
        n_shards=args.shards,
        normalize_form=args.normalize,
        substr_k=args.substr_k,
        quality_min=args.quality_min,
    )
    out["docs"].write.mode("overwrite").parquet(f"{args.output}/survivors")
    out["packed"].write.mode("overwrite").parquet(f"{args.output}/packed")
    out["stats"].write.mode("overwrite").parquet(f"{args.output}/stats")
    stats = out["stats"].collect()[0].asDict()
    print(json.dumps(stats))
    spark.stop()
    return stats


if __name__ == "__main__":
    main()
