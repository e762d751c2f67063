"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(
    df: DataFrame, factor: int = 2, min_bytes: int = 0
) -> DataFrame:
    """Round-robin repartition when the input arrives with fewer splits
    than the cluster has cores AND is big enough for the shuffle to pay.

    Why: a small-but-explosive input (one parquet file under
    spark.sql.files.maxPartitionBytes → ONE scan task) pins the whole
    map side — shingle/bigram explodes multiply rows 100-1000× INSIDE the
    scan stage, so that single task does 100-1000× the file's size of
    work while every other core idles. The pre-explode repartition
    shuffles only the small raw rows (cheap) to buy a fully parallel
    explode+partial-agg stage. Inputs that already have ≥cores splits
    (any real 100 TB table) pass through untouched — no shuffle added at
    scale, only for under-split small inputs.

    ``min_bytes`` is the caller's per-operator break-even: when the
    optimizer's size estimate is below it, the input passes through
    untouched — the repartition's shuffle barrier costs more than it
    saves when the serial map work is already sub-second. Measured on the
    sf0.1 bench corpus (~0.6 MB, 1 scan split, local[32], min-of-5):
    cdc_chunks (cheap vectorized-numpy kernel) 0.66 s unguarded vs 0.93 s
    guarded → chunking passes 16 MiB; minhash (8 md5 per shingle) 1.75 s
    guarded vs 2.33 s unguarded → with_shingles keeps min_bytes=0. See
    BENCH.md round 4.

    NOTE: the partition-count probe (df.rdd.getNumPartitions()) forces
    full physical planning of df's lineage — callers must pass RAW SCANS
    (every current caller does), never a post-kernel plan. The min_bytes
    gate reads only optimizer statistics (no planning of children), so
    below-threshold inputs skip the RDD translation entirely.
    """
    sc = df.sparkSession.sparkContext
    if min_bytes > 0:
        try:
            size = int(
                str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            )
            if size < min_bytes:
                return df
        except Exception:
            pass  # stats unavailable → fall back to the partition probe
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism * factor)
    return df
