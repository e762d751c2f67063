"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition when the input arrives with fewer splits
    than the cluster has cores.

    Why: a small-but-explosive input (one parquet file under
    spark.sql.files.maxPartitionBytes → ONE scan task) pins the whole
    map side — shingle/bigram explodes multiply rows 100-1000× INSIDE the
    scan stage, so that single task does 100-1000× the file's size of
    work while every other core idles. The pre-explode repartition
    shuffles only the small raw rows (cheap) to buy a fully parallel
    explode+partial-agg stage. Inputs that already have ≥cores splits
    (any real 100 TB table) pass through untouched — no shuffle added at
    scale, only for under-split small inputs.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism * factor)
    return df
