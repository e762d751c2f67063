"""KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002,
the order-statistics cardinality estimator HLL descends from.

Hash every value to u ∈ [0,1); keep the k smallest DISTINCT hashes; with
u_k the k-th smallest, estimate |distinct| ≈ (k-1)/u_k. Same streaming/
mergeable shape as HyperLogLog (union = merge the k-minima sets, keep k
smallest) but — because the hash is md5, not an engine-internal seed — the
whole computation is DETERMINISTIC and reproducible in any engine, which
is what makes it oracle-checkable here (HLL implementations differ by
register layout and can never cross-check exactly).

Scale shape: the k smallest per group is orderBy().limit(k) — Spark plans
TakeOrderedAndProject (per-partition top-k, then a k-row merge), never a
full sort. State is O(k) per group, like any sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmv_hash(col) -> "F.Column":
    """Deterministic u ∈ [0,1): first 8 md5 hex chars / 2^32 (identical in
    any engine that has md5 — the reproducibility contract)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("double")
        / float(1 << 32)
    )


def kmv_distinct_estimate(
    df: DataFrame, value_col: str, by: str | None = None, k: int = 64
) -> DataFrame:
    """(group?, est_distinct_e2, n_kept): KMV cardinality estimate, scaled
    ×100 floor-half-up for cross-engine hashing. Falls back to the exact
    count when fewer than k distinct hashes exist (the standard KMV rule:
    with < k values the sketch IS the exact distinct set)."""
    u = kmv_hash(F.col(value_col)).alias("u")
    if by is None:
        hashes = df.select(u).distinct()
        topk = hashes.orderBy("u").limit(k)
        agg = topk.agg(F.count("*").alias("n_kept"), F.max("u").alias("uk"))
        est = F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        ).otherwise((F.lit(k - 1)) / F.col("uk"))
        return agg.select(
            F.floor(est * 100.0 + 0.5).cast("bigint").alias("est_distinct_e2"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
        )
    hashes = df.select(F.col(by).alias("grp"), u).distinct()
    w = Window.partitionBy("grp").orderBy("u")
    topk = hashes.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
    agg = topk.groupBy("grp").agg(F.count("*").alias("n_kept"), F.max("u").alias("uk"))
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((F.lit(k - 1)) / F.col("uk"))
    return agg.select(
        "grp",
        F.floor(est * 100.0 + 0.5).cast("bigint").alias("est_distinct_e2"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
    )
