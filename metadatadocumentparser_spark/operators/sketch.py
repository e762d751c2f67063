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
    # NULL values hash to NULL, which sorts FIRST (ASC NULLS FIRST) —
    # unfiltered, a NULL occupies a top-k slot, is counted by n_kept but
    # skipped by max(u), biasing the estimate (r5 review). A NULL is not
    # a value; it is excluded from the cardinality.
    if by is None:
        hashes = df.select(u).where(F.col("u").isNotNull()).distinct()
        topk = hashes.orderBy("u").limit(k)
        agg = topk.agg(F.count("*").alias("n_kept"), F.max("u").alias("uk"))
        est = F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        ).otherwise((F.lit(k - 1)) / F.col("uk"))
        return agg.select(
            F.floor(est * 100.0 + 0.5).cast("bigint").alias("est_distinct_e2"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
        )
    hashes = (
        df.select(F.col(by).alias("grp"), u)
        .where(F.col("u").isNotNull())
        .distinct()
    )
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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982): the frequent-items sketch
# behind every bounded-memory top-k — here as the classic TWO-PASS EXACT
# pattern: pass 1 builds per-partition MG summaries (capacity counters
# each, merged driver-side into a candidate set with the guarantee that
# every item of true count > n/capacity survives); pass 2 computes EXACT
# counts for the candidates only (a broadcast semi-filtered aggregation —
# the shuffle carries candidate rows, not the whole corpus). Result: the
# exact global top-k with O(partitions × capacity) driver state, never a
# full-vocabulary shuffle.
# ---------------------------------------------------------------------------


def _mg_partition(values, capacity: int) -> dict:
    """One-pass Misra-Gries summary of an iterable (≤ capacity counters)."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            # decrement-all step (dict rebuild; zeros drop)
            counters = {k2: c - 1 for k2, c in counters.items() if c > 1}
    return counters


def _mg_merge(a: dict, b: dict, capacity: int) -> dict:
    """Summary merge (Agarwal et al. 2013 §3.2): add counts, then subtract
    the (capacity+1)-th largest count from all and drop non-positives —
    preserves the n/capacity error bound over the combined stream."""
    out = dict(a)
    for k2, c in b.items():
        out[k2] = out.get(k2, 0) + c
    if len(out) > capacity:
        kth = sorted(out.values(), reverse=True)[capacity]
        out = {k2: c - kth for k2, c in out.items() if c - kth > 0}
    return out


def heavy_hitters_exact(
    df: DataFrame, value_col: str, k: int = 10, capacity: int = 1000
) -> DataFrame:
    """(value, cnt): the EXACT top-k most frequent values (ties broken by
    value ascending), computed with bounded memory.

    Correctness condition (classic): the result equals the full
    groupBy-count top-k whenever the true k-th count exceeds n/capacity —
    size capacity accordingly (capacity ≥ n / kth_count; the default
    1000 covers any item above 0.1% frequency). Items rarer than the
    bound can be missed BY DESIGN — that is the memory/completeness trade
    every production heavy-hitters pass makes."""

    def part_sketch(rows):
        yield _mg_partition((r[0] for r in rows), capacity)

    sketches = df.select(value_col).rdd.mapPartitions(part_sketch).collect()
    merged: dict = {}
    for s in sketches:
        merged = _mg_merge(merged, s, capacity)
    if not merged:
        # preserve the input column's TYPE on the empty path too — a
        # hardcoded string schema would make the output schema depend on
        # the data (r5 review)
        vtype = df.schema[value_col].dataType.simpleString()
        return df.sparkSession.createDataFrame([], f"value {vtype}, cnt bigint")
    candidates = list(merged.keys())
    exact = (
        df.select(F.col(value_col).alias("value"))
        .where(F.col("value").isin(candidates))
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("value", "cnt")
    )
