"""Deterministic stratified sampling — the corpus-downsampling step every
training-data pipeline runs (per-language / per-source rate control before
tokenization).

Why not ``df.sampleBy``: Spark's sampler draws from a seeded RNG whose
stream depends on partition layout, so the SAME rows are not kept across
repartitioning, AQE re-plans, or engines — unacceptable for reproducible
dataset releases. Here the keep/drop decision is a pure function of the
row id: u(id) = int(md5(salt:id)[:8], 16) / 2^32 (the same engine-portable
uniform as quality.split_assign), so any engine — and any cluster size —
reproduces the identical sample. Pure projection + filter: no shuffle, no
state, trivially scales.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_uniform(id_col: Column, salt: str = "sample") -> Column:
    """u ∈ [0, 1) as a deterministic function of the id (md5-derived).

    NULL ids raise: concat_ws skips NULLs, so every NULL-id row would hash
    to the same u(salt) and the whole NULL-id population would be kept or
    dropped en bloc per stratum (or assigned to one split) — a silent skew.
    Matches pack_sequences' fail-loud posture for identity-less rows."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / float(1 << 32)
    )
    return F.when(
        id_col.isNull(),
        F.raise_error(
            F.lit("sample_uniform: NULL id has no deterministic hash")
        ).cast("double"),
    ).otherwise(u)


def sample_fixed(
    df: DataFrame, id_col: str, k: int, salt: str = "sample"
) -> DataFrame:
    """Exactly min(k, n) rows, uniformly and DETERMINISTICALLY: the k
    smallest md5-uniforms. Spark plans TakeOrderedAndProject (per-partition
    top-k + a k-row merge — never a full sort), so this is the fixed-SIZE
    companion to stratified_sample's fixed-RATE keep: same engine- and
    partitioning-independent decisions, bounded output."""
    u = sample_uniform(F.col(id_col), salt)
    return (
        df.withColumn("__u", u).orderBy("__u", id_col).limit(k).drop("__u")
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str = "sample"
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis 2006):
    key = u(id)^(1/w), keep the k LARGEST keys — inclusion probability
    proportional to weight, deterministic via the md5 uniform. Zero or
    negative weights never sample (key pinned to -1). Same
    TakeOrderedAndProject shape as sample_fixed."""
    u = sample_uniform(F.col(id_col), salt)
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.pow(u, 1.0 / w)).otherwise(F.lit(-1.0))
    return (
        df.withColumn("__k", key)
        .where(F.col("__k") >= 0)
        .orderBy(F.col("__k").desc(), id_col)
        .limit(k)
        .drop("__k")
    )


def sample_per_stratum(
    df: DataFrame, strata_col: str, id_col: str, k: int, salt: str = "sample"
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum (deterministic md5
    order) — the per-group fixed-size companion (one keyed window; Spark
    plans WindowGroupLimit: per-partition group top-k before the
    shuffle)."""
    from pyspark.sql import Window

    u = sample_uniform(F.col(id_col), salt)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff u(id) < rates[stratum] (strata not listed get
    ``default_rate``). Returns the input rows that survive, unchanged."""
    u = sample_uniform(F.col(id_col), salt)
    rate = None
    for name, r in rates.items():
        rate = (
            F.when(F.col(strata_col) == name, F.lit(float(r)))
            if rate is None
            else rate.when(F.col(strata_col) == name, F.lit(float(r)))
        )
    rate = rate.otherwise(F.lit(float(default_rate))) if rate is not None else F.lit(
        float(default_rate)
    )
    return df.where(u < rate)
