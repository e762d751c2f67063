"""Embedding quantization — int8 scalar quantization of float vectors
(the storage/serving compression step of a large embedding corpus: 4×
smaller, cosine preserved to ~1e-2).

Fully native (zero shuffle, whole-stage codegen — no UDF):
- quantize: per-vector symmetric scale s = max(|x|)/127,
  q_i = round_half_up(x_i / s) clamped to [-127, 127] (s = 0 for the
  all-zero vector, q = 0s).
- dequantize: x̂_i = q_i · s.

Deterministic and engine-portable: the only nonlinearity is the explicit
floor(x + 0.5) half-up rounding (Spark round() half-up vs DuckDB
half-even would disagree at exact .5 — same policy as
functions.textstats.half_up_scaled, sign-symmetric for negatives).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round_half_away(x: Column) -> Column:
    """round-half-away-from-zero via floor(|x| + 0.5)·sign — explicit,
    engine-portable (no banker's rounding ambiguity)."""
    return (F.floor(F.abs(x) + F.lit(0.5)) * F.signum(x)).cast("int")


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, scale, qvec array<tinyint>): symmetric int8 quantization."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    amax = F.array_max(F.transform("v", F.abs))
    base = base.withColumn(
        "scale", F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
    )
    q = F.transform(
        "v",
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.when(F.col("scale") > 0, _round_half_away(x / F.col("scale")))
                .otherwise(F.lit(0)),
            ),
        ).cast("tinyint"),
    )
    return base.select("id", "scale", q.alias("qvec"))


def dequantize_embeddings(qdf: DataFrame) -> DataFrame:
    """(id, vec array<double>): inverse transform of quantize_embeddings."""
    return qdf.select(
        "id",
        F.transform(
            "qvec", lambda q: q.cast("double") * F.col("scale")
        ).alias("vec"),
    )
