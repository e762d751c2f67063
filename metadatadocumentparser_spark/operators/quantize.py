"""Embedding quantization — int8 scalar quantization of float vectors
(the storage/serving compression step of a large embedding corpus: 4×
smaller, cosine preserved to ~1e-2).

Fully native (zero shuffle, whole-stage codegen — no UDF):
- quantize: per-vector symmetric scale s = max(|x|)/127,
  q_i = round_half_up(x_i / s) clamped to [-127, 127] (s = 0 for the
  all-zero vector, q = 0s).
- dequantize: x̂_i = q_i · s.

Deterministic and engine-portable: the only nonlinearity is explicit
round-HALF-AWAY-FROM-ZERO (floor(|x| + 0.5)·sign(x)) — NOT the same as
floor(x + 0.5) at negative halves (-2.5 → -3 here, -2 there); a mirror in
another engine must use FLOOR(ABS(x) + 0.5) * SIGN(x), never the engine's
round() (half-up vs banker's half-even disagree at exact .5).

NULL/NaN elements: a non-finite or missing element quantizes to NULL (and
dequantizes back to NULL) and is EXCLUDED from the scale computation —
without that, least/greatest's NULL-skipping would silently clamp a NULL
rounding result to +127, and one NaN would poison the scale and corrupt
the whole vector to ±127 garbage.
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
    from ._util import ensure_min_parallelism

    # the per-element transforms are interpreted HOFs evaluated in the
    # scan stage — a single-file corpus runs them on one core unguarded
    df = ensure_min_parallelism(df, min_bytes=1 << 20)
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # finite means finite: NaN AND ±Infinity excluded (an Infinity element
    # would otherwise make scale=inf → inf/inf=NaN → ANSI CAST_OVERFLOW
    # crash, or silent all-zero quantization with ANSI off)
    finite = lambda x: (  # noqa: E731
        x.isNotNull() & ~F.isnan(x) & (F.abs(x) < F.lit(float("inf")))
    )
    amax = F.array_max(F.transform(F.filter("v", finite), F.abs))
    base = base.withColumn(
        "scale", F.when(amax.isNotNull() & (amax > 0), amax / F.lit(127.0)).otherwise(F.lit(0.0))
    )
    q = F.transform(
        "v",
        lambda x: F.when(
            finite(x),
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.when(F.col("scale") > 0, _round_half_away(x / F.col("scale")))
                    .otherwise(F.lit(0)),
                ),
            ),
        ).cast("tinyint"),  # non-finite elements -> NULL, never a clamped 127
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
