"""Range (interval) join — match points to intervals containing them when
there is NO equi key to join on.

The naive formulation ``p JOIN i ON p.v >= i.lo AND p.v < i.hi`` has no
equi condition, so Spark plans a broadcast-nested-loop / cartesian — |p|·|i|
comparisons, a scale-killer. This operator applies the standard bucketized
range join (what Databricks' range-join hints and DuckDB's IEJoin solve in
the engine): quantize the value axis into fixed-width buckets, explode each
interval across the buckets it covers, equi-join point-bucket to
interval-bucket, then apply the exact range predicate. Each (point,
interval) pair meets in exactly ONE bucket (the point's), so no dedup is
needed; work is linear in |p| + Σ interval_span/bucket_width.

Pick bucket_width ≈ the typical interval width: each interval then explodes
to O(1) rows and each bucket holds O(overlap) intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    val_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """points columns + matching intervals' columns, for every interval
    with lo <= val < hi (half-open)."""
    b = F.lit(float(bucket_width))
    pb = points.withColumn("__b", F.floor(F.col(val_col) / b).cast("bigint"))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("bigint"),
                # hi is exclusive, but a point in hi's bucket can still be
                # < hi, so the interval must cover that bucket too
                F.floor(F.col(hi_col) / b).cast("bigint"),
            )
        ),
    )
    return (
        pb.join(ib, "__b")
        .where((F.col(val_col) >= F.col(lo_col)) & (F.col(val_col) < F.col(hi_col)))
        .drop("__b")
    )
