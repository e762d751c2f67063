"""Sessionization + gap statistics over the events stream table.

The relational analogue of the reference's W5 word→line grouping
(text.py:201-224: sort by position, break when the gap exceeds a tolerance,
aggregate per group) and A2 gap statistics (layout.py:55-74: mean +
1.5·population-std significant-gap threshold) — the same lag/flag/
running-sum/groupBy shape, keyed by user instead of line-y.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Per-user sessions: a new session starts when the gap from the
    previous event exceeds gap_seconds. Epochs floored to whole seconds so
    the arithmetic is integral (bit-identical cross-engine)."""
    e = events.select(
        "user_id",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ep"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ep").over(w).isNull() | ((F.col("ep") - F.lag("ep").over(w)) > gap_seconds),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ep").alias("start_ep"),
            (F.max("ep") - F.min("ep")).alias("duration_s"),
        )
    )


def gap_stats(events: DataFrame) -> DataFrame:
    """A2 analogue: per-user consecutive-gap mean + population std (rounded
    for cross-engine hashing) over integral epoch seconds."""
    e = events.select(
        "user_id", "event_id", F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ep")
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    gaps = e.withColumn("gap", F.col("ep") - F.lag("ep").over(w)).where(
        F.col("gap").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.floor(F.avg("gap") * 1000.0 + 0.5).cast("bigint").alias("avg_gap_e3"),
        F.floor(F.stddev_pop("gap") * 1000.0 + 0.5).cast("bigint").alias("std_gap_e3"),
    )
