"""Incremental extraction via Structured Streaming (file source +
foreachBatch reusing the batch pipeline; Spark checkpointing gives
exactly-once per input file)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..synth import TRANSCRIPT_DDL
from ..plans.pipeline import parse_transcripts, turns_of


def extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the incremental extraction stream. With available_now=True it
    drains the currently-visible files and stops (backfill mode); otherwise
    it keeps tailing input_dir."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process(batch_df, batch_id: int):
        turns = turns_of(parse_transcripts(batch_df, repartition=False))
        turns.write.mode("append").parquet(os.path.join(output_dir, "turns"))

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    return q


EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Event-time tumbling-window aggregation with a watermark for late
    data: counts + value sums per (window, event_type), append mode (a
    window emits once its watermark passes — late events beyond the
    watermark are dropped, the standard bounded-state contract)."""
    stream = spark.readStream.schema(EVENTS_DDL).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def streaming_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming exact dedup over a document stream: the streaming analogue
    of operators/dedup.exact_dedup_groups. Each row is keyed by the
    normalized-content fingerprint (same md5 normalization as the batch
    op); dropDuplicatesWithinWatermark keeps ONE row per fingerprint while
    the dedup state for a key expires once the watermark passes it —
    bounded state, the contract an unbounded 100 TB/day ingest needs
    (plain dropDuplicates would grow state forever).

    Stream schema: documents-with-ts parquet
    (doc_id bigint, text string, ts timestamp).
    """
    from ..functions.textstats import fingerprint

    stream = spark.readStream.schema(
        "doc_id bigint, text string, ts timestamp"
    ).parquet(input_dir)
    deduped = (
        stream.withColumn("h", fingerprint(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["h"])
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()
