"""Incremental extraction via Structured Streaming (file source +
foreachBatch reusing the batch pipeline; Spark checkpointing gives
exactly-once per input file)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

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
