"""Incremental extraction via Structured Streaming (file source +
foreachBatch reusing the batch pipeline; Spark checkpointing gives
exactly-once per input file)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
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


def streaming_near_dup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    index_dir: str,
    available_now: bool = True,
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int | None = None,
):
    """Streaming INCREMENTAL near-dup detection — the online analogue of
    operators/dedup.minhash_lsh_pairs: every microbatch of documents is
    banded (MinHash-LSH) and candidate pairs are emitted both WITHIN the
    batch and AGAINST the accumulated band index of everything seen so
    far; the batch's band rows are then appended to the index.

    Pairs are normalized to (id_a < id_b) so the union over all batches
    equals the batch operator's pair set over the full corpus (each pair
    is found exactly once: intra-batch by the self-join, cross-batch by
    the index join of the LATER batch).

    State model: the index is a plain parquet table of (id, band, bkey) —
    ``bands`` tiny rows per document, queryable/compactable/partitionable
    like any table (no opaque state store), which is what an unbounded
    corpus needs; bound it by retention-pruning old ids with
    ``prune_band_index`` when the dedup horizon is finite. foreachBatch may
    re-run a batch on failure, so both the index and the pair output are
    written idempotently-readable (consumers take DISTINCT; the test does).

    (num_hashes, bands, shingle_k) tune the banding collision curve
    exactly as in operators/dedup.py (None → the oracle-checked module
    defaults); at production scale use more rows per band — see the
    precision note at dedup.py's constants.
    """
    from ..operators import dedup as _dedup

    nh = _dedup.NUM_HASHES if num_hashes is None else num_hashes
    nb = _dedup.BANDS if bands is None else bands
    sk = _dedup.SHINGLE_K if shingle_k is None else shingle_k

    stream = (
        spark.readStream.schema("doc_id bigint, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process(batch_df, batch_id: int):
        bands = _dedup.minhash_band_rows(
            batch_df, "doc_id", "text", num_hashes=nh, bands=nb, shingle_k=sk
        ).localCheckpoint(eager=True)
        intra = (
            bands.alias("a")
            .join(bands.alias("b"), ["band", "bkey"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        pairs = intra
        # detect the index THROUGH Spark (not os.path — the index may live
        # on HDFS/S3/any URI filesystem where local-path checks are always
        # false and cross-batch pairs would be silently dropped)
        from pyspark.errors import AnalysisException

        try:
            idx = spark.read.parquet(index_dir)
            have_index = True
        except AnalysisException:  # PATH_NOT_FOUND on the very first batch
            # anything else (permissions, corruption) must surface, not
            # silently degrade to intra-batch-only pairs
            have_index = False
        if have_index:
            cross = (
                bands.alias("a")
                .join(idx.alias("b"), ["band", "bkey"])
                .where(F.col("a.id") != F.col("b.id"))
                .select(
                    F.least("a.id", "b.id").alias("id_a"),
                    F.greatest("a.id", "b.id").alias("id_b"),
                )
            )
            pairs = pairs.unionByName(cross)
        pairs.distinct().write.mode("append").parquet(output_dir)
        bands.write.mode("append").parquet(index_dir)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def prune_band_index(
    spark: SparkSession,
    index_dir: str,
    keep_ids=None,
    drop_ids=None,
) -> int:
    """Retention-prune the streaming near-dup band index: keep only the
    band rows of ``keep_ids`` (or everything EXCEPT ``drop_ids``) —
    exactly one of the two must be given, each a list of ids or a
    single-column DataFrame of ids. Returns the number of band rows kept.

    Pruned ids stop producing cross-batch candidate pairs from the next
    microbatch on (the finite-dedup-horizon knob the index's state model
    promises); already-emitted pairs are history and are not rewritten.

    The filtered index is materialized (localCheckpoint) BEFORE the
    overwrite — parquet cannot be read and overwritten in one plan. The
    index is `bands` rows per doc (~40 bytes each), orders of magnitude
    smaller than the corpus, so the materialization is cheap even when
    the corpus is not; a retention pass per compaction window, not per
    batch, is the intended cadence."""
    if (keep_ids is None) == (drop_ids is None):
        raise ValueError(
            "prune_band_index: pass exactly one of keep_ids / drop_ids"
        )
    ids = keep_ids if keep_ids is not None else drop_ids
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(int(i),) for i in ids], "id bigint")
    else:
        ids = ids.select(F.col(ids.columns[0]).alias("id"))
    idx = spark.read.parquet(index_dir)
    how = "left_semi" if keep_ids is not None else "left_anti"
    kept = idx.join(ids, "id", how).localCheckpoint(eager=True)
    n = kept.count()
    kept.write.mode("overwrite").parquet(index_dir)
    return n
