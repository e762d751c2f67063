"""Conversation-level reassembly (J4 beyond the identity case).

The engine's unit of work is the turn; downstream training pipelines often
want the conversation: every turn's extracted main content concatenated in
turn order, with each turn's char spans re-offset into the conversation
string. One conv-keyed aggregation — the only conv-grain (not turn-grain)
shuffle in the engine. The hot-conversation skew is bounded here because
the aggregated values are already *extracted* text (not raw payloads), and
AQE skew handling covers the residual; the array_sort on (turn_idx, ...)
keeps output independent of shuffle arrival order.

Span offsets are LINEAR: a running-sum window over turn lengths (sort +
one pass), never a per-element prefix re-aggregation — the naive
``transform(a, (x,i) -> aggregate(slice(a,1,i), ...))`` shape is O(n²) per
conversation and would nullify the salting fix for a 10^6-turn hot
conversation (~10^12 additions on one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEP = "\n\n"


def _span_struct(x):
    return F.struct(
        x["turn_idx"].alias("turn_idx"),
        x["start"].alias("start"),
        x["end"].alias("end"),
    )


def _assemble(g: DataFrame) -> DataFrame:
    """(conv_id, n_turns, a=array<struct<turn_idx,t,start,end>> sorted) →
    final output row."""
    conv_text = F.array_join(F.transform("a", lambda x: x["t"]), SEP)
    return g.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        conv_text.alias("conv_text"),
        F.transform("a", _span_struct).alias("conv_spans"),
    )


def _with_offsets(turns: DataFrame) -> DataFrame:
    """turns + (start, end) char offsets of each turn inside its conv_text.

    The prefix sum runs as a window over (conv_id, turn_idx) on a projection
    of ONLY (conv_id, turn_idx, length) — the hot conversation's window task
    holds ~24 bytes/turn, not the text. The offsets join back on the full
    turn key (conv_id, turn_idx), which is skew-free by construction.
    """
    lens = turns.select("conv_id", "turn_idx", F.length("extracted_text").alias("ln"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.col("ln") + len(SEP)).over(w), F.lit(0)).cast("int")
    offs = lens.select(
        "conv_id",
        "turn_idx",
        start.alias("start"),
        (start + F.col("ln")).cast("int").alias("end"),
    )
    return turns.join(offs, ["conv_id", "turn_idx"])


def conversation_content(turns: DataFrame) -> DataFrame:
    """turns (conv_id, turn_idx, extracted_text, spans) →
    (conv_id, n_turns, conv_text, conv_spans) where conv_spans are
    per-turn (turn_idx, start, end) offsets into conv_text."""
    rows = _with_offsets(turns)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("turn_idx").alias("turn_idx"),
                F.col("extracted_text").alias("t"),
                F.col("start").alias("start"),
                F.col("end").alias("end"),
            )
        )
    )
    g = rows.groupBy("conv_id").agg(arr.alias("a"), F.count("*").alias("n_turns"))
    return _assemble(g)


def salted_conversation_content(turns: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """conversation_content with conv_id-salted two-phase aggregation (the
    north rule's salting requirement made explicit): phase 1 groups by
    (conv_id, salt(turn_idx)) so a 10^6-turn conversation's collect_list is
    built by `salt_buckets` tasks instead of one; phase 2 merges the
    per-salt partials (already sorted) per conv_id — the phase-2 row count
    is bounded by salt_buckets per conversation regardless of skew.

    Output is identical to conversation_content (tested); the SINGLE
    array_sort in phase 2 keys on turn_idx so the salt never leaks into
    ordering. (A per-salt array_sort in phase 1 would be dead work —
    phase 2's array_sort is a full sort, not a merge, so pre-sorted
    partials buy nothing; r5 review removed it from the skew-critical
    phase-1 tasks.) Offsets are precomputed per turn (linear window over
    lengths only), so phase 2 does no per-element prefix work."""
    rows = _with_offsets(turns)
    salt = F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets)).alias("salt")
    partial = (
        rows.select("conv_id", salt, "turn_idx", "extracted_text", "start", "end")
        .groupBy("conv_id", "salt")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("turn_idx").alias("turn_idx"),
                    F.col("extracted_text").alias("t"),
                    F.col("start").alias("start"),
                    F.col("end").alias("end"),
                )
            ).alias("pa"),
            F.count("*").alias("pn"),
        )
    )
    merged = partial.groupBy("conv_id").agg(
        F.array_sort(F.flatten(F.collect_list("pa"))).alias("a"),
        F.sum("pn").alias("n_turns"),
    )
    return _assemble(merged)
