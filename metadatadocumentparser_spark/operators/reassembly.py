"""Conversation-level reassembly (J4 beyond the identity case).

The engine's unit of work is the turn; downstream training pipelines often
want the conversation: every turn's extracted main content concatenated in
turn order, with each turn's char spans re-offset into the conversation
string. One conv-keyed aggregation — the only conv-grain (not turn-grain)
shuffle in the engine. The hot-conversation skew is bounded here because
the aggregated values are already *extracted* text (not raw payloads), and
AQE skew handling covers the residual; the array_sort on (turn_idx, ...)
keeps output independent of shuffle arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\n\n"


def conversation_content(turns: DataFrame) -> DataFrame:
    """turns (conv_id, turn_idx, extracted_text, spans) →
    (conv_id, n_turns, conv_text, conv_spans) where conv_spans are
    per-turn (turn_idx, start, end) offsets into conv_text."""
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("turn_idx").alias("turn_idx"),
                F.col("extracted_text").alias("t"),
            )
        )
    )
    g = turns.groupBy("conv_id").agg(arr.alias("a"), F.count("*").alias("n_turns"))
    texts = F.transform(F.col("a"), lambda x: x["t"])
    # running start offset of each turn inside conv_text: cumulative lengths
    # + separator widths, via a transform over indices (no second shuffle)
    conv_text = F.array_join(texts, SEP)
    spans = F.expr(
        "transform(a, (x, i) -> struct(x.turn_idx as turn_idx, "
        f"aggregate(slice(a, 1, i), 0, (acc, y) -> acc + length(y.t) + {len(SEP)}) as start, "
        f"aggregate(slice(a, 1, i), 0, (acc, y) -> acc + length(y.t) + {len(SEP)}) + length(x.t) as end))"
    )
    return g.select(
        "conv_id",
        "n_turns",
        conv_text.alias("conv_text"),
        spans.alias("conv_spans"),
    )


def salted_conversation_content(turns: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """conversation_content with conv_id-salted two-phase aggregation (the
    north rule's salting requirement made explicit): phase 1 groups by
    (conv_id, salt(turn_idx)) so a 10^6-turn conversation's collect_list is
    built by `salt_buckets` tasks instead of one; phase 2 merges the
    per-salt partials (already sorted) per conv_id — the phase-2 row count
    is bounded by salt_buckets per conversation regardless of skew.

    Output is identical to conversation_content (tested); the inner
    array_sort keys on turn_idx so the salt never leaks into ordering."""
    salt = F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets)).alias("salt")
    partial = (
        turns.select("conv_id", salt, "turn_idx", "extracted_text")
        .groupBy("conv_id", "salt")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("turn_idx").alias("turn_idx"),
                        F.col("extracted_text").alias("t"),
                    )
                )
            ).alias("pa"),
            F.count("*").alias("pn"),
        )
    )
    merged = partial.groupBy("conv_id").agg(
        F.array_sort(F.flatten(F.collect_list("pa"))).alias("a"),
        F.sum("pn").alias("n_turns"),
    )
    conv_text = F.array_join(F.transform(F.col("a"), lambda x: x["t"]), SEP)
    spans = F.expr(
        "transform(a, (x, i) -> struct(x.turn_idx as turn_idx, "
        f"aggregate(slice(a, 1, i), 0, (acc, y) -> acc + length(y.t) + {len(SEP)}) as start, "
        f"aggregate(slice(a, 1, i), 0, (acc, y) -> acc + length(y.t) + {len(SEP)}) + length(x.t) as end))"
    )
    return merged.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        conv_text.alias("conv_text"),
        spans.alias("conv_spans"),
    )
