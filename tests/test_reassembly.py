"""Conversation reassembly: conv_text equals ordered turn concatenation and
conv_spans slice back to each turn's extracted text."""

from __future__ import annotations

from metadatadocumentparser_spark import oracle, synth
from metadatadocumentparser_spark.operators.reassembly import SEP, conversation_content
from metadatadocumentparser_spark.plans import parse_transcripts, turns_of


def test_conversation_content(spark):
    rows = synth.synth_local(8, hot_factor=5)
    golden = oracle.oracle_corpus(rows)
    by_conv: dict = {}
    for t in golden["turns"]:
        by_conv.setdefault(t["conv_id"], []).append((t["turn_idx"], t["extracted_text"]))

    df = spark.createDataFrame(rows, schema=synth.TRANSCRIPT_DDL)
    got = conversation_content(turns_of(parse_transcripts(df))).collect()
    assert len(got) == len(by_conv)
    for r in got:
        want_turns = sorted(by_conv[r.conv_id])
        want_text = SEP.join(t for _, t in want_turns)
        assert r.conv_text == want_text, r.conv_id
        assert r.n_turns == len(want_turns)
        # spans slice back to the per-turn text
        for s, (ti, t) in zip(r.conv_spans, want_turns):
            assert s.turn_idx == ti
            assert r.conv_text[s.start : s.end] == t


def test_salted_equals_unsalted(spark):
    """Salted two-phase conv aggregation is output-identical to the direct
    one (the salt affects the physical plan only)."""
    from metadatadocumentparser_spark.operators.reassembly import (
        salted_conversation_content,
    )

    rows = synth.synth_local(8, hot_factor=20)  # conv 0 = 200 turns (hot)
    df = spark.createDataFrame(rows, schema=synth.TRANSCRIPT_DDL)
    turns = turns_of(parse_transcripts(df))

    def norm(d):
        return sorted(
            (r.conv_id, r.n_turns, r.conv_text,
             tuple((s.turn_idx, s.start, s.end) for s in r.conv_spans))
            for r in d.collect()
        )

    assert norm(salted_conversation_content(turns, 16)) == norm(
        conversation_content(turns)
    )


def test_salted_matches_unsalted_under_heavy_skew(spark):
    """hot_factor 2000: one conversation carries ~20k of ~24k turns.
    The salted two-phase aggregation must produce byte-identical output
    (the salt must never leak into ordering or offsets)."""
    from pyspark.sql import functions as F
    from metadatadocumentparser_spark import synth
    from metadatadocumentparser_spark.plans import parse_transcripts, turns_of
    from metadatadocumentparser_spark.operators.reassembly import (
        conversation_content,
        salted_conversation_content,
    )

    turns = turns_of(parse_transcripts(synth.synth_df(spark, n_convs=400, hot_factor=2000)))

    def digest(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.length("conv_text")).alias("chars"),
            F.sum(F.size("conv_spans")).alias("spans"),
            F.sum(F.crc32(F.concat_ws("|", "conv_id", F.md5("conv_text"),
                                      F.md5(F.to_json("conv_spans"))))).alias("crc"),
        ).collect()[0]

    assert list(digest(salted_conversation_content(turns))) == list(
        digest(conversation_content(turns))
    )
