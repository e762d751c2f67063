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
