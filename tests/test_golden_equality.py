"""Primary correctness gate: Spark engine vs pure-Python oracle, exact.

Per the north rule: extracted text and char-span offsets per turn must
byte-match the oracle's per-turn output under stable (conv_id, turn_idx)
ordering — plus the same for blocks / formulas / images / tables / meta /
segments. Doubles are compared exactly (identical arithmetic order on both
sides)."""

from __future__ import annotations

import pytest

from metadatadocumentparser_spark import oracle, synth
from metadatadocumentparser_spark.plans import extract_all

N_CONVS = 20
HOT = 10  # keep the smoke tier small but still skewed


def _rows():
    return synth.synth_local(N_CONVS, hot_factor=HOT)


@pytest.fixture(scope="module")
def golden():
    return oracle.oracle_corpus(_rows())


@pytest.fixture(scope="module")
def engine_outputs(spark):
    df = spark.createDataFrame(_rows(), schema=synth.TRANSCRIPT_DDL)
    outs = extract_all(df)
    outs["parsed"].cache().count()
    yield outs
    outs["parsed"].unpersist()


def _collect(df, key_cols=("conv_id", "turn_idx")):
    rows = [r.asDict(recursive=True) for r in df.collect()]
    rows.sort(key=lambda d: tuple(d[k] for k in key_cols))
    return rows


def _spans_to_dicts(rows):
    return rows


def test_turns_exact(golden, engine_outputs):
    got = _collect(engine_outputs["turns"])
    want = golden["turns"]
    assert len(got) == len(want)
    # secondary sort inside a turn is impossible (one row per turn)
    for g, w in zip(got, want):
        assert (g["conv_id"], g["turn_idx"]) == (w["conv_id"], w["turn_idx"])
        assert g["extracted_text"] == w["extracted_text"], (g["conv_id"], g["turn_idx"])
        assert g["spans"] == w["spans"], (g["conv_id"], g["turn_idx"])
        assert g["column_layout"] == w["column_layout"], (g["conv_id"], g["turn_idx"])


def _check_table(got, want, order_key, fields):
    assert len(got) == len(want), (len(got), len(want))
    got = sorted(got, key=order_key)
    want = sorted(want, key=order_key)
    for g, w in zip(got, want):
        for f in fields:
            assert g[f] == w[f], (g["conv_id"], g["turn_idx"], f, g[f], w[f])


def test_blocks_exact(golden, engine_outputs):
    got = _collect(engine_outputs["blocks"])
    key = lambda d: (d["conv_id"], d["turn_idx"], d["block_idx"])  # noqa: E731
    _check_table(
        got,
        golden["blocks"],
        key,
        [
            "conv_id", "turn_idx", "block_idx", "page_num", "bbox", "text",
            "font_size", "font_name", "block_type", "span_start", "span_end",
        ],
    )


def test_formulas_exact(golden, engine_outputs):
    got = _collect(engine_outputs["formulas"])
    key = lambda d: (d["conv_id"], d["turn_idx"], d["formula_index"])  # noqa: E731
    _check_table(
        got,
        golden["formulas"],
        key,
        [
            "conv_id", "turn_idx", "formula_index", "page_num", "bbox",
            "formula_text", "latex", "confidence",
        ],
    )


def test_formulas_nonempty(golden):
    assert len(golden["formulas"]) > 0  # fixture must actually exercise F2


def test_images_exact(golden, engine_outputs):
    got = _collect(engine_outputs["images"])
    key = lambda d: (d["conv_id"], d["turn_idx"], d["page_num"], d["image_index"])  # noqa: E731
    _check_table(
        got,
        golden["images"],
        key,
        ["conv_id", "turn_idx", "image_index", "page_num", "bbox", "width",
         "height", "colorspace", "ext", "image_bytes"],
    )


def test_tables_exact(golden, engine_outputs):
    got = _collect(engine_outputs["tables"])
    key = lambda d: (d["conv_id"], d["turn_idx"], d["table_index"])  # noqa: E731
    _check_table(
        got,
        golden["tables"],
        key,
        ["conv_id", "turn_idx", "table_index", "page_num", "bbox", "data",
         "extraction_method"],
    )


def test_meta_exact(golden, engine_outputs):
    got = _collect(engine_outputs["meta"])
    want = golden["meta"]
    key = lambda d: (d["conv_id"], d["turn_idx"])  # noqa: E731
    got = sorted(got, key=key)
    want = sorted(want, key=key)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for f in (
            "title", "author", "subject", "creator", "producer",
            "creation_date", "modification_date", "num_pages", "file_size",
        ):
            assert g[f] == w[f], (g["conv_id"], g["turn_idx"], f, g[f], w[f])
        assert [[p["width"], p["height"]] for p in g["page_sizes"]] == w["page_sizes"]


def test_segments_exact(golden, engine_outputs):
    got = _collect(engine_outputs["segments"])
    key = lambda d: (d["conv_id"], d["turn_idx"], d["seg_idx"])  # noqa: E731
    _check_table(
        got,
        golden["segments"],
        key,
        ["conv_id", "turn_idx", "seg_idx", "text", "start", "end", "tag_path",
         "words", "link_density", "boiler_container", "is_content"],
    )


def test_segments_have_both_classes(golden):
    flags = {s["is_content"] for s in golden["segments"]}
    assert flags == {True, False}
