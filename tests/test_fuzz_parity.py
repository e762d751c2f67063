"""Differential fuzzing: random adversarial payloads → engine must equal
the oracle exactly. This is where regex-dialect and whitespace-semantics
bugs hide (Java rlike vs Python re; trim vs str.strip); the alphabet
deliberately includes NBSP, line/paragraph separators, Greek, CJK,
accented letters, regex metacharacters, '$', backslash, sub/superscript
markers and math symbols."""

from __future__ import annotations

import random

from metadatadocumentparser_spark import oracle, synth
from metadatadocumentparser_spark.plans import extract_all

ALPHABET = (
    list("abcdefghij XYZ 0123456789")
    + list("αβπΣΔ∑∫≤≥≠∞")
    + list(".,;:!?()[]{}^_/\\$|<>%=+-*")
    + [" ", " ", "é", "ü", "中", "文", "\t"]
)

_N_TURNS = 120


def _rand_text(rng: random.Random, lo=1, hi=40) -> str:
    s = "".join(rng.choice(ALPHABET) for _ in range(rng.randint(lo, hi)))
    return s.replace("\n", " ").replace("|", "/")  # markup delimiters


def _fuzz_payload(rng: random.Random) -> str:
    kind = rng.random()
    out = []
    if rng.random() < 0.5:
        out.append(f"%%DOC title={_rand_text(rng, 1, 10)};author=A")
    if kind < 0.15:
        # HTML payload with adversarial text
        segs = "".join(
            f"<p>{_rand_text(rng, 1, 60)}</p>\n" for _ in range(rng.randint(1, 6))
        )
        nav = f'<nav><a href="/x">{_rand_text(rng, 1, 8)}</a></nav>'
        return "\n".join(out) + f"\n%%HTML\n<html><body>{nav}\n{segs}</body></html>"
    for _ in range(rng.randint(1, 2)):
        w, h = rng.choice(((612.0, 792.0), (200.0, 300.0)))
        out.append(f"%%PAGE {w:g} {h:g}")
        if rng.random() < 0.3:
            out.append(f"%%DRAW 10 10 {w - 10:g} 40")
        if rng.random() < 0.3:
            out.append(f"%%IMG 50 50 150 150 100 100 rgb png")
        for _ in range(rng.randint(0, 6)):
            x0 = rng.uniform(0, w - 60)
            y0 = rng.uniform(0, h - 20)
            size = rng.choice((8.0, 9.5, 11.0, 12.0, 13.0, 16.0, 17.0))
            out.append(f"%%BLK {x0:g} {y0:g} {x0 + 55:g} {y0 + 14:g}")
            dirv = "1 0" if rng.random() > 0.1 else "0 1"
            out.append(f"%%LN {x0:g} {y0:g} {x0 + 55:g} {y0 + 12:g} {dirv}")
            for _ in range(rng.randint(1, 2)):
                out.append(f"%%SP {size:g} F|{_rand_text(rng)}")
        for _ in range(rng.randint(0, 4)):
            x = rng.uniform(0, w - 30)
            t = rng.uniform(0, h - 12)
            out.append(f"%%WORD {x:g} {x + 20:g} {t:g} {t + 10:g}|{_rand_text(rng, 1, 8)}")
    return "\n".join(out)


def _rows():
    rng = random.Random("fuzz-parity-r1")
    rows = []
    for i in range(_N_TURNS):
        rows.append(
            {
                "conv_id": f"fz-{i:04d}",
                "turn_idx": 0,
                "role": "tool",
                "text": _fuzz_payload(rng),
                "tool": "fetch_pdf",
                "ts": synth.EPOCH,
            }
        )
    return rows


def test_fuzz_parity(spark):
    rows = _rows()
    golden = oracle.oracle_corpus(rows)
    outs = extract_all(spark.createDataFrame(rows, schema=synth.TRANSCRIPT_DDL))

    got_turns = [
        (r.conv_id, r.extracted_text, tuple((s.start, s.end) for s in r.spans), r.column_layout)
        for r in outs["turns"].orderBy("conv_id").collect()
    ]
    want_turns = [
        (t["conv_id"], t["extracted_text"], tuple((s["start"], s["end"]) for s in t["spans"]), t["column_layout"])
        for t in golden["turns"]
    ]
    assert got_turns == want_turns

    got_f = [
        (r.conv_id, r.formula_index, r.formula_text, r.latex, r.confidence)
        for r in outs["formulas"].orderBy("conv_id", "formula_index").collect()
    ]
    want_f = [
        (f["conv_id"], f["formula_index"], f["formula_text"], f["latex"], f["confidence"])
        for f in golden["formulas"]
    ]
    assert len(got_f) == len(want_f), (len(got_f), len(want_f))
    for g, w in zip(got_f, want_f):
        assert g == w, (g, w)
    assert want_f, "fuzz corpus produced no formulas — weak fuzz"

    got_b = [
        (r.conv_id, r.block_idx, r.block_type, r.font_size)
        for r in outs["blocks"].orderBy("conv_id", "block_idx").collect()
    ]
    want_b = [
        (b["conv_id"], b["block_idx"], b["block_type"], b["font_size"])
        for b in golden["blocks"]
    ]
    assert got_b == want_b

    got_s = [
        (r.conv_id, r.seg_idx, r.is_content, r.words, r.link_density)
        for r in outs["segments"].orderBy("conv_id", "seg_idx").collect()
    ]
    want_s = [
        (s["conv_id"], s["seg_idx"], s["is_content"], s["words"], s["link_density"])
        for s in golden["segments"]
    ]
    assert got_s == want_s
