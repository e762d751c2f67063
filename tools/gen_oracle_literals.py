"""Generate literal VALUES oracles for the transcript-pipeline queries.

Runs the pure-Python oracle (NOT Spark) over the fixed synth corpus used by
__spark_entry__ and writes metadatadocumentparser_spark/golden_literals.py
containing DuckDB SQL literals. This gives the driver's DuckDB compare real
evidence on the core extraction engine: Spark output vs independently
computed golden values.

Usage: python tools/gen_oracle_literals.py
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metadatadocumentparser_spark import oracle, synth  # noqa: E402

SYNTH_CONVS = 40
SYNTH_HOT = 20


def _values_sql(rows, cols_ddl):
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, int):
            return f"CAST({v} AS BIGINT)"
        if isinstance(v, float):
            return f"CAST({v!r} AS DOUBLE)"
        return "'" + str(v).replace("'", "''") + "'"

    vals = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES {vals}) AS t({cols_ddl})"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _jdump(obj) -> str:
    """Byte-identical to Spark to_json (no spaces, struct-field order)."""
    return json.dumps(obj, separators=(",", ":"))


def _conversation_rows(turns):
    """Independent reassembly: conv digests matching operators.reassembly
    (turn texts joined by '\\n\\n', spans re-offset into the conv string)."""
    by_conv = defaultdict(list)
    for t in turns:
        by_conv[t["conv_id"]].append(t)
    out = []
    for conv_id in sorted(by_conv):
        ts = sorted(by_conv[conv_id], key=lambda t: t["turn_idx"])
        conv_text = "\n\n".join(t["extracted_text"] for t in ts)
        spans, off = [], 0
        for t in ts:
            n = len(t["extracted_text"])
            spans.append({"turn_idx": t["turn_idx"], "start": off, "end": off + n})
            off += n + 2
        out.append(
            (conv_id, len(ts), len(conv_text), _md5(conv_text), _md5(_jdump(spans)))
        )
    return out


def _turn_digest_rows(turns):
    return [
        (
            t["conv_id"],
            t["turn_idx"],
            _md5(t["extracted_text"]),
            _md5(_jdump([{"start": s["start"], "end": s["end"]} for s in t["spans"]])),
            t["column_layout"] or "none",
        )
        for t in turns
    ]


def _meta_rows(meta):
    return [
        (
            m["conv_id"],
            m["turn_idx"],
            m["title"] if m["title"] is not None else "∅",
            m["author"] if m["author"] is not None else "∅",
            m["creation_date"] if m["creation_date"] is not None else "∅",
            m["modification_date"] if m["modification_date"] is not None else "∅",
            m["num_pages"] if m["num_pages"] is not None else -1,
            m["file_size"] if m["file_size"] is not None else -1,
        )
        for m in meta
    ]


def _multimodal_rows(images, n_features: int = 8):
    """Replicates operators.multimodal attach_image_bytes + decode_images
    (fake=True): md5-derived bytes → float32 byte histogram → e4 ints."""
    out = []
    for im in images:
        key = f"{im['conv_id']}:{im['turn_idx']}:{im['page_num']}:{im['image_index']}"
        blob = bytes.fromhex(hashlib.md5(key.encode()).hexdigest())
        arr = np.frombuffer(blob, dtype=np.uint8)
        hist = np.bincount(arr % n_features, minlength=n_features).astype(np.float32)
        feats = hist / float(arr.size)  # float32, same dtype path as the kernel
        e4 = [int(math.floor(float(v) * 10000.0 + 0.5)) for v in feats]
        out.append(
            (
                im["conv_id"],
                im["turn_idx"],
                im["page_num"],
                im["image_index"],
                im["width"],
                im["height"],
                im["ext"],
                len(blob),
                _jdump(e4),
            )
        )
    return out


def _media_chain(kind: str, conv_id: str, turn_idx: int, n_blocks: int = 4) -> bytes:
    """Replicates multimodal.attach_media_bytes: md5 chain over hex strings."""
    blocks = [hashlib.md5(f"{kind}:{conv_id}:{turn_idx}".encode()).hexdigest()]
    for _ in range(n_blocks - 1):
        blocks.append(hashlib.md5(blocks[-1].encode()).hexdigest())
    return bytes.fromhex("".join(blocks))


def _resize_rows(images, target_w: int = 32, target_h: int = 32):
    """Replicates multimodal.resize_images(fake=True) over the image keys."""
    n_out = max(1, math.ceil(target_w * target_h / 256))
    out = []
    for im in images:
        key = f"{im['conv_id']}:{im['turn_idx']}:{im['page_num']}:{im['image_index']}"
        raw = bytes.fromhex(hashlib.md5(key.encode()).hexdigest())
        idx = np.linspace(0, len(raw) - 1, num=min(n_out, len(raw)), dtype=np.int64)
        resized = np.frombuffer(raw, dtype=np.uint8)[idx].tobytes()
        out.append(
            (
                im["conv_id"],
                im["turn_idx"],
                im["page_num"],
                im["image_index"],
                im["ext"],
                target_w,
                target_h,
                len(resized),
                hashlib.md5(resized).hexdigest(),
            )
        )
    return out


def _audio_rows(rows, window: int = 16):
    """Replicates multimodal.audio_window_energy over the synth turn keys."""
    out = []
    for r in sorted({(x["conv_id"], x["turn_idx"]) for x in rows}):
        arr = np.frombuffer(_media_chain("audio", *r), dtype=np.uint8)
        n_win = arr.size // window
        x = arr[: n_win * window].astype(np.float64).reshape(n_win, window)
        for i, v in enumerate(((x - 128.0) ** 2).mean(axis=1)):
            out.append((r[0], r[1], i, int(math.floor(v * 10000.0 + 0.5))))
    return out


def _video_rows(rows, frame_bytes: int = 16, every_n: int = 2):
    """Replicates multimodal.video_frame_sample over the synth turn keys."""
    out = []
    for r in sorted({(x["conv_id"], x["turn_idx"]) for x in rows}):
        raw = _media_chain("video", *r)
        for i in range(0, len(raw) // frame_bytes, every_n):
            frame = raw[i * frame_bytes : (i + 1) * frame_bytes]
            out.append((r[0], r[1], i, hashlib.md5(frame).hexdigest()))
    return out


def _shape_stats_rows(g):
    """(section, k, v BIGINT) long-format corpus-shape rows — the literal
    oracle for the merged transcripts_shape_stats driver query."""
    by_type = Counter(b["block_type"] for b in g["blocks"])
    layout = Counter((t["column_layout"] or "none") for t in g["turns"])
    n_f = len(g["formulas"])
    sum_conf_e4 = int(
        math.floor(sum(f["confidence"] for f in g["formulas"]) * 10000.0 + 0.5)
    )
    n_latex = len({f["latex"] for f in g["formulas"]})
    n_turns = len(g["turns"])
    sum_chars = sum(len(t["extracted_text"]) for t in g["turns"])
    n_spans = sum(len(t["spans"]) for t in g["turns"])
    span_sum = sum(s["start"] + s["end"] for t in g["turns"] for s in t["spans"])
    seg = Counter(s["is_content"] for s in g["segments"])
    rows = [("blocks", k, v) for k, v in sorted(by_type.items())]
    rows += [("layout", k, v) for k, v in sorted(layout.items())]
    rows += [
        ("formula", "n_formulas", n_f),
        ("formula", "sum_conf_e4", sum_conf_e4),
        ("formula", "n_latex", n_latex),
    ]
    rows += [
        ("spans", "n_turns", n_turns),
        ("spans", "sum_chars", sum_chars),
        ("spans", "n_spans", n_spans),
        ("spans", "span_sum", span_sum),
    ]
    rows += [
        ("segments", "true" if k else "false", v) for k, v in sorted(seg.items())
    ]
    return rows


def _compare_methods_rows(rows):
    """Per-text-method corpus shape (A5 comparison + S5 pdfplumber):
    independent oracle runs with each method's parse flags."""
    out = []
    for method in ("pymupdf", "pdfplumber"):
        g = oracle.oracle_corpus(rows, text_method=method)
        out.append(
            (
                method,
                len(g["turns"]),
                len(g["blocks"]),
                sum(len(t["extracted_text"]) for t in g["turns"]),
                sum(len(t["spans"]) for t in g["turns"]),
                sum(1 for t in g["turns"] if t["column_layout"] is not None),
            )
        )
    return out


def main():
    rows = synth.synth_local(SYNTH_CONVS, hot_factor=SYNTH_HOT)
    g = oracle.oracle_corpus(rows)

    literal_sql = {
        "transcripts_shape_stats": _values_sql(
            _shape_stats_rows(g), "section, k, v"
        ),
        "transcripts_compare_methods": _values_sql(
            _compare_methods_rows(rows),
            "method, n_turns, n_blocks, n_chars, n_spans, n_layout_votes",
        ),
        "conversation_content": _values_sql(
            _conversation_rows(g["turns"]),
            "conv_id, n_turns, n_chars, text_md5, spans_md5",
        ),
        "transcripts_extract_turns": _values_sql(
            _turn_digest_rows(g["turns"]),
            "conv_id, turn_idx, text_md5, spans_md5, layout",
        ),
        "transcripts_meta": _values_sql(
            _meta_rows(g["meta"]),
            "conv_id, turn_idx, title, author, creation_date, modification_date, "
            "num_pages, file_size",
        ),
        "multimodal_image_features": _values_sql(
            _multimodal_rows(g["images"]),
            "conv_id, turn_idx, page_num, image_index, width, height, ext, "
            "n_bytes, features_e4",
        ),
        "multimodal_resize": _values_sql(
            _resize_rows(g["images"]),
            "conv_id, turn_idx, page_num, image_index, ext, width, height, "
            "n_bytes, resized_md5",
        ),
        "multimodal_audio_energy": _values_sql(
            _audio_rows(rows), "conv_id, turn_idx, window_idx, energy_e4"
        ),
        "multimodal_video_frames": _values_sql(
            _video_rows(rows), "conv_id, turn_idx, frame_idx, frame_md5"
        ),
    }

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metadatadocumentparser_spark",
        "golden_literals.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""AUTO-GENERATED by tools/gen_oracle_literals.py — literal DuckDB\n'
            "oracles for the transcript-pipeline queries (pure-Python oracle over\n"
            f"the synth corpus n_convs={SYNTH_CONVS}, hot_factor={SYNTH_HOT}).\n"
            'Regenerate after changing synth/oracle semantics."""\n\n'
        )
        f.write("LITERAL_SQL = {\n")
        for k, v in literal_sql.items():
            f.write(f"    {k!r}: {v!r},\n")
        f.write("}\n")
    print(f"wrote {out}")
    for k, v in literal_sql.items():
        print(k, "->", v[:100], "...")


if __name__ == "__main__":
    main()
