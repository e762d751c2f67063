"""TOON / JSON export — the reference's example_toon_export.py.

Reference: /root/reference/example_toon_export.py (export to TOON with
different delimiters, compare token counts vs JSON — the README contract
this engine implements, fixing the reference's key-mismatch bug that would
KeyError its own example at example_toon_export.py:52-65).

Run: PYTHONPATH=. python examples/example_toon_export.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metadatadocumentparser_spark.session import get_spark
from metadatadocumentparser_spark.synth import TRANSCRIPT_DDL, synth_local
from metadatadocumentparser_spark.plans import extract_all
from metadatadocumentparser_spark.sinks import (
    canonical_struct,
    compare_export_formats,
    export,
    export_json,
)


def main():
    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(synth_local(4, 3), schema=TRANSCRIPT_DDL)
    doc = canonical_struct(extract_all(df))

    print("=== TOON export (comma delimiter) ===")
    row = export(doc, format="toon").orderBy("conv_id", "turn_idx").first()
    print(row.toon[:800])

    print("\n=== Format comparison (README contract) ===")
    d = json.loads(export_json(doc).orderBy("conv_id", "turn_idx").first().json)
    for k, v in compare_export_formats(d).items():
        print(f"  {k}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
