"""Multi-column handling — the reference's example_multi_column.py.

Reference: /root/reference/example_multi_column.py (column-aware vs simple
extraction, annotated column visualization, layout vote). Shows the greedy
column join (layout.py:140-272) producing left-column-before-right reading
order, and the same turn extracted without column awareness for contrast.

Run: PYTHONPATH=. python examples/example_multi_column.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadatadocumentparser_spark.session import get_spark
from metadatadocumentparser_spark.synth import TRANSCRIPT_DDL, synth_local, shape_for
from metadatadocumentparser_spark.plans import extract_all
from metadatadocumentparser_spark.sinks import visualize_columns


def main():
    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        r for r in synth_local(30, 4)
        if shape_for(int(r["conv_id"][5:]), r["turn_idx"]) in ("double", "multi")
    ][:12]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_DDL)

    print("=== Column-aware (default) ===")
    aware = extract_all(df)
    aware["turns"].orderBy("conv_id", "turn_idx").select(
        "conv_id", "turn_idx", "column_layout",
        F.substring("extracted_text", 1, 60).alias("preview"),
    ).show(6, truncate=False)

    print("=== Simple mode (column_aware=False) for contrast ===")
    simple = extract_all(df, column_aware=False)
    simple["blocks"].groupBy("block_type").count().show()

    print("=== Detected column boxes (K7 visualization) ===")
    print(json.dumps(visualize_columns(df, n_turns=2), indent=2)[:1200])
    spark.stop()


if __name__ == "__main__":
    main()
