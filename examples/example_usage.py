"""Basic usage — the reference's example_usage.py workflow, Spark-native.

Reference: /root/reference/example_usage.py (parse → inspect metadata,
blocks in reading order, images, tables, formulas; reading-order preview
example_usage.py:228). One document there = one transcript turn here; the
same calls run unchanged over a billion turns.

Run: PYTHONPATH=. python examples/example_usage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadatadocumentparser_spark.session import get_spark
from metadatadocumentparser_spark.synth import TRANSCRIPT_DDL, synth_local
from metadatadocumentparser_spark.plans import extract_all


def main():
    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(synth_local(6, 4), schema=TRANSCRIPT_DDL)

    outs = extract_all(df)

    print("=== Document metadata ===")
    outs["meta"].orderBy("conv_id", "turn_idx").show(5, truncate=30)

    print("=== Text blocks in reading order (W1/W3) ===")
    outs["blocks"].orderBy("conv_id", "turn_idx", "block_idx").select(
        "conv_id", "turn_idx", "block_idx", "page_num", "block_type",
        F.substring("text", 1, 40).alias("preview"),
    ).show(10, truncate=False)

    print("=== Per-turn main content + spans + layout vote ===")
    outs["turns"].orderBy("conv_id", "turn_idx").show(5, truncate=50)

    print("=== Images / tables / formulas ===")
    outs["images"].show(3)
    outs["tables"].show(3, truncate=30)
    outs["formulas"].show(5, truncate=30)
    spark.stop()


if __name__ == "__main__":
    main()
