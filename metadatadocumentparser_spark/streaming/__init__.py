"""Structured Streaming wrapper (incremental extraction).

The reference has no streaming semantics (SURVEY.md §2.10) and the north
rule's resumability is batch lineage (plans/lineage.py). This module is the
thin incremental-ingest path: a file-source readStream over the transcript
schema, running the SAME batch pipeline per micro-batch via foreachBatch —
checkpointed by Spark, exactly-once per input file.
"""

from .stream import extract_stream  # noqa: F401
