"""Transcript-corpus source (north rule: Iceberg tables of transcripts).

``load_transcripts`` accepts either
- ``iceberg:<catalog.db.table>`` — a DataSourceV2 Iceberg scan (requires the
  iceberg-spark-runtime jar + catalog conf on the cluster; partition pruning,
  snapshot isolation and `snapshot_id` pinning come with it), or
- a plain parquet path (this sandbox's tested path; same DataFrame surface).

Snapshot pinning matters for lineage (plans/lineage.py): a resumed run must
see the same input it started on. With Iceberg that is `VERSION AS OF`; for
parquet we fingerprint the file list (lineage.input_snapshot_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def load_transcripts(
    spark: SparkSession, source: str, snapshot_id: int | None = None
) -> DataFrame:
    if source.startswith(ICEBERG_PREFIX):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(source[len(ICEBERG_PREFIX):])
    if snapshot_id is not None:
        raise ValueError("snapshot_id pinning requires an iceberg: source")
    return spark.read.parquet(source)
