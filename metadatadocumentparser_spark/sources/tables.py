"""Driver-testdata parquet loaders (TESTDATA.md).

At cluster scale these reads would be Iceberg scans with partition pruning;
here they are plain parquet with the same DataFrame surface. Filters and
column selection placed on these readers reach the parquet scan (verify
with .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
