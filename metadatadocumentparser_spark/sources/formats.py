"""Source-format seam: the same tables in parquet / ORC / JSON-lines / CSV.

Columnar formats (parquet, ORC) are the scale path — column pruning and
predicate pushdown reach the scan, splits are size-balanced. JSON/CSV are
ingest formats a real corpus arrives in; reads ALWAYS take an explicit
schema (schema inference is a full extra pass over 100 TB and silently
drifts types — never infer at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc", "json", "csv")

# full microsecond precision: the default pattern truncates to millis and
# silently corrupts event timestamps through a text round-trip
_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}
_CSV_OPTS = {
    "header": "true",
    # JSON props / free text contain commas and quotes: standard quoting
    "quote": '"',
    "escape": '"',
    # free text contains NEWLINES: without multiLine the reader splits a
    # quoted multi-line value into broken rows (writer quotes it fine, the
    # default reader does not honor it). Cost at scale: multiLine CSV files
    # are not split-parallel — one more reason columnar is the scale path.
    "multiLine": "true",
    **_TS_OPTS,
}


def _opts(fmt: str) -> dict:
    if fmt == "csv":
        return _CSV_OPTS
    if fmt == "json":
        return _TS_OPTS
    return {}


def write_table(df: DataFrame, path: str, fmt: str) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    for k, v in _opts(fmt).items():
        w = w.option(k, v)
    w.save(path)


def read_table_as(spark: SparkSession, path: str, fmt: str, schema) -> DataFrame:
    """Explicit-schema read (DDL string or StructType). No inference, ever."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")
    r = spark.read.format(fmt).schema(schema)
    for k, v in _opts(fmt).items():
        r = r.option(k, v)
    return r.load(path)
