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


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw line-oriented text ingestion (one doc per line — the JSONL-less
    crawl dump format): (doc_id, text) where doc_id is a deterministic
    content-independent id derived from (file, line offset) via
    monotonically-stable input metadata. Lines split-parallel at scale
    (the text source splits files on newlines like any line format)."""
    df = spark.read.format("text").load(path)
    # id = md5 of (input file, line number within file). Line numbers
    # come from a per-file window over monotonically_increasing_id —
    # deterministic for identical inputs under an identical scan
    # configuration (split offsets order the scan partitions); the window
    # is one full shuffle of the raw lines, paid once at ingest to give
    # every doc a stable identity even when line CONTENT repeats
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # input_file_name() is only defined in the SCAN stage (it returns ''
    # after an exchange) — capture it before the window shuffle
    src = df.select(
        F.input_file_name().alias("f"),
        F.monotonically_increasing_id().alias("m"),
        F.col("value"),
    )
    w = Window.partitionBy("f").orderBy("m")
    return src.select(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", "f", F.row_number().over(w).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("bigint").alias("doc_id"),
        F.col("value").alias("text"),
    )


def read_whole_text_files(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file text ingestion (one doc per FILE — scraped pages, book
    files): (doc_id, path, text). wholetext files are NOT split-parallel
    (each file is one record — parallelism = file count); fine for many
    modest files, wrong for one giant file."""
    from pyspark.sql import functions as F

    df = spark.read.format("text").option("wholetext", "true").load(path)
    return df.select(
        F.conv(F.substring(F.md5(F.input_file_name()), 1, 15), 16, 10)
        .cast("bigint").alias("doc_id"),
        F.input_file_name().alias("path"),
        F.col("value").alias("text"),
    )
