"""Local replica of the driver's correctness gate: every queries() entry
with an oracle_sql() entry is executed on Spark AND DuckDB and compared on
row count + column names + order-insensitive values.

Runs at sf0.001 by default (fast); set MDP_ORACLE_SF=/root/testdata/sf0.01
to replicate the driver's exact scale.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from metadatadocumentparser_spark.sources.tables import TESTDATA_TABLES  # noqa: E402

SF_DIR = os.environ.get("MDP_ORACLE_SF", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _duck(sql):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.sql(sql)
    cols = [c.lower() for c in cur.columns]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t),
    ), [cols[i] for i in order]


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = _duck(ORACLES[name])
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    sm, _ = _multiset(scols, srows)
    om, _ = _multiset(ocols, orows)
    mismatches = [(a, b) for a, b in zip(sm, om) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_all_queries_run(spark):
    """Rows-only entries (no oracle) must at least execute and be stable."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.count() > 0
    assert {"conv_id", "turn_idx", "extracted_text", "spans"} <= set(df.columns)
    assert rows[0].extracted_text is not None
