"""As-of join — match each left row to the latest right row at or before
its timestamp, per key. The temporal join every event/feature pipeline
needs (point-in-time-correct feature lookup, trade-to-quote matching).

Spark has no native as-of join; the naive formulation
``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + row_number is a range theta
join that explodes to |l|·|r| per key before filtering. This operator uses
the UNION + running-last trick instead: tag both sides, union them, sort
each key partition once by (ts, side) and carry the last non-null right
payload forward with a running window — ONE shuffle on the key, linear
work, no pair blowup, and the hot key spreads no worse than a groupBy.

Tie policy matches DuckDB/QuestDB ASOF semantics: a right row at exactly
the left timestamp matches (<=), guaranteed by ordering right rows before
left rows within equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """left columns + the latest right ``payload_cols`` (per ``by`` key,
    right ``ts_col`` <= left ``ts_col``). how="left" keeps unmatched left
    rows with null payload; "inner" drops them.

    ``right`` must be unique per (by, ts_col) — pre-aggregate it if not
    (ties would otherwise be shuffle-order dependent).

    The right payload is carried forward as ONE struct (not per-column
    ``last(ignorenulls)``): independent per-column carries would stitch
    together fields from DIFFERENT right rows whenever the latest right row
    has a NULL in one payload column (and an inner join keyed on the first
    payload column's nullity would drop genuine matches whose first field
    is NULL). The struct is atomically non-null for every right row, so the
    match test and every projected field come from the same matched row —
    DuckDB/QuestDB ASOF semantics for nullable payloads."""
    pay_struct = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    lu = left.select(
        "*",
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_struct).alias("__rpay"),
    )
    left_cols = [c for c in left.columns]
    clash = set(payload_cols) & set(left_cols)
    if clash:
        raise ValueError(
            f"asof_join: payload_cols {sorted(clash)} collide with left "
            "columns — the result would carry duplicate field names "
            "(AMBIGUOUS_REFERENCE downstream); alias the payload first"
        )
    # a right row with NULL ts sorts FIRST under the ascending window and
    # would be carried into every left row as a phantom match; ASOF
    # semantics (DuckDB/QuestDB r.ts <= l.ts) never match a NULL
    # timestamp (r5 review)
    right = right.where(F.col(ts_col).isNotNull())
    ru = right.select(
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("__rpay"),
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (by, ts_col)],
    )
    u = lu.unionByName(ru)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *left_cols,
        "__side",
        F.last("__rpay", ignorenulls=True).over(w).alias("__rpay"),
    )
    out = carried.where(F.col("__side") == 1).drop("__side")
    if how == "inner":
        out = out.where(F.col("__rpay").isNotNull())
    elif how != "left":
        raise ValueError(f"unknown how {how!r}")
    return out.select(
        *left_cols, *[F.col("__rpay").getField(c).alias(c) for c in payload_cols]
    )


def events_asof(
    events: DataFrame, left_type: str, right_type: str
) -> DataFrame:
    """Concrete instance over the events table: for each ``left_type``
    event, the latest ``right_type`` event of the same user at or before
    it. Right side pre-aggregated unique per (user_id, ep) with
    deterministic max_by tie-break."""
    e = events.select(
        "user_id",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ep"),
        "event_type",
        "value",
    )
    l = e.where(F.col("event_type") == left_type).select("user_id", "event_id", "ep")
    r = (
        e.where(F.col("event_type") == right_type)
        .groupBy("user_id", "ep")
        .agg(
            F.max("event_id").alias("r_event_id"),
            F.max_by("value", "event_id").alias("r_value"),
        )
    )
    out = asof_join(l, r, by="user_id", ts_col="ep",
                    payload_cols=["r_event_id", "r_value"])
    return out.select(
        "user_id", "event_id", "ep", "r_event_id",
        F.round("r_value", 3).alias("r_value"),
    )
