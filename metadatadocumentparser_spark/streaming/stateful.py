"""Custom stateful streaming operator: sessionization with GroupState.

The arbitrary-stateful-processing surface (applyInPandasWithState): per-user
session state survives across micro-batches; a session CLOSES when the gap
to the next event exceeds gap_seconds and is emitted exactly once; the
still-open tail session lives in the state store (and would be flushed by a
processing-time timeout in a continuous deployment).

Batch-equivalence contract (tested): over a drained (availableNow) stream,
the emitted closed sessions equal the batch operators/sessionize.sessionize
output minus each user's final (still-open) session.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "user_id bigint, session_id bigint, n_events bigint, start_ep bigint, duration_s bigint"
STATE_DDL = "n bigint, start_ep bigint, last_ep bigint, next_session_id bigint"

GAP_SECONDS = 1800


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    eps: list = []
    for pdf in batches:
        eps.extend(int(v) for v in pdf["ep"])
    eps.sort()

    if state.exists:
        n, start_ep, last_ep, next_sid = state.get
    else:
        n, start_ep, last_ep, next_sid = 0, None, None, 1

    closed = []
    for ep in eps:
        if last_ep is None:
            n, start_ep, last_ep = 1, ep, ep
        elif ep - last_ep > GAP_SECONDS:
            closed.append((user_id, next_sid, n, start_ep, last_ep - start_ep))
            next_sid += 1
            n, start_ep, last_ep = 1, ep, ep
        else:
            n += 1
            last_ep = ep

    state.update((n, start_ep, last_ep, next_sid))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_id", "n_events", "start_ep", "duration_s"]
        )


def stateful_sessionize_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """events parquet stream → closed sessions via per-user GroupState."""
    from pyspark.sql import functions as F

    from .stream import EVENTS_DDL

    stream = spark.readStream.schema(EVENTS_DDL).parquet(input_dir)
    e = stream.select(
        "user_id", F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ep")
    )
    sessions = e.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()
