"""Custom stateful streaming operator (SURVEY §2.10:
``applyInPandasWithState`` for custom stateful operators).

``streaming_seen_filter`` — stateful exactly-once-per-key emission: the
first event per user_id passes, later ones are dropped, with per-key state
carried across micro-batches and a processing-time timeout evicting idle
keys (bounded state at stream scale — the streaming form of
dropDuplicates on a key, but with an explicit eviction policy the
built-in lacks).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["streaming_seen_filter", "SEEN_OUTPUT_SCHEMA"]

SEEN_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("first_ts", TimestampType(), True),
        StructField("n_suppressed", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("seen", LongType(), True),
        StructField("suppressed", LongType(), True),
    ]
)


def _dedup_fn(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    seen, suppressed = state.get if state.exists else (0, 0)
    first_ts = None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        batch_min = pdf["ts"].min()
        if seen == 0:
            first_ts = batch_min
            suppressed += len(pdf) - 1
            seen = 1
        else:
            suppressed += len(pdf)
    state.update((seen, suppressed))
    state.setTimeoutDuration(3600 * 1000)  # evict idle keys after 1h
    if first_ts is not None:
        yield pd.DataFrame(
            [{"user_id": key[0], "first_ts": first_ts, "n_suppressed": suppressed}]
        )


def streaming_seen_filter(events: DataFrame) -> DataFrame:
    """events stream → one row per user on FIRST sighting, with a running
    suppression count in per-key state. Use on a streaming DataFrame with
    update output mode."""
    from warcraider_spark.dist import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=SEEN_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
