"""Custom stateful streaming operators via applyInPandasWithState.

Structured Streaming's built-in aggregations cover windowed counts; this
module holds the arbitrary-state path for semantics they can't express —
here, a per-host running profile (total lines, max severity seen, first/
last arrival) maintained across microbatches with explicit state.

State is partitioned by the grouping key, so it scales horizontally; a
processing-time timeout expires idle hosts to bound state size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

HOST_PROFILE_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("total_lines", LongType()),
        StructField("max_severity", IntegerType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("total_lines", LongType()),
        StructField("max_severity", IntegerType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
    ]
)


def _make_update_fn(idle_timeout_ms: int | None):
    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        total, max_sev, first_seen, last_seen = (
            state.get if state.exists else (0, None, None, None)
        )
        for pdf in batches:
            total += len(pdf)
            sev = pdf["severity"].dropna()
            if len(sev):
                batch_max = int(sev.max())
                max_sev = batch_max if max_sev is None else max(int(max_sev), batch_max)
            ts = pdf["received_ts"].dropna()
            if len(ts):
                first_seen = ts.min() if first_seen is None else min(first_seen, ts.min())
                last_seen = ts.max() if last_seen is None else max(last_seen, ts.max())
        state.update((int(total), max_sev, first_seen, last_seen))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [(key[0], total, max_sev, first_seen, last_seen)],
            columns=["host", "total_lines", "max_severity", "first_seen", "last_seen"],
        )

    return update


def host_profiles(parsed: DataFrame, *, idle_timeout_ms: int | None = None) -> DataFrame:
    """Running per-host profile over a parsed syslog stream (update mode).

    ``idle_timeout_ms`` expires state for silent hosts (bounds state size
    in production). Leave None for drain-style tests: with a processing-
    time timeout every expiry schedules another microbatch, so
    ``processAllAvailable()`` never settles.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        parsed.filter(parsed["host"].isNotNull())
        .groupBy("host")
        .applyInPandasWithState(
            _make_update_fn(idle_timeout_ms),
            outputStructType=HOST_PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
