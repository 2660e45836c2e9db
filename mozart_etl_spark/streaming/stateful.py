"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for streaming semantics Spark's built-in operators
can't express: arbitrary per-key state evolved batch-by-batch in
Arrow-vectorized Python. The example operator — per-user running
totals with first/last event times — is deliberately simple so the
*harness* (state schema, timeout handling, Arrow batch shape,
availableNow drain) is the tested artifact; swap the update body for
real logic (fraud scoring, CDC reconciliation, session enrichment).

State bounding: pass ``state_ttl_minutes`` to evict keys idle past
that processing time (emitted with ``final=true``) — at 100 TB of
keys this is what keeps the state store finite on a continuous
trigger. The default is no timeout, which is also what a bounded
``availableNow`` drain needs: with a processing-time timeout pending,
availableNow keeps scheduling empty micro-batches until every timeout
fires, so the drain never terminates (observed: 376 epochs and no
progress on a 30-min TTL).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("final", BooleanType()),
    ]
)

_STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE, first_ts_us BIGINT, last_ts_us BIGINT"


def _make_update(state_ttl_minutes: int | None):
    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                [[user_id, n, total, first_us, last_us, True]],
                columns=RUNNING_TOTALS_SCHEMA.fieldNames(),
            )
            return
        n, total, first_us, last_us = state.get if state.exists else (0, 0.0, None, None)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
            # the timestamp reaches this kernel as the non-null
            # `_ts_us_filled` int64 + `_ts_valid` mask pair, NEVER as
            # a nullable ts_us column: Arrow->pandas converts int64
            # with nulls to FLOAT64, whose 53-bit mantissa silently
            # corrupts epoch-us beyond ~2255 (measured on the r11
            # extreme-timestamp axis: 9191836036854775 us ->
            # ...776.0 -> +1 us in the emitted state). The split
            # keeps the dtype int64 end-to-end; null semantics
            # (min/max skip nulls) ride the mask.
            ts = pdf["_ts_us_filled"][pdf["_ts_valid"]]
            if len(ts):
                lo, hi = int(ts.min()), int(ts.max())
                first_us = lo if first_us is None else min(first_us, lo)
                last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, total, first_us, last_us))
        if state_ttl_minutes is not None:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            [[user_id, n, total, first_us, last_us, False]],
            columns=RUNNING_TOTALS_SCHEMA.fieldNames(),
        )

    return update


def running_user_totals(stream: DataFrame, state_ttl_minutes: int | None = None) -> DataFrame:
    """Per-user running totals as a custom stateful operator.

    Emits one row per user per micro-batch with the cumulative state
    (``final=false``); with ``state_ttl_minutes`` set (continuous
    triggers only — see module docstring), idle keys are evicted and
    emitted with ``final=true``. Input must carry ``user_id, value,
    ts_us``.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_minutes is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    # null-split BEFORE Arrow: see the kernel comment — a nullable
    # int64 ts_us would cross the Arrow->pandas boundary as float64
    # and corrupt epoch-us beyond 2^53 (~year 2255)
    stream = stream.withColumn("_ts_valid", F.col("ts_us").isNotNull()).withColumn(
        "_ts_us_filled", F.coalesce(F.col("ts_us"), F.lit(0).cast("bigint"))
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_update(state_ttl_minutes),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
