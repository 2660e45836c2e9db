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
            # a chunk whose ts_us values are all null gives NaN from
            # pandas min/max — int(NaN) would crash the whole query;
            # match batch min/max semantics (nulls ignored)
            ts = pdf["ts_us"].dropna()
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
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_update(state_ttl_minutes),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
