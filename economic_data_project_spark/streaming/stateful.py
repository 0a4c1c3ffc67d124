"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed/session aggregations (streaming/sessions.py) cover
the reference's freshness SLOs; this module is the escape hatch for
state machines Spark's operators can't express — arbitrary per-key
running state with explicit timeout-driven finalization, the streaming
analog of the reference's incremental latest-aggregates models
(``agents_preprocess/agent_fred_series_latest_aggregates.sql``: per-key
running current value / extremes / counts maintained across loads).

``running_user_totals`` keeps one state row per user — event count,
running value total, max value, last event type — and on every
micro-batch emits the updated snapshot (output mode ``update``). An
idle-timeout finalizes and evicts state for users not seen within the
configured processing-time window, bounding state size.

Scale: state is keyed by user and lives in the state store partitioned
by the grouping key — the same shuffle layout as a batch groupBy. The
per-batch Python work is Arrow-batched pandas (one call per key group
per batch), not per-row.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
        StructField("last_event_type", StringType()),
        StructField("finalized", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
        StructField("last_type", StringType()),
    ]
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total, mx, last_type = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, n, total, mx, last_type, "timeout"]],
            columns=[f.name for f in OUTPUT_SCHEMA.fields],
        )
        return
    n, total, mx, last_type = (
        state.get if state.exists else (0, 0.0, float("-inf"), None)
    )
    for pdf in pdfs:
        ordered = pdf.sort_values(["ts", "event_id"])
        n += len(ordered)
        total += float(ordered["value"].sum())
        mx = max(mx, float(ordered["value"].max()))
        last_type = str(ordered["event_type"].iloc[-1])
    state.update((n, total, mx, last_type))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame(
        [[user_id, n, total, mx, last_type, "open"]],
        columns=[f.name for f in OUTPUT_SCHEMA.fields],
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals with timeout finalization (the custom
    stateful operator SURVEY.md §2.11 reserves for
    applyInPandasWithState)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
