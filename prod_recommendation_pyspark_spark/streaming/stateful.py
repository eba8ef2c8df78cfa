"""Custom stateful streaming operator via ``applyInPandasWithState``
(the north-star 'custom stateful operators' surface; absent from the
reference — SURVEY.md §2.12).

``stateful_user_totals`` keeps one running (count, total_value)
accumulator per user across micro-batches and emits the updated totals
each batch — the minimal template for any custom per-key state machine
(sessionization with custom predicates, fraud counters, rate limits).

Scale notes: state lives in the state store, bounded by #distinct keys
× state row width; pair with a timeout (``GroupStateTimeout``) or TTL
clean-up for unbounded key spaces.  The pandas kernel sees each key's
micro-batch rows as Arrow batches — no per-row Python overhead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, total_value = state.get
    else:
        n_events, total_value = 0, 0.0
    for pdf in pdfs:
        n_events += len(pdf)
        total_value += float(pdf["value"].fillna(0.0).sum())
    state.update((n_events, total_value))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_value": [total_value],
        }
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user (event count, value total) across the stream.
    Input: streaming DataFrame with (user_id long, value double).
    Output mode must be ``update``."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma", DoubleType()),
    ]
)
EWMA_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def _update_user_ewma(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, ewma = state.get
    else:
        n, ewma = 0, None
    rows = pd.concat(list(pdfs), ignore_index=True)
    # deterministic intra-batch order: the same (ts, event_id) total
    # order the batch fold uses
    rows = rows.sort_values(["ts", "event_id"])
    for v in rows["value"].astype(float):
        ewma = v if ewma is None else 0.5 * v + 0.5 * ewma
        n += 1
    state.update((n, float(ewma) if ewma is not None else 0.0))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "ewma": [ewma]}
    )


def stateful_ewma(events: DataFrame) -> DataFrame:
    """Incremental per-user EWMA (α = 0.5 — the exact-binary-half
    recursion of the batch `ewma_user_value_events`) as a custom
    stateful streaming operator: state carries (n, ewma); each
    micro-batch folds its rows in (ts, event_id) order on top of the
    carried state, which is EXACTLY the batch fold split at batch
    boundaries — so on in-order delivery the final emission is
    bit-identical to the batch query (pinned by the parity pytest).
    EWMA is order-sensitive by definition: out-of-order arrival
    across micro-batches changes the fold, so feed it an ordered
    source (file streams replay in order) or accept
    ingestion-order semantics, as any incremental smoother must.

    Input: streaming (user_id long, ts timestamp, event_id long,
    value double).  Output mode ``update``."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
