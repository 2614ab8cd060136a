"""Custom stateful streaming operator: hot-cell escalation events.

Windowed aggregation (``ingest.stream_cell_counts``) can't express
"emit an event the moment a cell's CUMULATIVE page count crosses a
threshold" — that needs per-key state that lives across microbatches and
custom emission logic. This is the engine's ``applyInPandasWithState``
operator: one state row per cell (the running count), Arrow-batched user
logic, append-mode events.

Why this operator: the skew story (``operators/skew.py``) splits hot cells
at resolution+1 once their mass exceeds a threshold. In continuous ingest
the split decision must fire *while* the backlog streams in — the event
stream produced here is exactly the trigger feed for adaptive quadtree
splitting, each event saying "cell X has now absorbed ≥ 2^k pages".

Semantics are batching-invariant where it matters: the SET of
(cell, threshold) events equals {(c, 2^k) : 2^k ≤ final count(c)}
regardless of how files are carved into microbatches (asserted in
tests/test_streaming_stateful.py); only ``n_at_emit`` depends on batch
boundaries (it records the cumulative count when the threshold was
noticed, ≥ the threshold itself).

State size: one int64 per live cell — at 10^12 pages and res-6 cells the
state store holds ≤4k groups per partition; the RocksDB state backend on a
real cluster keeps this off-heap.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geografir_spark.geo import cells, geocode

EVENT_SCHEMA = "cell bigint, threshold bigint, n_at_emit bigint"
_STATE_SCHEMA = "n bigint"


def _thresholds_crossed(n_prev: int, n_now: int) -> "list[int]":
    """Powers of two t with n_prev < t <= n_now."""
    out = []
    t = 1
    while t <= n_now:
        if t > n_prev:
            out.append(t)
        t <<= 1
    return out


def _emit_events(
    key: Tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (cell,) = key
    n_prev = state.get[0] if state.exists else 0
    n_new = sum(len(p) for p in pdfs)
    n_now = n_prev + n_new
    state.update((n_now,))
    crossed = _thresholds_crossed(n_prev, n_now)
    if crossed:
        yield pd.DataFrame(
            {
                "cell": [cell] * len(crossed),
                "threshold": crossed,
                "n_at_emit": [n_now] * len(crossed),
            }
        )


def stream_hot_cell_events(pages: DataFrame, *, res: int) -> DataFrame:
    """Streaming (cell, threshold, n_at_emit) escalation events from a
    streaming pages relation: geocode → cell → per-cell stateful count
    with power-of-two crossing detection."""
    p = geocode.with_geocode(pages, "text", "page_id")
    p = cells.with_cell(p, "lon", "lat", res)
    return (
        p.select("cell", "page_id")
        .groupBy("cell")
        .applyInPandasWithState(
            _emit_events,
            outputStructType=EVENT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
