"""Streaming event-type transitions (north-star extension — the reference
has no streaming surface, SURVEY.md §2.8).

The batch plan (operators/temporal.transition_matrix) needs ``lag`` over a
per-user total order, which Structured Streaming cannot express as a
windowed aggregation.  The streaming shape is the custom stateful
operator: ``applyInPandasWithState`` keyed by user_id emits the (from, to)
pair for every consecutive event pair inside the micro-batch and carries
the LAST event of each user in ``GroupState`` so the first event of the
next batch pairs with it — O(1) state per key (one timestamp + one type),
the same user_id hash shuffle the batch plan pays.

Counting the emitted pair stream is a plain (streaming or batch)
aggregation downstream; with ``Trigger.AvailableNow`` over a static file
the result equals the batch transition matrix exactly (asserted in tests
both single-batch and incrementally across file splits, provided the
splits respect event-time order per user — same contract as the
incremental sessionizer test).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

PAIR_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("from_type", StringType(), False),
        StructField("to_type", StringType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def transition_pairs_stateful(events: DataFrame) -> DataFrame:
    """Emit one (user_id, from_type, to_type) row per consecutive event
    pair in per-user (ts, event_id) order, carrying the last event across
    micro-batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        types = list(pdf["event_type"])
        prev = None
        if state.exists:
            (_, _, last_type) = state.get
            prev = last_type
        rows = []
        for t in types:
            if prev is not None:
                rows.append({"user_id": user_id, "from_type": prev, "to_type": t})
            prev = t
        if len(pdf):
            last = pdf.iloc[-1]
            state.update(
                (int(last["ts"].value // 1000), int(last["event_id"]), str(last["event_type"]))
            )
        yield pd.DataFrame(rows, columns=[f.name for f in PAIR_SCHEMA.fields])

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
