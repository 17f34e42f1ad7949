"""User sessionization over the events stream (north-star extension — the
reference has no streaming surface, SURVEY.md §2.8).

Batch shape: two windows over one user_id shuffle (lag → session-break
flag → running sum → session id) then a per-session aggregate — the
classic gaps-and-islands plan, fully JVM-side.

Streaming shape: ``applyInPandasWithState`` keyed by user_id — the custom
stateful operator surface.  Sessions that are closed by a later event in
the same micro-batch are emitted immediately; the still-open tail session
is carried in ``GroupState`` and flushed on event-time timeout.  With
``Trigger.AvailableNow`` over a static file the whole history arrives in
one batch, so the test path emits open tails too (flush_open=True) and
must equal the batch plan exactly.

Scale notes: state per key is O(1) (only the open session's bounds), the
shuffle is the same user_id hash partitioning the batch plan needs, and
skewed users cost memory only in their open-session row count (bounded by
the gap).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mistocksync_spark.functions.numeric import dec_sum
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

GAP_MINUTES = 30

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_idx", LongType(), False),
        StructField("session_start", StringType(), True),
        StructField("session_end", StringType(), True),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_idx", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        # sum carried as exact integer micro-units (value quantized to
        # 6 dp, HALF_UP — the same per-value quantization Spark's
        # cast(double -> decimal(18,6)) applies in the batch plan), so
        # the stream total is order-independent and bit-equal to the
        # batch dec_sum regardless of micro-batch boundaries.
        StructField("sum_micros", LongType()),
    ]
)

def _micros(val: float) -> int:
    """Per-value micro-unit quantization, bit-matching the batch plan's
    ``dec_sum`` (functions/numeric.py): floor(x * 1e6 + 0.5) — Python
    floats are the same IEEE doubles Spark and DuckDB compute with, so
    all three paths quantize identically."""
    return int(math.floor(float(val) * 1_000_000.0 + 0.5))


def _sum_value_of(micros: int) -> float:
    """Finalize a micro-unit total the way ``dec_sum(col, 4)`` does:
    the identical IEEE op sequence (cast, divide, +0.5, floor, divide)."""
    return math.floor(float(micros) / 100.0 + 0.5) / 10000.0


def sessionize_batch(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    to the previous event of the same user exceeds ``gap_minutes``."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    brk = (prev.isNull() | ((us - prev) > gap_us)).cast("long")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    with_sid = events.withColumn("session_idx", F.sum(brk).over(wrun))
    return (
        with_sid.groupBy("user_id", "session_idx")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count("*").alias("n_events"),
            # decimal-exact order-independent sum (functions/numeric.py)
            dec_sum("value", 4).alias("sum_value"),
        )
    )


def _sessions_of(pdf: pd.DataFrame, gap_us: int) -> list[dict]:
    pdf = pdf.sort_values(["ts", "event_id"])
    out: list[dict] = []
    cur = None
    for ts, val in zip(pdf["ts"], pdf["value"]):
        us = int(ts.value // 1000)  # pandas ns → µs
        if cur is None or us - cur["end_us"] > gap_us:
            cur = {"start_us": us, "end_us": us, "n": 1, "sum_u": _micros(val)}
            out.append(cur)
        else:
            cur["end_us"] = us
            cur["n"] += 1
            cur["sum_u"] += _micros(val)
    return out


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = GAP_MINUTES,
    flush_open: bool = True,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``.

    ``flush_open=True`` (the AvailableNow/static-input mode used in tests)
    emits the trailing open session of each key too, making the output
    equal to ``sessionize_batch``; in a live stream it stays in state until
    the event-time timeout fires.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(pdf_iter))
        sessions = _sessions_of(pdf, gap_us)
        # merge with carried open session from a previous batch
        if state.exists:
            (sidx0, start_us, end_us, n0, sum_u0) = state.get
            if sessions and sessions[0]["start_us"] - end_us <= gap_us:
                s = sessions[0]
                s["start_us"], s["n"], s["sum_u"] = start_us, s["n"] + n0, s["sum_u"] + sum_u0
                base_idx = sidx0
            else:
                sessions.insert(0, {"start_us": start_us, "end_us": end_us, "n": n0, "sum_u": sum_u0})
                base_idx = sidx0
        else:
            base_idx = 1
        closed = sessions if flush_open else sessions[:-1]
        if not flush_open and sessions:
            tail = sessions[-1]
            state.update((base_idx + len(sessions) - 1, tail["start_us"], tail["end_us"], tail["n"], tail["sum_u"]))
        rows = [
            {
                "user_id": user_id,
                "session_idx": base_idx + i,
                "session_start": pd.Timestamp(s["start_us"], unit="us").strftime("%Y-%m-%d %H:%M:%S"),
                "session_end": pd.Timestamp(s["end_us"], unit="us").strftime("%Y-%m-%d %H:%M:%S"),
                "n_events": s["n"],
                # finalized from exact micro-units: bit-equal to the
                # batch plan's dec_sum("value", 4) by construction
                "sum_value": _sum_value_of(s["sum_u"]),
            }
            for i, s in enumerate(closed)
        ]
        yield pd.DataFrame(rows, columns=[f.name for f in SESSION_SCHEMA.fields])

    out = events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out
