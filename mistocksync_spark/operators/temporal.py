"""Temporal join operators (north-star extension; the reference has no
time-series joins — SURVEY.md §2.3 notes "no range/as-of/interval joins").

- asof_join: for each left event, the most recent right event at-or-before
  it with the same key — the standard "enrich ticks with the prevailing
  quote" operator of time-series engines, here "enrich clicks with the
  last purchase".

The implementation is the union-merge plan, not a correlated lookup: tag
both inputs, union, and run ``last(value, ignorenulls=True)`` over one
window partitioned by the key.  That costs exactly ONE shuffle (hash by
key) + one sort within partitions — at 100 TB there is no join blow-up,
no per-row probe, and AQE can split skewed keys.  A broadcast-probe
per-row lookup would be O(left × right-per-key); a range join would need
binning.  The union-merge is the plan a time-series engine's as-of join
compiles to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mistocksync_spark.functions.numeric import dec_avg


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bin_seconds: int = 3600,
    key: str | None = None,
) -> DataFrame:
    """Point-in-interval join without a nested-loop: the binned range join.

    A plain ``p.join(i, p.ts >= i.start AND p.ts < i.end)`` has no equi
    condition, so Spark picks BroadcastNestedLoopJoin — O(points ×
    intervals).  Instead each interval explodes into the time bins it
    covers and each point maps to its single bin; the join becomes an
    EQUI-join on (bin[, key]) and the exact range predicate filters the
    few bin-collision candidates.  Bin width should be on the order of
    the typical interval length (each interval explodes into ~len/bin + 1
    rows).  Inner join; points in no interval drop out.
    """
    # microsecond epochs: second-truncated bins would mis-bin sub-second
    # timestamps right at a bin boundary (ts < end but trunc(ts) == trunc(end))
    bin_us = F.lit(bin_seconds * 1_000_000)
    p_bin = F.floor(F.unix_micros(F.col(ts)) / bin_us)
    # guard empty/inverted intervals (end <= start): sequence() would count
    # DOWN, materializing a huge spurious bin array per bad row before the
    # range predicate could drop it — emit zero bins instead (inner-join
    # semantics: such an interval matches no point)
    i_bins = F.when(
        F.col(end_col) > F.col(start_col),
        F.sequence(
            F.floor(F.unix_micros(F.col(start_col)) / bin_us),
            F.floor((F.unix_micros(F.col(end_col)) - 1) / bin_us),
        ),
    ).otherwise(F.array().cast("array<long>"))
    keys = ["__bin"] + ([key] if key else [])
    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn("__bin", F.explode(i_bins))
    joined = p.join(i, on=keys).filter(
        (F.col(ts) >= F.col(start_col)) & (F.col(ts) < F.col(end_col))
    )
    return joined.drop("__bin")


def rolling_window_agg(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    window_seconds: int = 3600,
) -> DataFrame:
    """Per-key trailing time-window aggregates: for every event, the count
    and value-sum of that key's events in the preceding ``window_seconds``
    (inclusive of the current event) — the "requests in the last hour per
    user" rate operator.

    Plan: ONE shuffle (hash by key) + one sort within partitions, then a
    RANGE frame over truncated epoch seconds — Spark evaluates the sliding
    frame with two moving pointers per partition, so cost is O(rows), not
    O(rows × window).  No self-join, no interval explosion.  Ties at one
    second share a frame, so results are order-independent (hash-stable).

    At 100 TB the partitioning key is the entity id (high cardinality →
    even spread); a skewed power-user key is handled by AQE or by
    pre-aggregating to per-second partials before the frame.
    """
    sec = F.col(ts).cast("long")  # truncates to epoch seconds
    w = (
        Window.partitionBy(key)
        .orderBy(sec)
        .rangeBetween(-(window_seconds - 1), Window.currentRow)
    )
    return events.select(
        "*",
        F.count("*").over(w).alias("cnt_win"),
        # decimal accumulation inside the frame: exact and independent of
        # tie order within a same-second RANGE bucket (raw double frame
        # sums accumulate in engine-specific order — the half-case
        # divergence class; see functions/numeric.py)
        F.round(F.sum(F.col(value).cast("decimal(18,6)")).over(w), 4)
        .cast("double")
        .alias("sum_win"),
    )


def ohlc_rollup(
    events: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """Time-bucketed first/last/min/max/mean rollup per key — the OHLC
    candle / hypertable continuous-aggregate shape every time-series engine
    ships.  ``first``/``last`` are by event TIME (``min_by``/``max_by`` on
    the timestamp), not arrival order, so the result is deterministic under
    any partitioning; ties on ts break by value so the pick is total.

    Plan: ONE partial-aggregated shuffle keyed by (bucket, key) — each map
    task reduces its slice to one row per group before the exchange, which
    is what makes the rollup a streaming-compatible continuous aggregate
    (the same plan runs under a watermark; see streaming/events.py).
    """
    tsv = F.struct(F.col(ts).alias("t"), F.col(value).alias("v"))
    return (
        events.groupBy(F.window(ts, bucket).alias("w"), F.col(key).alias("key"))
        .agg(
            F.min_by(value, tsv).alias("open"),
            F.max_by(value, tsv).alias("close"),
            F.round(F.min(value), 4).alias("low"),
            F.round(F.max(value), 4).alias("high"),
            F.sum(F.col(value).cast("decimal(18,6)")).alias("__sum"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "key",
            F.round(F.col("open"), 4).alias("open"),
            F.round(F.col("close"), 4).alias("close"),
            "low",
            "high",
            # mean from a DECIMAL sum, deliberately UNROUNDED: decimal
            # addition is exact and order-independent, so both engines
            # divide bit-identical operands and the quotient is
            # bit-identical too.  Rounding it would REINTRODUCE divergence:
            # Spark rounds the shortest decimal repr of a double, DuckDB the
            # exact binary value — they disagree whenever the repr ends in a
            # half (4 of 3600 cells at sf0.1).
            (F.col("__sum").cast("double") / F.col("n_events")).alias("mean_value"),
            "n_events",
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Strict-order funnel analysis: per entity, the first time of step 1,
    then the first step-2 event STRICTLY AFTER it, then the first step-3
    event strictly after that, and so on — the product-analytics
    "view → click → purchase" progression with per-step reach and
    conversion-from-first.  ``max_gap_seconds`` bounds each hop (the usual
    "converted within an hour" form — without it, long-lived entities
    eventually do everything and every step saturates).

    Plan: chained unordered window minimums, all over the same
    ``partitionBy(key)`` spec, so Catalyst reuses ONE hash exchange for the
    whole chain (the ``user_sessions`` single-shuffle trick) — no
    self-joins, no per-step scans.  The per-entity frame then collapses to
    one row of step counts and unpivots to step rows driver-free.
    """
    w = Window.partitionBy(key)
    cur = events.select(key, ts, type_col)
    prev_col = None
    tcols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev_col is not None:
            cond = cond & (F.col(ts) > F.col(prev_col))
            if max_gap_seconds is not None:
                # µs integer arithmetic: identical in any engine, no
                # interval-addition semantics to match
                cond = cond & (
                    F.unix_micros(F.col(ts)) - F.unix_micros(F.col(prev_col))
                    <= max_gap_seconds * 1_000_000
                )
        tcol = f"__t{i + 1}"
        cur = cur.withColumn(tcol, F.min(F.when(cond, F.col(ts))).over(w))
        prev_col = tcol
        tcols.append(tcol)

    per_entity = cur.select(key, *tcols).distinct()
    counts = per_entity.agg(
        *[F.count(F.col(t)).alias(f"n{i + 1}") for i, t in enumerate(tcols)]
    )
    # unpivot the 1-row counts via explode, NOT a union of per-step selects —
    # a union would reference (and re-plan) the whole upstream chain once per
    # step
    step_structs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_index"),
                F.lit(step).alias("step"),
                F.col(f"n{i + 1}").alias("n_users"),
                F.when(F.col("n1") > 0, F.col(f"n{i + 1}") / F.col("n1"))
                .otherwise(F.lit(0.0))
                .alias("conversion"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return counts.select(F.explode(step_structs).alias("r")).select("r.*")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    right_value: str = "value",
    value_alias: str = "asof_value",
    ts_alias: str = "asof_ts",
) -> DataFrame:
    """Left as-of join: attach the latest right row with ``right.ts <=
    left.ts`` per key (ties at equal ts: the right row wins — `<=`
    semantics; multiple right rows at one (key, ts) must be pre-aggregated
    by the caller for determinism).

    Returns all left columns + (ts_alias, value_alias), null when no right
    row precedes.  ``right_value`` is carried in its NATIVE type (string,
    decimal, struct, …) — no numeric coercion.
    """
    r_value_type = right.schema[right_value].dataType
    l_tag = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_value_type).alias("__r_value"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        F.col(right_value).alias("__r_value"),
    )
    # Right rows sort before left rows at equal ts so `last` implements <=.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).select(
        "*",
        F.last(F.when(F.col("__is_left") == 0, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias(ts_alias),
        F.last("__r_value", ignorenulls=True).over(w).alias(value_alias),
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    return merged.filter(F.col("__is_left") == 1).select(*out_cols, ts_alias, value_alias)


def transition_matrix(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-entity event-type transition counts and row-normalized
    probabilities — the empirical Markov chain over user journeys
    ("after a view, how often does a click follow?").

    Plan: ONE hash exchange on the entity key feeds a ``lag`` window
    (total order by (ts, id) so ties are deterministic), then the
    (from, to) pair frame collapses via map-side-partial counting; the
    row-normalizing sum runs as a window over the tiny #types² count
    frame, not over raw events.  At 100 TB the only full-data shuffle is
    the per-entity ordering — the same exchange sessionization uses.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(id_col).asc())
    pairs = (
        events.select(key, ts, id_col, type_col)
        .withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .select(F.col("__prev").alias("from_type"), F.col(type_col).alias("to_type"))
    )
    return transition_counts(pairs)


def transition_counts(pairs: DataFrame) -> DataFrame:
    """Collapse a (from_type, to_type) pair stream into counts and
    row-normalized probabilities — shared by the batch lag-window plan and
    the stateful-streaming pair emitter."""
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("cnt"))
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(w_from), 6).alias("prob"),
    )


def retention_cohorts(
    events: DataFrame, key: str = "user_id", ts: str = "ts"
) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by first-seen day,
    activity counted per (cohort day, day offset), retention as the share
    of the cohort's day-0 size still active at each offset.

    Plan: the cohort day is an unordered window ``min`` over ONE hash
    exchange on the entity key; the per-(user, offset) frame dedups and
    counts with map-side partials; the day-0 size attaches via a window
    over the tiny cohort×offset grid — no self-join back to raw events.
    """
    w = Window.partitionBy(key)
    act = events.select(F.col(key), F.to_date(F.col(ts)).alias("__day"))
    act = act.withColumn("__cohort", F.min("__day").over(w))
    per = act.select(
        F.col(key),
        F.col("__cohort"),
        F.datediff(F.col("__day"), F.col("__cohort")).alias("day_offset"),
    ).distinct()
    grid = per.groupBy("__cohort", "day_offset").agg(
        F.countDistinct(key).alias("n_users")
    )
    w_c = Window.partitionBy("__cohort")
    cohort_size = F.max(F.when(F.col("day_offset") == 0, F.col("n_users"))).over(w_c)
    return grid.select(
        F.date_format("__cohort", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "n_users",
        cohort_size.alias("cohort_size"),
        F.round(F.col("n_users") / cohort_size, 6).alias("retention"),
    )


def _hourly_avg(
    events: DataFrame, key_col: str, ts: str, value: str
) -> DataFrame:
    """Per-(key, hour) bucket mean with the OHLC determinism trick: a
    DECIMAL(18,6) sum is exact and order-independent, so both engines
    divide bit-identical operands and the UNROUNDED double quotient is
    bit-identical too.  ``round(avg, 4)`` here was wrong twice over: avg
    accumulates in engine-specific order, and rounding the result splits
    on half-case decimal representations (3 of 3600 cells flipped at
    sf0.1 — caught by the full-registry sf0.1 sweep, invisible at
    sf0.01)."""
    bucket = F.date_trunc("hour", F.col(ts))
    return events.groupBy(
        F.col(key_col).alias("key"), bucket.alias("__bucket")
    ).agg(
        (
            F.sum(F.col(value).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value")
    )


def _hourly_filled_grid(
    events: DataFrame, key_col: str, ts: str, value: str
) -> DataFrame:
    """Shared gap-fill scaffold: per-(key, hour) rounded averages joined
    onto the dense hour grid between each key's first and last bucket.
    The grid derives from the ALREADY-AGGREGATED frame, so the sequence
    explode never touches raw events."""
    agg_df = _hourly_avg(events, key_col, ts, value)
    spans = agg_df.groupBy("key").agg(
        F.min("__bucket").alias("__b0"), F.max("__bucket").alias("__b1")
    )
    grid = spans.select(
        "key",
        F.explode(
            F.sequence(F.col("__b0"), F.col("__b1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("__bucket"),
    )
    return grid.join(agg_df, on=["key", "__bucket"], how="left")


def gapfill_locf(
    events: DataFrame,
    key_col: str = "event_type",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Hypertable-style gap-filled hourly series with last-observation-
    carried-forward — ``time_bucket_gapfill + locf`` parity: every hour
    between a key's first and last observation gets a row; hours with no
    events carry the previous bucket's average and are flagged.

    Plan: one partial-agg shuffle builds the per-(key, hour) averages; the
    dense hour grid derives from a per-key min/max + ``sequence`` explode
    over the ALREADY-AGGREGATED frame (tiny — keys × hours, never raw
    events); the LOCF is a running ``last(ignorenulls)`` window per key.
    The bucket average is ``_hourly_avg``'s UNROUNDED decimal-sum mean —
    exact order-independent operands make the carried double bit-identical
    across engines, where a rounded double mean would split on half-cases.
    """
    filled = _hourly_filled_grid(events, key_col, ts, value)
    w = (
        Window.partitionBy("key")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "key",
        F.date_format("__bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("value_locf"),
        F.col("avg_value").isNull().cast("int").alias("is_gap"),
    )


def seasonal_naive_forecast(
    events: DataFrame,
    key_col: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    season_hours: int = 24,
) -> DataFrame:
    """Seasonal-naive forecast — the baseline every fancier model must
    beat: the next ``season_hours`` hourly buckets per key predict as the
    value one season earlier.  Forecast windows anchor at each key's LAST
    observed bucket, so the operator is pure history → horizon.

    Plan: ONE partial-agg shuffle builds the hourly series (same shape as
    ``gapfill_locf``); the per-key anchor is an unordered window max over
    the aggregated frame; the horizon rows are a filter + timestamp shift
    — no joins, no sequence explosion.  Bucket averages round before
    shifting so predictions are bit-identical across engines.
    """
    agg_df = _hourly_avg(events, key_col, ts, value)
    w = Window.partitionBy("key")
    anchored = agg_df.withColumn("__last", F.max("__bucket").over(w))
    horizon = anchored.filter(
        F.col("__bucket")
        > F.col("__last") - F.expr(f"INTERVAL {season_hours} HOURS")
    )
    return horizon.select(
        "key",
        F.date_format(
            F.col("__bucket") + F.expr(f"INTERVAL {season_hours} HOURS"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("bucket"),
        F.col("avg_value").alias("pred_value"),
        F.date_format("__bucket", "yyyy-MM-dd HH:mm:ss").alias("basis_bucket"),
    )


def seasonal_naive_backtest(
    events: DataFrame,
    key_col: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    season_hours: int = 24,
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster on the LAST observed
    season: predict each key's final ``season_hours`` hourly buckets from
    one season earlier and score MAE + sMAPE against the actuals — the
    evaluation half of the forecasting story (a forecast operator without
    a scored backtest is a demo, not a tool).

    Plan: the hourly series aggregates once (shared lineage with the
    forecast); actuals and season-shifted predictions are two projections
    of that SAME aggregated frame joined on (key, bucket) — small frames,
    broadcast-eligible; per-key scores collapse via one tiny groupBy.
    Buckets with no basis a season earlier drop out (inner join).
    """
    agg_df = _hourly_avg(events, key_col, ts, value).select(
        "key", F.col("__bucket").alias("__b"), F.col("avg_value").alias("__v")
    )
    w = Window.partitionBy("key")
    anchored = agg_df.withColumn("__last", F.max("__b").over(w))
    actual = anchored.filter(
        F.col("__b") > F.col("__last") - F.expr(f"INTERVAL {season_hours} HOURS")
    ).select("key", "__b", F.col("__v").alias("__actual"))
    pred = agg_df.select(
        "key",
        (F.col("__b") + F.expr(f"INTERVAL {season_hours} HOURS")).alias("__b"),
        F.col("__v").alias("__pred"),
    )
    j = actual.join(pred, on=["key", "__b"])
    err = F.abs(F.col("__pred") - F.col("__actual"))
    denom = (F.abs(F.col("__pred")) + F.abs(F.col("__actual"))) / 2
    smape_term = F.when(denom > 0, err / denom).otherwise(F.lit(0.0))
    return j.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_scored"),
        # decimal-sum means (functions/numeric.py): the error terms are
        # raw doubles, so round(avg) would be partition-order dependent
        dec_avg(err).alias("mae"),
        dec_avg(smape_term).alias("smape"),
    )


def stickiness(
    events: DataFrame, key: str = "user_id", ts: str = "ts", window_days: int = 7
) -> DataFrame:
    """DAU / trailing-WAU engagement ratio per day — the product-metrics
    staple that needs DISTINCT users over a sliding window, which no
    window frame computes at scale.

    Plan: the covering-window trick — dedup to (user, active_day) rows
    (ONE shuffle over raw data), then each active day contributes the
    user to the ``window_days`` window-end days it covers via a
    ``sequence`` explode (×7 rows of (user, day) pairs, NOT raw events),
    and one countDistinct per day yields the rolling distinct count with
    no self-join and no per-day rescans.  Days are restricted to the
    observed [min, max] range so the trailing window never invents days.
    """
    day = F.to_date(F.col(ts))
    active = events.select(F.col(key), day.alias("__day")).distinct()
    bounds = active.agg(
        F.min("__day").alias("__d0"), F.max("__day").alias("__d1")
    )
    covered = (
        active.crossJoin(F.broadcast(bounds))
        .select(
            key,
            F.explode(
                F.sequence(
                    F.col("__day"),
                    F.least(
                        F.date_add(F.col("__day"), window_days - 1), F.col("__d1")
                    ),
                )
            ).alias("__wday"),
        )
    )
    wau = covered.groupBy("__wday").agg(F.countDistinct(key).alias("wau"))
    dau = active.groupBy("__day").agg(F.countDistinct(key).alias("dau"))
    j = dau.join(wau, dau["__day"] == wau["__wday"])
    return j.select(
        F.date_format("__day", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
    )


def gapfill_interp(
    events: DataFrame,
    key_col: str = "event_type",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Gap-filled hourly series with LINEAR INTERPOLATION — the
    ``interpolate`` sibling of ``gapfill_locf``: a missing bucket takes
    the value on the line between its nearest observed neighbours
    (weighted by hour distance); leading/trailing gaps (one-sided) stay
    NULL, which is the standard contract.

    Same scaffold as LOCF (one partial-agg shuffle + grid from the
    aggregated frame); the neighbour lookups are four ignore-nulls
    window functions over ONE per-key ordering — no self-joins.  Bucket
    averages are exact decimal-sum means and hour indices are exact
    integers, so the interpolated doubles are engine-identical.
    """
    filled = _hourly_filled_grid(events, key_col, ts, value)
    idx = F.floor(F.unix_micros(F.col("__bucket")) / F.lit(3_600_000_000))
    filled = filled.withColumn("__idx", idx)
    obs_idx = F.when(F.col("avg_value").isNotNull(), F.col("__idx"))
    w_prev = (
        Window.partitionBy("key")
        .orderBy("__idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("key")
        .orderBy("__idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev_v = F.last("avg_value", ignorenulls=True).over(w_prev)
    prev_i = F.last(obs_idx, ignorenulls=True).over(w_prev)
    next_v = F.first("avg_value", ignorenulls=True).over(w_next)
    next_i = F.first(obs_idx, ignorenulls=True).over(w_next)
    # deliberately UNROUNDED interpolation: the operands (decimal-mean
    # bucket averages + exact integer hour indices) are bit-identical across
    # engines, so the quotient is too — rounding it would REINTRODUCE
    # divergence on half-case decimal representations (the OHLC mean
    # lesson: Spark rounds the shortest decimal repr, DuckDB the exact
    # binary value)
    interp = F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).otherwise(
        prev_v
        + (next_v - prev_v) * (F.col("__idx") - prev_i) / (next_i - prev_i)
    )
    return filled.select(
        "key",
        F.date_format("__bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "avg_value",
        interp.alias("value_interp"),
        F.col("avg_value").isNull().cast("int").alias("is_gap"),
    )


def cusum_drift(
    df: DataFrame,
    key: str = "event_type",
    value: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Retrospective CUSUM drift scan per key (Page 1954, public method):
    how far the metric's running level has wandered from its baseline,
    and when — the monitor that catches a feed's mean shifting mid-stream
    (a source silently changing units or quality level).

    Output per key: (key, n_events, baseline_micro, max_up_micro,
    max_down_micro, ts_at_max_up) — the one-sided CUSUM maxima in
    micro-units and the FIRST timestamp where the upward statistic peaks.

    Plan: the CUSUM recursion S_t = max(0, S_{t-1} + d_t) is re-expressed
    through the prefix identity S_t = C_t − min(0, min_{i≤t} C_i) (C =
    running sum of deviations), so the whole scan is window functions over
    ONE shuffle (partition by key, order by (ts, id) — a total order);
    no iterative state, no UDF.  Determinism: deviations are exact
    micro-int quantities; the baseline is floor(sum/count) computed in
    exact-double arithmetic (|sum_micro| < 2^53 at any realistic per-key
    volume); window sums are exact BIGINT; the argmax timestamp ties to
    the earliest ts.  At 100 TB each key's scan is a sorted partition
    pass — the same shape as ``user_sessions``' gaps-and-islands.
    """
    from mistocksync_spark.functions.numeric import _u

    ev = df.filter(F.col(value).isNotNull()).select(
        F.col(key),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        _u(value).cast("long").alias("__x"),
    )
    base = ev.groupBy(key).agg(
        F.floor(F.sum("__x").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("baseline_micro"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = ev.join(base, on=key).withColumn(
        "__cum", F.sum(F.col("__x") - F.col("baseline_micro")).over(w)
    )
    s = c.select(
        key,
        "__ts",
        (F.col("__cum") - F.least(F.lit(0).cast("long"), F.min("__cum").over(w))).alias("__s_up"),
        (F.greatest(F.lit(0).cast("long"), F.max("__cum").over(w)) - F.col("__cum")).alias("__s_down"),
    )
    mx = s.groupBy(key).agg(
        F.max("__s_up").alias("max_up_micro"),
        F.max("__s_down").alias("max_down_micro"),
    )
    at_max = (
        s.join(mx, on=key)
        .filter(F.col("__s_up") == F.col("max_up_micro"))
        .groupBy(key)
        .agg(F.min("__ts").alias("ts_at_max_up"))
    )
    return (
        base.join(mx, on=key)
        .join(at_max, on=key)
        .select(
            key,
            "n_events",
            "baseline_micro",
            "max_up_micro",
            "max_down_micro",
            "ts_at_max_up",
        )
    )
