"""Tests for the round-2 extensions: connected-components dedup clustering,
as-of join, deterministic stratified sampling, exact length quantiles."""

import datetime

from pyspark.sql import functions as F


def test_connected_components_basic(spark):
    from mistocksync_spark.operators.dedup import connected_components

    # Two components: {1,2,3,4} (chain) and {10, 11}; 20-21-22 triangle.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["doc_a", "doc_b"],
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain(spark):
    from mistocksync_spark.operators.dedup import connected_components

    n = 12
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], ["doc_a", "doc_b"])
    got = connected_components(pairs).collect()
    assert all(r["cluster_id"] == 0 for r in got)
    assert len(got) == n + 1


def test_dedup_survivors_keeps_representatives(spark):
    from mistocksync_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame([(i,) for i in range(1, 13)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    got = sorted(r["doc_id"] for r in dedup_survivors(docs, pairs).collect())
    # 2, 3, 11 are non-representative cluster members; everything else stays
    assert got == [1, 4, 5, 6, 7, 8, 9, 10, 12]


def test_connected_components_raises_on_exhausted_iterations(spark):
    import pytest

    from mistocksync_spark.operators.dedup import connected_components

    # chain of diameter 6 cannot converge in 2 min-label rounds
    pairs = spark.createDataFrame([(i, i + 1) for i in range(6)], ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=2)


def _ts(minute):
    return datetime.datetime(2026, 1, 1, 12, minute, 0)


def test_asof_join_semantics(spark):
    from mistocksync_spark.operators.temporal import asof_join

    clicks = spark.createDataFrame(
        [
            (1, 100, _ts(5)),   # after p@3 -> 30.0
            (2, 100, _ts(10)),  # tie with p@10 -> <= semantics: 99.0
            (3, 100, _ts(2)),   # before any purchase -> null
            (4, 200, _ts(30)),  # user with no purchases -> null
        ],
        ["event_id", "user_id", "ts"],
    )
    purchases = spark.createDataFrame(
        [(100, _ts(3), 30.0), (100, _ts(10), 99.0)],
        ["user_id", "ts", "p_value"],
    )
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(clicks, purchases, right_value="p_value").collect()
    }
    assert out[1] == (_ts(3), 30.0)
    assert out[2] == (_ts(10), 99.0)
    assert out[3] == (None, None)
    assert out[4] == (None, None)
    assert set(out) == {1, 2, 3, 4}


def test_length_quantiles_approx_rank_bounded(spark, sf_dir):
    """percentile_approx returns an actual element whose RANK is within the
    sketch bound of the target quantile (the exact op interpolates, so a
    value-distance test is wrong at small strata)."""
    from collections import defaultdict

    from mistocksync_spark.operators.textual import length_quantiles_approx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vals = defaultdict(list)
    for r in docs.select("lang", "n_chars").collect():
        vals[r["lang"]].append(r["n_chars"])
    approx = {(r[0], r[1]): r[2] for r in length_quantiles_approx(docs).collect()}
    assert len(approx) == 4 * len(vals)
    for (lang, q), v in approx.items():
        s = sorted(vals[lang])
        n = len(s)
        i = min(n - 1, max(0, round(q * (n - 1))))
        lo, hi = s[max(0, i - 1)], s[min(n - 1, i + 1)]
        assert lo <= v <= hi, (lang, q, v, lo, hi)


def test_interval_join_boundaries_and_bins(spark):
    import datetime

    from pyspark.sql import functions as F

    from mistocksync_spark.operators.temporal import interval_join

    def us(sec, micro=0):
        return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec, microseconds=micro)

    points = spark.createDataFrame(
        [
            (1, us(0)),               # == start -> in
            (2, us(3599, 999999)),    # just under end -> in (crosses no bin)
            (3, us(3600)),            # == end -> out
            (4, us(7205)),            # inside second window
            (5, us(100000)),          # in no window
        ],
        ["event_id", "ts"],
    )
    intervals = spark.createDataFrame(
        [("a", us(0), us(3600)), ("b", us(7200), us(7300))],
        ["w", "w_start", "w_end"],
    )
    got = {(r.event_id, r.w) for r in interval_join(points, intervals).collect()}
    assert got == {(1, "a"), (2, "a"), (4, "b")}

    # sub-second boundary: ts < end but within the same truncated second
    p = spark.createDataFrame([(9, us(7199, 500000))], ["event_id", "ts"])
    iv = spark.createDataFrame([("c", us(3599, 700000), us(7199, 900000))], ["w", "w_start", "w_end"])
    assert [(r.event_id, r.w) for r in interval_join(p, iv).collect()] == [(9, "c")]


def test_asof_join_carries_native_value_type(spark):
    from mistocksync_spark.operators.temporal import asof_join

    clicks = spark.createDataFrame([(1, 100, _ts(5))], ["event_id", "user_id", "ts"])
    purchases = spark.createDataFrame(
        [(100, _ts(3), "gold-tier")], ["user_id", "ts", "plan"]
    )
    out = asof_join(clicks, purchases, right_value="plan")
    assert out.schema["asof_value"].dataType.simpleString() == "string"
    assert out.collect()[0]["asof_value"] == "gold-tier"


def test_stratified_sample_deterministic(spark, sf_dir):
    from mistocksync_spark.operators.textual import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    a = stratified_sample(docs, {"en": 0.25}, 0.5)
    ids1 = sorted(r["doc_id"] for r in a.collect())
    ids2 = sorted(r["doc_id"] for r in stratified_sample(docs, {"en": 0.25}, 0.5).collect())
    assert ids1 == ids2 and len(ids1) > 0
    # rate=0 keeps nothing, rate=1 keeps (almost) everything
    assert stratified_sample(docs, {}, 0.0).count() == 0
    total = docs.count()
    kept = stratified_sample(docs, {}, 1.0).count()
    assert kept >= total * 0.999  # 65535/65536 bucket edge


def test_length_quantiles_median(spark):
    from mistocksync_spark.operators.textual import length_quantiles

    df = spark.createDataFrame(
        [("en", v) for v in [10, 20, 30, 40, 50]], ["lang", "n_chars"]
    )
    rows = {r["quantile"]: r["n_chars_q"] for r in length_quantiles(df).collect()}
    assert rows[0.5] == 30.0   # rank ceil(5/2)=3
    assert rows[0.25] == 20.0  # rank ceil(5/4)=2
    assert rows[0.9] == 50.0   # discrete: rank ceil(4.5)=5 -> a DATA value,
    #                            never the interpolated 46 (cross-engine
    #                            1-ulp formula surface)


def test_rolling_window_agg_trailing_hour(spark):
    from mistocksync_spark.operators.temporal import rolling_window_agg

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    ev = spark.createDataFrame(
        [
            (1, 7, at(0), 1.0),
            (2, 7, at(1800), 2.0),
            (3, 7, at(3599), 4.0),   # still within 1h of event 1
            (4, 7, at(3600), 8.0),   # event 1 (t=0) ages out: 3600-3599 > 0... frame is [ts-3599, ts]
            (5, 8, at(3600), 16.0),  # other user: independent frame
        ],
        ["event_id", "user_id", "ts", "value"],
    )
    out = {
        r["event_id"]: (r["cnt_win"], r["sum_win"])
        for r in rolling_window_agg(ev, window_seconds=3600).collect()
    }
    assert out[1] == (1, 1.0)
    assert out[2] == (2, 3.0)
    assert out[3] == (3, 7.0)       # 0, 1800, 3599 all within [1, 3600]
    assert out[4] == (3, 14.0)      # frame [1, 3600]: events 2, 3, 4
    assert out[5] == (1, 16.0)


def test_rolling_window_agg_single_shuffle(spark):
    from mistocksync_spark.operators.temporal import rolling_window_agg

    ev = spark.createDataFrame([(1, 7, datetime.datetime(2024, 1, 1), 1.0)], ["event_id", "user_id", "ts", "value"])
    plan = rolling_window_agg(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1


def test_dup_rate_by_source_unordered_rollup(spark):
    from mistocksync_spark.operators.dedup import dup_rate_by_source

    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["doc_a", "doc_b"])
    meta = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "b"), (4, "a"), (5, "a")], ["doc_id", "source"]
    )
    out = {(r["source_a"], r["source_b"]): r["pair_cnt"] for r in dup_rate_by_source(pairs, meta).collect()}
    # (1,2)=(b,a) and (2,3)=(a,b) collapse onto the same unordered pair
    assert out == {("a", "b"): 2, ("a", "a"): 1}


def test_interval_join_inverted_interval_yields_no_bins(spark):
    """end <= start must emit ZERO bins, not a descending sequence() blow-up
    (round-2 advisory): the inverted row matches nothing and the plan never
    materializes a giant spurious bin array."""
    import datetime

    from mistocksync_spark.operators.temporal import interval_join

    def us(sec):
        return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec)

    points = spark.createDataFrame([(1, us(50))], ["event_id", "ts"])
    intervals = spark.createDataFrame(
        [
            ("ok", us(0), us(3600)),
            ("empty", us(100), us(100)),        # end == start
            ("inverted", us(864000), us(0)),    # end << start: would be ~10-day bin range
        ],
        ["w", "w_start", "w_end"],
    )
    got = {(r.event_id, r.w) for r in interval_join(points, intervals).collect()}
    assert got == {(1, "ok")}
