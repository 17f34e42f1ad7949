"""Property tests for the round-5 operators: invariants that must hold on
ARBITRARY inputs, not just the synthetic corpus — each @given example set
batches into ONE DataFrame so the Spark round-trip count stays small."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_floats = st.floats(
    min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False, width=32
)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(_floats, min_size=1, max_size=8), min_size=1, max_size=6))
def test_quantize_int8_error_bound_and_code_range(spark, vecs):
    from mistocksync_spark.operators.vectors import quantize_int8

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    for r in quantize_int8(df).collect():
        v = vecs[r.vec_id]
        maxabs = max(abs(float(x)) for x in v)
        if maxabs == 0:
            assert (r.scale_r, r.sum_q, r.recon_err_r) == (0.0, 0, 0.0)
            continue
        scale = 127.0 / float(
            __import__("numpy").float32(maxabs)
        )  # float32 storage narrows maxabs first
        # per-dim quantization error <= half a code step -> bounded total
        bound = r.n_dims * (0.5 / scale) ** 2
        assert r.recon_err_r <= bound + 1e-9
        assert abs(r.sum_q) <= 127 * r.n_dims


@settings(max_examples=10, deadline=None)
@given(st.lists(_floats, min_size=1, max_size=60), st.integers(min_value=1, max_value=8))
def test_value_histogram_partitions_rows(spark, values, nbins):
    from mistocksync_spark.operators.aggregates import value_histogram

    df = spark.createDataFrame([(float(v),) for v in values], "value double")
    rows = value_histogram(df, nbins=nbins).collect()
    assert sum(r.cnt for r in rows) == len(values)
    assert all(0 <= r.bin < nbins for r in rows)
    assert len({r.bin for r in rows}) == len(rows)  # one row per bucket


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", "c"])),
        min_size=2,
        max_size=40,
    )
)
def test_transition_probs_sum_to_one_per_from_type(spark, events):
    from datetime import datetime, timedelta

    from mistocksync_spark.operators.temporal import transition_matrix

    t0 = datetime(2026, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=i), int(u), ty, 0.0)
        for i, (u, ty) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = transition_matrix(df).collect()
    by_from = {}
    for r in out:
        by_from.setdefault(r.from_type, []).append(r)
    for from_type, rs in by_from.items():
        total = sum(r.cnt for r in rs)
        assert all(r.prob == round(r.cnt / total, 6) for r in rs)
        assert abs(sum(r.prob for r in rs) - 1.0) < 1e-4  # rounding slack
    # pair count conservation: transitions = events - users with >=1 event
    n_users = len({u for u, _ in events})
    assert sum(r.cnt for r in out) == len(events) - n_users


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(_floats, min_size=4, max_size=4),
        min_size=2,
        max_size=12,
        unique_by=lambda v: tuple(v),
    )
)
def test_semantic_dedup_matches_brute_force_reference(spark, vecs):
    """On arbitrary vectors, semantic_dedup's keep decision must equal a
    Python reference that replays the same semantics: assign each vector
    to its best (lowest-index-on-tie) centroid among the lowest-id seeds,
    then drop any vector with a lower-id same-cluster neighbor at
    cosine >= threshold."""
    from mistocksync_spark.operators.vectors import semantic_dedup

    n_clusters = 3
    thr = 0.9

    def py_cos(a, b):
        da = 0.0
        for x, y in zip(a, b):
            da += float(x) * float(y)
        na = 0.0
        for x in a:
            na += float(x) * float(x)
        nb = 0.0
        for y in b:
            nb += float(y) * float(y)
        denom = math.sqrt(na) * math.sqrt(nb)
        return da / denom if denom > 0 else 0.0

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    cents = [v for _, v in rows[: min(n_clusters, len(rows))]]
    expect = {}
    assign = {}
    for i, v in rows:
        best = max(range(len(cents)), key=lambda c: (py_cos(v, cents[c]), -c))
        assign[i] = best
    for i, v in rows:
        dropped = any(
            j < i and assign[j] == assign[i] and py_cos(rows[j][1], v) >= thr
            for j, _ in rows
        )
        expect[i] = 0 if dropped else 1

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.keep
        for r in semantic_dedup(df, n_clusters=n_clusters, threshold=thr).collect()
    }
    assert got == expect
