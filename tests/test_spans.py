"""Exact-substring (duplicated-span) dedup family + salted dim join.

Unit tests on hand-built corpora with known span arithmetic; parity tests
(anchored == exact, salted join == plain join) on the graded fixtures.
"""

import pytest
from pyspark.sql import functions as F

from mistocksync_spark.operators.dedup import (
    anchored_span_candidates,
    char_gram_positions,
    duplicated_span_coverage,
    duplicated_spans,
    duplicated_spans_anchored,
    span_anchor_recall,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_gram_positions_counts_and_short_docs(spark):
    df = _docs(spark, [(1, "a" * 35), (2, "b" * 30), (3, "c" * 29), (4, "")])
    pos = char_gram_positions(df, gram_len=30).collect()
    by_doc = {}
    for r in pos:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    # len 35 → 6 windows at pos 1..6; len 30 → exactly 1; shorter → none
    assert sorted(by_doc[1]) == [1, 2, 3, 4, 5, 6]
    assert by_doc[2] == [1]
    assert 3 not in by_doc and 4 not in by_doc


def test_duplicated_spans_exact_arithmetic(spark):
    # a 70-char shared block inside otherwise-unique texts: the maximal
    # span must be exactly the block, at the planted offsets
    block = "я" * 10 + "общий разделяемый текст достаточной длины для споттинга" + "ю" * 5
    assert len(block) == 70
    df = _docs(
        spark,
        [
            (1, "x" * 5 + block + "q" * 8),
            (2, "z" * 11 + block + "w" * 3),
            (3, "совершенно другой текст " * 5),
        ],
    )
    pos = char_gram_positions(df, gram_len=30)
    spans = duplicated_spans(pos, gram_len=30, min_span=60).collect()
    assert len(spans) == 1
    s = spans[0]
    # 1-based: block starts at 6 in doc 1, at 12 in doc 2
    assert (s.doc_a, s.doc_b, s.start_a, s.start_b, s.span_len) == (1, 2, 6, 12, 70)


def test_duplicated_spans_below_threshold_dropped(spark):
    block = "общая строка ровно пятидесяти девяти символов длины ещё буквы"[:59]
    df = _docs(spark, [(1, block + "-хвост один уникальный"), (2, block + "+другой хвост здесь")])
    pos = char_gram_positions(df, gram_len=30)
    # 59 shared chars < 60 → no span; lowering min_span admits it
    assert duplicated_spans(pos, 30, 60).count() == 0
    spans = duplicated_spans(pos, 30, 59).collect()
    assert len(spans) == 1 and spans[0].span_len >= 59


def test_coverage_interval_union(spark):
    # doc 1 and doc 2 share a 40-char block; doc 1 repeats it twice with a
    # gap — coverage must union the two occurrences without double-counting
    block = "разделяемый сорокасимвольный блок текста"
    assert len(block) == 40
    df = _docs(
        spark,
        [
            (1, block + "-" * 20 + block),
            (2, block + " совсем другое продолжение этого документа"),
            (3, "уникальный текст без каких-либо повторов вообще нигде"),
        ],
    )
    cov = {r.doc_id: r for r in duplicated_span_coverage(df, gram_len=30).collect()}
    assert cov[1].doc_len == 100 and cov[2].doc_len == 82
    # doc 1: both 40-char occurrences duplicated (grams occur in 2 docs)
    assert cov[1].dup_chars == 80 and abs(cov[1].dup_frac - 0.8) < 1e-9
    assert cov[2].dup_chars == 40
    assert cov[3].dup_chars == 0 and cov[3].dup_frac == 0.0


def test_anchored_equals_exact_on_fixture(spark):
    from mistocksync_spark.plans.feeds import docs_span

    pos = char_gram_positions(docs_span(spark, "/root/testdata/sf0.001")).localCheckpoint()
    exact = {tuple(r) for r in duplicated_spans(pos, 30, 60).collect()}
    anch = {tuple(r) for r in duplicated_spans_anchored(pos, 30, 60).collect()}
    # rescore guarantees precision: anchored ⊆ exact; and on this fixture
    # the planted header/footer clusters all anchor → full recall
    assert anch <= exact
    rec = span_anchor_recall(pos, 30, 60).collect()[0]
    assert rec.n_exact_pairs > 0
    assert rec.n_recalled == len({(a, b) for a, b, *_ in anch} & {(a, b) for a, b, *_ in exact})
    assert rec.pair_recall == pytest.approx(1.0)
    assert anch == exact


def test_anchor_candidates_are_pairs_sharing_anchored_gram(spark):
    df = _docs(
        spark,
        [
            (1, "блок общий для двух документов достаточно длинный чтобы шинглы совпали"),
            (2, "блок общий для двух документов достаточно длинный чтобы шинглы совпали"),
            (3, "никак не связанный с остальными текст совершенно иного содержания тут"),
        ],
    )
    pos = char_gram_positions(df, gram_len=30)
    cand = {(r.doc_a, r.doc_b) for r in anchored_span_candidates(pos).collect()}
    assert cand == {(1, 2)}


def test_salted_dim_join_equals_plain_join(spark, sf_dir):
    from mistocksync_spark.operators.aggregates import salted_dim_join
    from mistocksync_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir).select("event_id", "event_type", "value")
    dim = ev.select("event_type").distinct().withColumn(
        "type_len", F.length("event_type")
    )
    salted = salted_dim_join(ev, dim, "event_type", salt_buckets=16, salt_cols=["event_id"])
    plain = ev.join(dim, on="event_type")
    assert salted.count() == plain.count() == ev.count()
    a = {tuple(r) for r in salted.select("event_id", "event_type", "type_len").collect()}
    b = {tuple(r) for r in plain.select("event_id", "event_type", "type_len").collect()}
    assert a == b


def test_salted_dim_join_salt_column_dropped_and_no_dup_rows(spark):
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 != 0 else "cold") for i in range(100)], "id long, k string"
    )
    dim = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, attr int")
    from mistocksync_spark.operators.aggregates import salted_dim_join

    out = salted_dim_join(fact, dim, "k", salt_buckets=4, salt_cols=["id"])
    assert "__salt" not in out.columns
    # 1:1 with the fact side: the dim replication must never duplicate rows
    assert out.count() == 100
    assert out.filter((F.col("k") == "hot") & (F.col("attr") != 1)).count() == 0


def test_salted_dim_join_rejects_footguns(spark):
    """r12 ADVICE: salt_cols is required and must not be the join key
    (hash(key) is constant per key — zero spread); a pre-existing __salt
    column fails fast instead of silently corrupting the join."""
    import pytest

    from mistocksync_spark.operators.aggregates import salted_dim_join

    fact = spark.createDataFrame([(1, "a")], "id long, k string")
    dim = spark.createDataFrame([("a", 1)], "k string, attr int")
    with pytest.raises(ValueError, match="salt_cols is required"):
        salted_dim_join(fact, dim, "k")
    with pytest.raises(ValueError, match="constant within a key"):
        salted_dim_join(fact, dim, "k", salt_cols=["k"])
    with pytest.raises(ValueError, match="__salt"):
        salted_dim_join(fact.withColumn("__salt", F.lit(0)), dim, "k", salt_cols=["id"])
    with pytest.raises(ValueError, match="__salt"):
        salted_dim_join(fact, dim.withColumn("__salt", F.lit(0)), "k", salt_cols=["id"])


def test_similarity_pagerank_integer_exact_star(spark):
    from mistocksync_spark.operators.dedup import _PR_SCALE, similarity_pagerank

    # star: 0-1, 0-2, 0-3 — hand-replicate the integer recurrence
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long")
    got = {r.doc_id: r.rank_micro for r in similarity_pagerank(pairs, iterations=2).collect()}

    deg = {0: 3, 1: 1, 2: 1, 3: 1}
    n = 4
    base = (15 * _PR_SCALE) // (100 * n)
    r = {v: _PR_SCALE // n for v in deg}
    for _ in range(2):
        nxt = {}
        for v in deg:
            mass = 0
            for u in deg:
                if (u == 0) != (v == 0):  # star edges: center <-> leaf
                    mass += (r[u] * 85) // (100 * deg[u])
            nxt[v] = base + mass
        r = nxt
    assert got == r
    # mass conservation up to truncation: total stays within 1 unit/edge/round
    assert abs(sum(got.values()) - _PR_SCALE) < 100
    # the hub outranks every leaf
    assert got[0] > got[1] == got[2] == got[3]


def test_cluster_canonicals_picks_hub_then_min_id(spark):
    from mistocksync_spark.operators.dedup import (
        cluster_canonicals,
        connected_components,
        similarity_pagerank,
    )

    # two components: a star hubbed at 10 (hub must win) and an edge 20-21
    # (symmetric ranks — tie must break to the LOWER doc_id)
    pairs = spark.createDataFrame(
        [(10, 11), (10, 12), (10, 13), (20, 21)], "doc_a long, doc_b long"
    )
    out = {
        r.cluster_id: r
        for r in cluster_canonicals(
            connected_components(pairs), similarity_pagerank(pairs, iterations=3)
        ).collect()
    }
    assert set(out) == {10, 20}
    assert out[10].canonical_id == 10 and out[10].n_members == 4
    assert out[20].canonical_id == 20 and out[20].n_members == 2


def _bpe_reference(texts, n_merges):
    """Pure-python BPE learner (greedy left-to-right merge application) —
    the independent reference both engine formulations must match."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.lower().split() if w)
    words = {w: list(w) for w in wc}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, sym in words.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += wc[w]
        if not pc:
            break
        # total order: count DESC then lhs ASC then rhs ASC
        top = max(pc.values())
        a, b = min(p for p, c in pc.items() if c == top)
        merges.append((rank, a, b, pc[(a, b)]))
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    return merges


def test_greedy_merge_equals_parity_island_rule():
    """The oracle's parity-within-island positional selection is the
    greedy left-to-right merge — exhaustive over short binary symbol
    strings (the only adjacency-conflict cases are a==b runs)."""
    import itertools

    def greedy(sym, a, b):
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        return out

    def parity(sym, a, b):
        matches = [i for i in range(len(sym) - 1) if sym[i] == a and sym[i + 1] == b]
        sel, prev, start = set(), None, None
        for p in matches:
            if prev is None or p != prev + 1:
                start = p
            if (p - start) % 2 == 0:
                sel.add(p)
            prev = p
        out, skip = [], False
        for i, s in enumerate(sym):
            if skip:
                skip = False
                continue
            if i in sel:
                out.append(a + b)
                skip = True
            else:
                out.append(s)
        return out

    for n in range(9):
        for sym in itertools.product("ab", repeat=n):
            for a, b in itertools.product("ab", repeat=2):
                assert greedy(list(sym), a, b) == parity(list(sym), a, b)


def test_bpe_learn_merges_matches_reference(spark):
    from mistocksync_spark.operators.textual import bpe_learn_merges

    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "аба аба абаб caca",  # run-merge and multibyte coverage
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count) for r in bpe_learn_merges(df, n_merges=8).collect()]
    assert got == _bpe_reference(texts, 8)


def test_bpe_token_stats_matches_reference_encode(spark):
    from collections import Counter

    from mistocksync_spark.operators.textual import bpe_token_stats

    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [(r.token, r.corpus_count) for r in bpe_token_stats(df, n_merges=4, top_k=10).collect()]

    # reference: learn 4 merges, encode, count tokens corpus-weighted
    wc = Counter(w for t in texts for w in t.lower().split())
    words = {w: list(w) for w in wc}
    for _ in range(4):
        pc = Counter()
        for w, sym in words.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += wc[w]
        top = max(pc.values())
        a, b = min(p for p, c in pc.items() if c == top)
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    tc = Counter()
    for w, sym in words.items():
        for s in sym:
            tc[s] += wc[w]
    want = sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_cusum_drift_detects_planted_level_shift(spark):
    import datetime

    from mistocksync_spark.operators.temporal import cusum_drift

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    # key 'shift': 50 events at 10.0 then 50 at 14.0 — upward drift peaks
    # at the END of the stream with max_up = sum of (14 - baseline=12)
    for i in range(100):
        rows.append((i, t0 + datetime.timedelta(minutes=i), "shift", 10.0 if i < 50 else 14.0))
    # key 'flat': constant value — both CUSUM maxima must be exactly 0
    for i in range(40):
        rows.append((1000 + i, t0 + datetime.timedelta(minutes=i), "flat", 7.5))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = {r.event_type: r for r in cusum_drift(df).collect()}

    flat = out["flat"]
    assert (flat.baseline_micro, flat.max_up_micro, flat.max_down_micro) == (7_500_000, 0, 0)

    sh = out["shift"]
    assert sh.baseline_micro == 12_000_000 and sh.n_events == 100
    # up-drift: 50 × (14−12) = 100.0 units; down-drift: 50 × (12−10) = 100.0
    assert sh.max_up_micro == 100_000_000 and sh.max_down_micro == 100_000_000
    # the upward peak is first reached at the last event
    assert sh.ts_at_max_up == t0 + datetime.timedelta(minutes=99)

    # python replication of the exact recursion on the shift stream
    xs = [10_000_000] * 50 + [14_000_000] * 50
    b, s, mx = 12_000_000, 0, 0
    for x in xs:
        s = max(0, s + (x - b))
        mx = max(mx, s)
    assert mx == sh.max_up_micro


def test_hashed_tfidf_vectors_exact_arithmetic(spark):
    import hashlib

    from mistocksync_spark.operators.textual import hashed_tfidf_vectors

    texts = {1: "aa bb aa", 2: "aa cc"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: list(r.embedding) for r in hashed_tfidf_vectors(df, dim=8).collect()}

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 8

    n = 2
    dfreq = {"aa": 2, "bb": 1, "cc": 1}
    want = {d: [0.0] * 8 for d in texts}
    for d, txt in texts.items():
        tf = {}
        for t in txt.split():
            tf[t] = tf.get(t, 0) + 1
        acc = {}
        for t, c in tf.items():
            acc[bucket(t)] = acc.get(bucket(t), 0) + c * ((1_000_000 * n) // dfreq[t])
        for b, w in acc.items():
            want[d][b] = w / 1_000_000.0
    assert got == want


def test_doc_clusters_kmeans_partitions_two_topics(spark):
    from mistocksync_spark.operators.textual import hashed_tfidf_vectors
    from mistocksync_spark.operators.vectors import ivf_assign, ivf_train

    # two disjoint vocabularies → k=2 k-means must separate them exactly
    rows = []
    for i in range(10):
        rows.append((i, "гв шк лом пика careful" if i % 2 == 0 else "zz qq rr ss tt"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_tfidf_vectors(df, dim=16).localCheckpoint()
    cents = ivf_train(vecs, n_centroids=2, iterations=2, vec_col="embedding", id_col="doc_id")
    assign = {r.vec_id: r.centroid for r in ivf_assign(vecs, cents, "embedding", "doc_id").collect()}
    even = {assign[i] for i in range(0, 10, 2)}
    odd = {assign[i] for i in range(1, 10, 2)}
    assert len(even) == 1 and len(odd) == 1 and even != odd


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    from mistocksync_spark.sinks.layout import bucketed_table_write

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_mktsegment")
    bucketed_table_write(o, "t_orders_bkt", str(tmp_path / "o"), "o_custkey", 4)
    bucketed_table_write(c, "t_cust_bkt", str(tmp_path / "c"), "c_custkey", 4)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ob, cb = spark.table("t_orders_bkt"), spark.table("t_cust_bkt")
            j = ob.join(cb, ob.o_custkey == cb.c_custkey)
            plan = j._jdf.queryExecution().executedPlan().toString()
            # co-located: the SMJ reads co-numbered buckets directly — no
            # Exchange anywhere in the join plan, bucket scan visible
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
            # and the join result matches the plain (shuffled) join
            assert j.count() == o.join(c, o.o_custkey == c.c_custkey).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_cust_bkt")


def test_hll_registers_and_estimate_match_python_replication(spark):
    import hashlib

    from mistocksync_spark.operators.aggregates import _HLL_K, _HLL_M, hll_estimate

    ids = list(range(1000))
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    row = hll_estimate(df, "user_id").collect()[0]

    regs = [0] * _HLL_M
    for i in ids:
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        b, w = u % _HLL_M, u // _HLL_M
        rho = 53 - w.bit_length() if w > 0 else 53
        regs[b] = max(regs[b], rho)
    sum_scaled = sum(1 << (53 - r) for r in regs)
    est = round(_HLL_K / float(sum_scaled), 3)

    assert row.n_exact == 1000 and row.m == _HLL_M
    assert row.sum_scaled == sum_scaled
    assert row.zero_registers == sum(1 for r in regs if r == 0)
    assert row.hll_estimate == est
    # the raw m=256 estimator should be within ~10% at n=1000 (1.04/sqrt(m) ≈ 6.5%)
    assert abs(est - 1000) / 1000 < 0.15


def test_degenerate_inputs_grade_cleanly(spark):
    """r12 ADVICE: the recall/error ratios must NULL (not error or
    engine-diverge) when their denominator is zero — empty corpus for
    hll_estimate, no exact span pairs for span_anchor_recall."""
    from mistocksync_spark.operators.aggregates import hll_estimate

    row = hll_estimate(
        spark.createDataFrame([], "user_id long"), "user_id"
    ).collect()[0]
    assert row.n_exact == 0 and row.err_ppm is None

    # two docs with no shared >=60-char span → n_exact_pairs == 0
    df = spark.createDataFrame(
        [(1, "a" * 10 + "совершенно уникальный первый текст без повторов " + "x" * 40),
         (2, "второй документ с полностью другим содержанием и словами " + "y" * 40)],
        "doc_id long, text string",
    )
    pos = char_gram_positions(df, gram_len=30)
    rec = span_anchor_recall(pos, 30, 60).collect()[0]
    assert rec.n_exact_pairs == 0 and rec.pair_recall is None
