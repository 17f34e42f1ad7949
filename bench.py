"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Materialization uses the noop datasource sink — full execution, no
driver-side collect cost.

Methodology (round-3/4 verdicts):

- **Hygiene**: cache/broadcast/Python-worker state left by one query
  inflated the next one's reading by up to 2×, so every timed run starts
  from a cleared cache and cleared feed/cascade memos.
- **Adaptive median cold**: iterative/codegen-heavy entries (dedup_clusters
  measured 9.5 vs 31.4 s in back-to-back runs) make a single cold sample
  untrustworthy; each entry is timed at least twice cold, with a THIRD
  sample only when the first two disagree by more than 15% (stable entries
  don't pay for it, so the whole bench stays inside any driver timeout).
  The per-query number is the MEDIAN of collected samples, all of which are
  reported (``queries_cold_runs``) so variance itself is on the record.
- **Cold AND warm totals**: ``value`` (the headline, what the 2× gate in
  BASELINE.md applies to) is the sum of median-cold runs — the cost a fresh
  session pays per query with nothing shared.  ``value_warm`` sums one
  in-process re-run per query (plan/JIT hot, memos still cleared) — the
  steady-state cost a long-lived session pays.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _reset(spark):
    """Clear cross-query state so each entry is measured cold: cached
    feeds/bands from previous entries would turn downstream scans into
    memory reads and upstream ones into cache-build overhead."""
    spark.catalog.clearCache()
    from mistocksync_spark.plans import feeds, queries

    feeds._FEED_MEMO.clear()
    queries._cascade_memo_clear()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cold_samples = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3"))

    from mistocksync_spark.plans.queries import QUERIES
    from mistocksync_spark.session import get_spark

    # Headline set: the flagship aggregation, the matching cascade stages,
    # the merge-source join, audit, and the scale extensions.
    headline = [
        "q1_pricing_summary",
        "exact_article_match",
        "new_items",
        "price_update_join",
        "bracket_code_match",
        "product_code_match",
        "fuzzy_match",
        "duplicate_audit",
        "price_merge",
        "report_matches_sheet",
        "events_hourly",
        "exact_dedup",
        "minhash_lsh_pairs",
        "simhash_dedup_pairs",
        "ngram_jaccard_pairs",
        "dedup_clusters",
        "doc_quality",
        "embedding_topk",
        "embedding_near_dup",
        "events_asof",
        "user_sessions",
    ]
    headline = [q for q in headline if q in QUERIES]

    # Scale-path variants measured alongside (NOT in the headline total):
    # the alternative plans that take over at 100× candidate volume, benched
    # so the switchover point is a recorded number, not an argument
    # (round-2 verdict: the ngram fuzzy path was "argued, not measured").
    scale_paths = [q for q in ["fuzzy_match_ngram"] if q in QUERIES]

    # Round-4 extension operators, one cold run each (NOT in the headline
    # total — membership there is frozen for baseline comparability): the
    # numbers exist so new operators never ship without a recorded cost.
    extensions = [
        q
        for q in [
            "embedding_knn_join",
            "mixture_plan",
            "embedding_contamination",
            "dedup_cluster_histogram",
            "events_ohlc",
            "events_funnel",
            "events_funnel_1h",
            "exact_dedup_stream",
        ]
        if q in QUERIES
    ]

    spark = get_spark("bench", cpus=int(cpus))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    def run_once(name: str) -> float:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    timings, cold_runs, warm = {}, {}, {}
    for name in headline:
        samples = []
        for i in range(cold_samples):
            if i >= 2 and max(samples) <= 1.15 * min(samples):
                break  # first two agree within 15% — skip the tiebreaker
            _reset(spark)
            samples.append(run_once(name))
        cold_runs[name] = samples
        timings[name] = round(statistics.median(samples), 3)
        warm[name] = run_once(name)  # no reset: plan/JIT/cache hot

    scale_timings = {}
    for name in scale_paths:
        _reset(spark)
        scale_timings[name] = run_once(name)

    ext_timings = {}
    for name in extensions:
        _reset(spark)
        ext_timings[name] = run_once(name)

    total = round(sum(timings.values()), 3)
    total_warm = round(sum(warm.values()), 3)

    # the fuzzy_match entry times the FULL candidate batch; report the
    # scored-pair count so the measured workload is explicit
    from mistocksync_spark.plans.queries import fuzzy_match_pair_count

    _reset(spark)
    pairs = fuzzy_match_pair_count(spark, sf_dir)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "methodology": "sum of per-query median-of-%d cold runs (cache+memos cleared); see BASELINE.md" % cold_samples,
                "value_warm": total_warm,
                "queries": timings,
                "queries_cold_runs": cold_runs,
                "queries_warm": warm,
                "scale_path_queries": scale_timings,
                "extension_queries": ext_timings,
                "sf": float(sf),
                "fuzzy_match_scored_pairs": pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
