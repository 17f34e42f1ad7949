"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Materialization uses the noop datasource sink — full execution, no
driver-side collect cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

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

    spark = get_spark("bench", cpus=int(cpus))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    timings = {}
    for name in headline:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)

    # the fuzzy_match entry times the FULL candidate batch; report the
    # scored-pair count so the measured workload is explicit
    from mistocksync_spark.plans.queries import fuzzy_match_pair_count

    pairs = fuzzy_match_pair_count(spark, sf_dir)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "fuzzy_match_scored_pairs": pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
