"""Dump ``explain("formatted")`` for named queries into plans/<tag>/.

Usage: python tools/explain_dump.py <tag> <suffix> [sf_dir] [query ...]

Writes ``plans/<tag>/<query>_<suffix>.txt`` for each named query (default:
the frozen bench headline set) — the before/after plan evidence an
optimization round commits alongside its measurements.  Streaming-backed
entries (per-microbatch plans) are skipped with a stub note.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
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


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or HEADLINE

    from mistocksync_spark.plans.queries import QUERIES
    from mistocksync_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not registered")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            import contextlib
            import io

            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # streaming entries build/run side effects
            plan = f"(no static plan: {type(e).__name__}: {e})\n"
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} [{suffix}]\n")
            f.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
