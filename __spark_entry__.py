"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
one callable per implemented operator (SURVEY.md §2) and ``oracle_sql()``
the matching DuckDB SQL over the same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mistocksync_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _latest_grades() -> dict[str, dict]:
    """Per query, the row from the HIGHEST-numbered CORRECTNESS_r*.json it
    appears in (the driver grades a bounded window per round, so the latest
    row is the binding signal for that query)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds: list[tuple[int, dict]] = []
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rounds.append((int(m.group(1)), json.load(f)))
        except (OSError, ValueError):
            continue
    latest: dict[str, dict] = {}
    for rnd, data in sorted(rounds):
        for k, v in data.items():
            # a malformed (non-dict) row must FAIL SAFE into the re-grade
            # rotation, not score as a pass
            row = dict(v) if isinstance(v, dict) else {"err": "malformed"}
            row["__round"] = rnd
            latest[k] = row
    return latest


def oracle_digest(sql: str) -> str:
    """Digest of an oracle SQL string — the single definition shared with
    tools/digest_snapshot.py so the snapshot and the comparison can never
    drift apart."""
    import hashlib

    return hashlib.sha256(sql.encode()).hexdigest()[:16]


def _oracle_digest_changes(oracles: dict[str, str]) -> set[str]:
    """Queries whose oracle SQL changed since its LAST GRADE.

    tools/oracle_digests.json records each query's oracle digest as of
    the round that last graded it (tools/digest_snapshot.py merges in
    grade-time digests at ROUND START, for exactly the queries in the
    newest CORRECTNESS file — a blanket end-of-round refresh would erase
    the pending flag of any changed-oracle query that missed the bounded
    window, leaving its stale PASS standing forever).  A digest mismatch
    means the standing grade no longer covers the current SQL, so the
    query re-enters the window."""
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "tools", "oracle_digests.json")) as f:
            snap = json.load(f)
    except (OSError, ValueError):
        return set()
    changed = set()
    graded = _latest_grades()
    for k, sql in oracles.items():
        if k in snap:
            if snap[k] != oracle_digest(sql):
                changed.add(k)
        elif k in graded:
            # graded but never snapshotted (added after the bootstrap,
            # graded in a round whose window is no longer the newest
            # CORRECTNESS file): its grade-time digest is unknown, so a
            # stale PASS could be standing — treat as changed (round-7
            # advisor finding)
            changed.add(k)
    return changed


def _window_order(d: dict) -> dict:
    """Registry iteration order for the driver's bounded grading window:
    (1) never graded, (2) latest grade FAIL/PARTIAL, (3) oracle added or
    changed since that grade, (4) rest — so a known-FAIL or an upgraded
    oracle is always re-tested instead of being treated as done forever
    (round-6 verdict ask #2)."""
    latest = _latest_grades()
    from mistocksync_spark.plans.queries import ORACLES

    changed = _oracle_digest_changes(ORACLES)

    def rank(k: str) -> int:
        row = latest.get(k)
        if row is None:
            return 0  # never graded
        err = row.get("err")
        # POSITIVE evidence of a pass required: a malformed-but-dict row
        # (e.g. {} from a truncated CORRECTNESS write) has rows_match
        # None, which `is not False` would score as a pass, leaving a
        # stale/absent grade standing (round-7 advisor finding).  A
        # rows-only grade records all-None matches with err='no_oracle'
        # and a non-negative spark_rows — its positive evidence is the
        # row count, not the match flags.
        if err == "no_oracle":
            ok = isinstance(row.get("spark_rows"), int) and row["spark_rows"] >= 0
        else:
            ok = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            )
        if not ok:
            return 1  # latest grade FAIL/PARTIAL/malformed
        if (err == "no_oracle" and k in ORACLES) or k in changed:
            return 2  # oracle added/changed since last grade
        return 3

    registry_pos = {k: i for i, k in enumerate(d)}

    def order(k: str):
        # within the healthy-PASS tail, re-grade the STALEST grade first
        # (least-recently-graded rotation) so the bounded window keeps
        # every standing PASS fresh instead of re-testing the same
        # early-registry names every round
        r = rank(k)
        age = latest.get(k, {}).get("__round", 0) if r == 3 else 0
        return (r, age, registry_pos[k])

    keys = sorted(d, key=order)
    return {k: d[k] for k in keys}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _window_order(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted keys → rows-only check)."""
    return _window_order(dict(ORACLES))
