"""Maintain tools/oracle_digests.json — each query's oracle-SQL digest AS
OF ITS LAST GRADE.  The grading-window ordering (__spark_entry__.py)
re-prioritizes any query whose current oracle digest differs from this
snapshot, because its standing grade no longer covers the current SQL.

Default (merge) mode — run at ROUND START, before any code change:
updates digests ONLY for queries present in the newest CORRECTNESS_r*.json
(the tree is unchanged since the driver graded it, so the current oracles
ARE the grade-time oracles for exactly those queries).  Entries for
queries outside that window keep their older grade-time digests, so a
pending changed-oracle flag survives until the query actually re-grades.

A blanket refresh (--full) erases pending flags and is ONLY for
bootstrapping a missing snapshot — never part of the round ritual, and in
particular never at END of round (that would clear the flag of every
changed-oracle query that missed the bounded window, leaving stale PASSes
standing forever — round-7 review finding).

Usage:
    python tools/digest_snapshot.py          # merge grade-time digests
    python tools/digest_snapshot.py --full   # bootstrap only
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _warn_if_plans_dirty() -> None:
    """Merge mode assumes the tree is unchanged since the driver graded it
    (round start, BEFORE any oracle edit).  If mistocksync_spark/plans/
    differs from the commit that added the newest CORRECTNESS file, the
    merge would store EDITED digests as if graded — warn loudly and name
    the sentinel procedure (tests/test_layout.py's
    test_digest_snapshot_never_certifies_post_grade_edits fails on the
    resulting state until the pins are in)."""
    import subprocess

    best = None
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), path)
    if best is None:
        return
    commit = subprocess.run(
        ["git", "log", "-n1", "--format=%H", "--", f"CORRECTNESS_r{best[0]}.json"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    if not commit:
        return
    diff = subprocess.run(
        ["git", "diff", commit, "--name-only", "--", "mistocksync_spark/plans"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    status = subprocess.run(
        ["git", "status", "--porcelain", "--", "mistocksync_spark/plans"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    if diff or status:
        print(
            "WARNING: mistocksync_spark/plans/ differs from the "
            f"r{best[0]} grade commit — this merge runs AFTER oracle "
            "edits.  Pin every edited r-window query in "
            "tools/oracle_digests.json to a sentinel "
            f"(r{best[0]}-oracle-changed-pending-regrade) or the suite's "
            "snapshot-coherence test will fail.\n"
            f"  changed: {diff or status}"
        )


def _latest_correctness_keys() -> set[str]:
    best: tuple[int, str] | None = None
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, path)
    if best is None:
        return set()
    try:
        with open(best[1]) as f:
            return set(json.load(f).keys())
    except (OSError, ValueError):
        return set()


def main() -> None:
    from __spark_entry__ import oracle_digest
    from mistocksync_spark.plans.queries import ORACLES

    path = os.path.join(REPO, "tools", "oracle_digests.json")
    full = "--full" in sys.argv
    try:
        with open(path) as f:
            snap = json.load(f)
    except (OSError, ValueError):
        snap = {}
        full = True

    if full:
        snap = {k: oracle_digest(v) for k, v in ORACLES.items()}
        updated = len(snap)
    else:
        _warn_if_plans_dirty()
        graded = _latest_correctness_keys()
        updated = 0
        for k in graded:
            if k in ORACLES:
                snap[k] = oracle_digest(ORACLES[k])
                updated += 1
        # drop entries for queries no longer registered
        snap = {k: v for k, v in snap.items() if k in ORACLES}

    with open(path, "w") as f:
        json.dump(snap, f, indent=0, sort_keys=True)
    mode = "full" if full else "merge"
    print(f"{mode}: {updated} digests updated, {len(snap)} total -> {path}")


if __name__ == "__main__":
    main()
