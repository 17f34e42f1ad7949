"""Regenerate the driver-ledger union table (BASELINE.md appendix).

The driver grades a ~50-query window per round; with 88 registered queries
some have never been driver-scored.  This script computes, programmatically
(round-3 advice: the hand-maintained list was wrong), the union of every
CORRECTNESS_r*.json against the current registry and emits a markdown table:

    query | r1 | r2 | r3 | ... | driver-ever-green | local

Verdict letters: P = hash PASS, R = rows-only (declared no_oracle),
E = error, - = not in that round's window.  The "local" column is filled
from a tools/check.py result file if one is passed (--local check.out from
``python tools/check.py <sf_dir> | tee check.out``), else left as ``?``.

Usage:
    python tools/ledger.py [--local check.out] > ledger.md
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def round_files() -> list[tuple[str, dict]]:
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        tag = re.search(r"CORRECTNESS_(r\d+)", path).group(1)
        with open(path) as f:
            out.append((tag, json.load(f)))
    return out


def verdict(entry: dict) -> str:
    if entry.get("hash_match"):
        return "P"
    if entry.get("err") == "no_oracle":
        return "R"
    return "E"


def local_verdicts(path: str) -> dict[str, str]:
    got = {}
    for line in open(path):
        m = re.match(r"(PASS|FAIL|ok|ERR)\s+(\w+):", line.strip())
        if m:
            got[m.group(2)] = {"PASS": "P", "ok": "R", "FAIL": "E", "ERR": "E"}[m.group(1)]
    return got


def main() -> int:
    local_path = None
    args = sys.argv[1:]
    if "--local" in args:
        local_path = args[args.index("--local") + 1]

    import __spark_entry__ as entry

    registered = list(entry.queries().keys())
    rounds = round_files()
    local = local_verdicts(local_path) if local_path else {}

    tags = [t for t, _ in rounds]
    print("| query | " + " | ".join(tags) + " | driver | local |")
    print("|" + "---|" * (len(tags) + 3))
    never_graded = []
    for q in registered:
        cells = []
        ever = "-"
        for _, data in rounds:
            if q in data:
                v = verdict(data[q])
                cells.append(v)
                if v in ("P", "R") and ever != "P":
                    ever = v
                elif v == "E" and ever == "-":
                    ever = "E"
            else:
                cells.append("-")
        if ever == "-":
            never_graded.append(q)
        loc = local.get(q, "?")
        print(f"| {q} | " + " | ".join(cells) + f" | {ever} | {loc} |")

    graded = len(registered) - len(never_graded)
    print()
    print(
        f"**{len(registered)} registered; {graded} driver-graded at least once "
        f"across {', '.join(tags)}; {len(never_graded)} never driver-graded:** "
        + (", ".join(f"`{q}`" for q in never_graded) if never_graded else "none")
    )
    # queries that appear in driver files but are no longer registered
    seen = set()
    for _, data in rounds:
        seen.update(data.keys())
    stale = sorted(seen - set(registered))
    if stale:
        print(f"\nDriver-file names no longer registered: {', '.join(stale)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
