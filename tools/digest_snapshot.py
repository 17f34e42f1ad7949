"""Refresh tools/oracle_digests.json — the per-query oracle-SQL digest
snapshot the grading-window ordering compares against (an oracle whose
digest differs from this snapshot re-enters the driver's bounded window,
because its old grade no longer covers the current SQL).

Run as the LAST step of the end-of-round checklist, after the final code
change, so the snapshot reflects the oracles the driver actually grades.

Usage: python tools/digest_snapshot.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from mistocksync_spark.plans.queries import ORACLES

    dig = {k: hashlib.sha256(v.encode()).hexdigest()[:16] for k, v in ORACLES.items()}
    path = os.path.join(REPO, "tools", "oracle_digests.json")
    with open(path, "w") as f:
        json.dump(dig, f, indent=0, sort_keys=True)
    print(f"{len(dig)} oracle digests -> {path}")


if __name__ == "__main__":
    main()
