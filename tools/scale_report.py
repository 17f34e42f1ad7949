"""Per-query scale-factor report from two tools/check.py sweep logs.

Joins the per-query wall times of a baseline sweep (e.g. sf0.1) and a
scale sweep (e.g. sf1 from tools/gen_scaledata.py), prints the worst
scale factors and totals — the evidence behind BASELINE.md's "sf1
sweep" paragraph.  A PASS at 10x data with a <=10x time ratio means the
plan scaled no worse than linearly on this box; ratios far above the
data ratio name the queries whose plans need a second look before a
real 100x run.

Usage: python tools/scale_report.py <base_sweep.out> <scale_sweep.out> [data_ratio]
"""

from __future__ import annotations

import re
import sys


def parse(path: str) -> dict[str, tuple[str, float, int]]:
    """name -> (verdict, seconds, rows); tolerates \\r progress noise."""
    out = {}
    # PASS/ok lines: "... rows=N ... [12.34s]"; oracle-failure lines:
    # "FAIL q: duckdb error: ... [spark side OK: 12.34s rows=N]"
    pat = re.compile(r"(PASS|ok)\s+(\w+):.*?rows=(\d+).*?\[([0-9.]+)s")
    pat_fail = re.compile(
        r"FAIL\s+(\w+):.*?\[spark side OK: ([0-9.]+)s rows=(\d+)\]"
    )
    for raw in open(path, errors="replace"):
        for line in raw.replace("\r", "\n").splitlines():
            m = pat.search(line)
            if m:
                v, name, rows, sec = m.groups()
                out[name] = (v, float(sec), int(rows))
                continue
            m = pat_fail.search(line)
            if m:
                name, sec, rows = m.groups()
                out[name] = ("FAIL(oracle)", float(sec), int(rows))
    return out


def main() -> int:
    base_path, scale_path = sys.argv[1], sys.argv[2]
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    base, scale = parse(base_path), parse(scale_path)
    common = sorted(set(base) & set(scale))
    rows = []
    for q in common:
        bv, bs, _ = base[q]
        sv, ss, srows = scale[q]
        ratio = ss / bs if bs > 0 else float("inf")
        rows.append((ratio, q, bs, ss, sv, srows))
    rows.sort(reverse=True)
    print(f"| query | {base_path.split('/')[-1]} s | {scale_path.split('/')[-1]} s | ratio | verdict |")
    print("|---|---|---|---|---|")
    for ratio, q, bs, ss, sv, _ in rows:
        flag = " **> data ratio**" if ratio > data_ratio else ""
        print(f"| {q} | {bs:.2f} | {ss:.2f} | {ratio:.1f}x{flag} | {sv} |")
    tb = sum(r[2] for r in rows)
    ts = sum(r[3] for r in rows)
    over = [r for r in rows if r[0] > data_ratio]
    print(
        f"\n{len(common)} queries compared; totals {tb:.1f}s -> {ts:.1f}s "
        f"({ts / tb:.1f}x on {data_ratio:g}x data); "
        f"{len(over)} queries above the data ratio: "
        + ", ".join(f"`{r[1]}` ({r[0]:.1f}x)" for r in over[:10])
    )
    missing = sorted(set(base) - set(scale))
    if missing:
        print(f"\nIn base but not in scale sweep: {', '.join(missing)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
