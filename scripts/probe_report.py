#!/usr/bin/env python
"""Parse the probe_sf10.sh logs into the SCALE.md ratio table.

Reads scale_artifacts/probe_sf1_matched.log and
scale_artifacts/probe_sf10.log, extracts each query's wall
(driver_sim's ``name: ... [NN.Ns]`` line) and rows, and prints a
markdown table with the sf10/sf1 ratio.
"""

from __future__ import annotations

import re
import sys

LINE = re.compile(
    r"^\s*(\w+): (?:OK rows=(\d+)|rows-only, (\d+) rows) \[([0-9.]+)s\]"
)


def parse(path: str) -> dict[str, tuple[int, float]]:
    out: dict[str, tuple[int, float]] = {}
    with open(path) as fh:
        for raw in fh:
            for line in raw.split("\r"):
                m = LINE.match(line)
                if m:
                    rows = int(m.group(2) or m.group(3))
                    out[m.group(1)] = (rows, float(m.group(4)))
    return out


def main() -> int:
    sf1 = parse("scale_artifacts/probe_sf1_matched.log")
    sf10 = parse("scale_artifacts/probe_sf10.log")
    print("| query | sf1 rows | sf1 s | sf10 rows | sf10 s | wall ratio |")
    print("|---|---|---|---|---|---|")
    for q in sf1:
        r1, t1 = sf1[q]
        if q in sf10:
            r10, t10 = sf10[q]
            print(f"| {q} | {r1:,} | {t1:.1f} | {r10:,} | {t10:.1f} | {t10 / t1:.1f}x |")
        else:
            print(f"| {q} | {r1:,} | {t1:.1f} | — | — | — |")
    missing = [q for q in sf10 if q not in sf1]
    if missing:
        print(f"\nsf10-only (no sf1 row): {missing}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
