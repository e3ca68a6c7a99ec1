"""Flat-vs-grew analysis across scale-sweep artifacts.

Reads two CORRECTNESS-style JSON artifacts (same schema as
scripts/check_oracles.py --json) and prints, per query, the Spark wall
time at each scale and the growth ratio, classified against the data
growth factor: queries whose wall time stays flat (fixed-overhead or
pruned-scan dominated), sublinear, ~linear, and superlinear (the bug
class the sweep exists to flush).

Usage: python scripts/scale_compare.py LOW.json HIGH.json [data_factor]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    low = json.load(open(sys.argv[1]))
    high = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    lq, hq = low["queries"], high["queries"]
    rows = []
    for name in sorted(set(lq) & set(hq)):
        a, b = lq[name].get("spark_sec"), hq[name].get("spark_sec")
        if not a or not b:
            continue
        ratio = b / a
        if ratio < 1.5:
            klass = "flat"
        elif ratio < factor * 0.75:
            klass = "sublinear"
        elif ratio <= factor * 1.5:
            klass = "linear"
        else:
            klass = "SUPERLINEAR"
        rows.append((ratio, name, a, b, klass))
    rows.sort(reverse=True)
    print(f"{'query':28s} {'low_s':>8s} {'high_s':>8s} {'ratio':>7s}  class")
    for ratio, name, a, b, klass in rows:
        print(f"{name:28s} {a:8.2f} {b:8.2f} {ratio:7.2f}  {klass}")
    n_bad = sum(1 for r in rows if r[4] == "SUPERLINEAR")
    counts = {}
    for r in rows:
        counts[r[4]] = counts.get(r[4], 0) + 1
    print(f"\nclasses: {counts}  (data factor {factor}x)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
