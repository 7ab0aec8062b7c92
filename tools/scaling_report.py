#!/usr/bin/env python3
"""Render the SCALING.md per-query table from two Bench JSON lines."""
import json
import re
import sys


def load(path):
    for line in open(path):
        m = re.search(r'\{"metric".*\}', line)
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"no bench JSON in {path}")


def main(base_path, scaled_path):
    base = load(base_path)["queries"]
    scaled = load(scaled_path)["queries"]
    rows = []
    for q in sorted(base):
        if q in scaled and base[q] > 0:
            rows.append((q, base[q], scaled[q], scaled[q] / base[q]))
    rows.sort(key=lambda r: -r[3])
    print("| query | sf0.1 s | x10 s | ratio |")
    print("|---|---|---|---|")
    for q, b, s, r in rows:
        flag = " **superlinear**" if r > 15 else ""
        print(f"| {q} | {b:.2f} | {s:.2f} | {r:.1f}{flag} |")
    tb = sum(base[q] for q, *_ in [(r[0],) for r in rows])
    ts = sum(scaled[r[0]] for r in rows)
    print(f"\ntotals: sf0.1 {tb:.1f} s, x10 {ts:.1f} s, ratio {ts/tb:.1f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
