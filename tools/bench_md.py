#!/usr/bin/env python3
"""Regenerate BENCH.md's query table + headline scaling numbers from a
bench.json line, preserving the hand-written narrative sections.

Usage: python3 tools/bench_md.py <bench.json> [prev_bench.json]

Rewrites, in place:
  - the `| query | sec |` table body under "## Query suite"
  - nothing else (scaling narrative numbers are hand-edited: the estimator
    rationale text changes rarely and reads better written by a human)

Prints, for hand-editing the narrative: total, per-pair scaling table rows,
per-leg minima, efficiency, and (with prev_bench.json) the >= 2x movers the
standing MoverDiag protocol requires.
"""
import json
import re
import sys


def main() -> None:
    cur = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
    prev = None
    if len(sys.argv) > 2:
        prev = json.loads(open(sys.argv[2]).read().strip().splitlines()[-1])

    rows = "".join(
        f"| {q} | {t:.3f} |\n" for q, t in sorted(cur["queries"].items()))
    md = open("BENCH.md").read()
    md = re.sub(
        r"(\| query \| sec \|\n\|---\|---\|\n)(?:\|[^\n]*\|\n)+",
        lambda m: m.group(1) + rows,
        md,
        count=1,
    )
    open("BENCH.md", "w").write(md)

    n = len(cur["queries"])
    print(f"queries: {n}  total: {cur['value']:.1f}s")
    s = cur.get("scaling", {})
    if s:
        for i, p in enumerate(s.get("pairs", []), 1):
            print(f"| {i} | {p['t1']:.2f} | {p['t4']:.2f} | {p['ratio']:.2f} |")
        print(f"min t1 {min(p['t1'] for p in s['pairs']):.2f}  "
              f"min t4 {min(p['t4'] for p in s['pairs']):.2f}  "
              f"min-leg ratio {s['min_leg_ratio']:.3f}  "
              f"efficiency {s['efficiency']:.3f}  "
              f"median-pair {s.get('median_pair_efficiency', 0):.3f}")
        print(f"images/sec: t1 {s['images_per_sec_1']:.1f}  "
              f"t4 {s['images_per_sec_4']:.1f}  t32 {s['images_per_sec_32']:.1f}")
    if prev:
        print("\nmovers >= 2x vs prev (standing MoverDiag protocol):")
        for q in sorted(set(cur["queries"]) & set(prev["queries"])):
            a, b = prev["queries"][q], cur["queries"][q]
            if b >= 2 * a or a >= 2 * b:
                print(f"  {q}: {a:.2f} -> {b:.2f} ({b / a:.2f}x)")


if __name__ == "__main__":
    main()
