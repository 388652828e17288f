#!/usr/bin/env python3
"""Consolidate per-query in-suite bands from N bench artifact lines.

Usage: bands.py bench1.json [bench2.json ...]

Each input file holds one Bench main line (the {"metric":"total",...}
JSON). Emits:
  - a Scala Map literal for graft.Bands.upperDs (upper = MEDIAN of the
    per-pass deciseconds, floored at 2 ds — robust to one contended
    pass, honest about the typical in-suite cost), and
  - a markdown min-median table for SCALE.md.

Query numbers are positions i+1 in the contiguous queries array.
"""
import json
import statistics
import sys


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            txt = f.read()
        # tolerate full bench output: grab the main line
        for line in txt.splitlines():
            line = line.strip()
            if '"metric"' in line:
                line = line[line.index('{'):]
                q = json.loads(line)["queries"]
                if isinstance(q, str):  # 2-char base36 ds per query
                    q = [int(q[j:j + 2], 36) for j in range(0, len(q), 2)]
                elif isinstance(q, dict):
                    # the non-contiguous dict fallback carries SECONDS
                    # keyed by query number — normalize to positional ds
                    q = [round(q[str(k)] * 10)
                         for k in sorted(int(k) for k in q)]
                runs.append(q)
                break
        else:
            raise SystemExit(f"no main line in {p}")
    n = min(len(r) for r in runs)
    if any(len(r) != n for r in runs):
        print(f"WARNING: run lengths differ: {[len(r) for r in runs]}",
              file=sys.stderr)
    lo, up = {}, {}
    for i in range(n):
        vals = sorted(r[i] for r in runs)
        lo[i + 1] = vals[0]
        up[i + 1] = max(2, int(statistics.median(vals)))
    # Scala map literal, wrapped lines
    items = [f"{q} -> {up[q]}" for q in sorted(up)]
    print("  val upperDs: Map[Int, Int] = Map(")
    for j in range(0, len(items), 8):
        sep = "," if j + 8 < len(items) else ")"
        print("    " + ", ".join(items[j:j + 8]) + sep)
    print()
    # markdown table (compact: 4 columns of query/band pairs)
    rows = [f"q{q:03d} {lo[q]/10:.1f}–{up[q]/10:.1f}" for q in sorted(up)]
    print("| " + " | ".join(["band (in-suite, s)"] * 4) + " |")
    print("|" + "---|" * 4)
    for j in range(0, len(rows), 4):
        cells = rows[j:j + 4] + [""] * (4 - len(rows[j:j + 4]))
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1:])
