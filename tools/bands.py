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
                    # contiguous contract: position i is query i+1
                    q = {j // 2 + 1: int(q[j:j + 2], 36)
                         for j in range(0, len(q), 2)}
                elif isinstance(q, dict):
                    # the non-contiguous dict fallback carries SECONDS
                    # KEYED BY QUERY NUMBER — keep those keys verbatim
                    # (re-keying positionally would mis-attribute every
                    # band after the first gap)
                    q = {int(k): round(v * 10) for k, v in q.items()}
                runs.append(q)
                break
        else:
            raise SystemExit(f"no main line in {p}")
    common = set.intersection(*(set(r) for r in runs))
    if any(set(r) != common for r in runs):
        print(f"WARNING: run query sets differ; using the "
              f"{len(common)}-query intersection", file=sys.stderr)
    lo, up = {}, {}
    for k in sorted(common):
        vals = sorted(r[k] for r in runs)
        lo[k] = vals[0]
        up[k] = max(2, int(statistics.median(vals)))
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
