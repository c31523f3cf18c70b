#!/usr/bin/env python3
"""Merge `graft.Probe all` output and `time_oracle.py` output into the
BASELINE.md appendix markdown table.

Usage: python3 tools/mk_appendix.py <probe.txt> <duck.tsv>
"""
import re, sys

probe, duck = sys.argv[1], sys.argv[2]
eng = {}
for line in open(probe):
    m = re.search(r"\[probe\] (\S+)\s+best=([0-9.]+)", line)
    if m:
        eng[m.group(1)] = float(m.group(2))
dk = {}
for line in open(duck):
    name, _, t = line.partition("\t")
    if name != "TOTAL" and t.strip():
        dk[name] = float(t)

rows, et, dt = [], 0.0, 0.0
for name in sorted(eng):
    e = eng[name]
    d = dk.get(name)
    et += e
    if d is not None:
        dt += d
        ratio = f"{e/d:.1f}×" if d > 0 and e / d >= 1 else (f"**{e/d:.2f}×**" if d > 0 else "—")
        rows.append(f"| {name} | {e:.3f} | {d:.3f} | {ratio} |")
    else:
        rows.append(f"| {name} | {e:.3f} | — | — |")
print(f"engine total {et:.1f} s vs DuckDB {dt:.1f} s over {len(dk)} oracle queries")
print("| query | engine s | duckdb s | ratio |")
print("|---|---|---|---|")
print("\n".join(rows))
