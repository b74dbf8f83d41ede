#!/usr/bin/env python3
"""Maintain tools/bench_history.json — the pinned per-query warm-median
history graft.Bench compares against for its drift verdict.

Reads every BENCH_r*.json driver artifact in the repo root, extracts the
compact {"metric":"total",...} line from each round's captured tail, and
writes {"rounds": {"<n>": {"<query>": sec, ...}}}. Run after each round
lands a new artifact; commit the diff.
"""
import glob
import json
import os
import re
import sys

root = os.path.join(os.path.dirname(__file__), "..")
rounds = {}
for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
    n = re.search(r"BENCH_r0*(\d+)\.json", path).group(1)
    art = json.load(open(path))
    tail = art.get("tail") or ""
    # the compact line is the LAST {"metric":"total",...} object in the tail
    best = None
    for m in re.finditer(r'\{"metric":"total".*?\}\}', tail):
        best = m.group(0)
    if best is None:
        continue
    try:
        line = json.loads(best)
    except json.JSONDecodeError:
        continue
    qs = line.get("queries")
    if isinstance(qs, dict) and qs:
        rounds[n] = qs
out = os.path.join(root, "tools", "bench_history.json")
json.dump({"rounds": rounds}, open(out, "w"), indent=0, sort_keys=True)
print(f"wrote {out}: rounds {sorted(rounds, key=int)}")
