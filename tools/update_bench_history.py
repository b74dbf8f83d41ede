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
    qs = None
    if best is not None:
        try:
            qs = json.loads(best).get("queries")
        except json.JSONDecodeError:
            pass
    if qs is None:
        # The driver keeps only the last ~2000 chars of output, which can cut
        # off the {"metric":"total" prefix. The queries map is flat (no nested
        # objects), so the LAST '"queries":{...}' block parses on its own.
        last = None
        for m in re.finditer(r'"queries":(\{[^{}]*\})', tail):
            last = m.group(1)
        if last is not None:
            try:
                qs = json.loads(last)
            except json.JSONDecodeError:
                pass
    if isinstance(qs, dict) and qs:
        rounds[n] = qs
out = os.path.join(root, "tools", "bench_history.json")
json.dump({"rounds": rounds}, open(out, "w"), indent=0, sort_keys=True)
print(f"wrote {out}: rounds {sorted(rounds, key=int)}")
