#!/usr/bin/env python
"""Render tools/scale_r14.jsonl as the BASELINE.md scale-curve markdown table."""
import json
import sys
from collections import defaultdict

recs = [json.loads(line) for line in open(sys.argv[1])]
by = defaultdict(dict)
for r in recs:
    tag = r["sf_dir"].rstrip("/").rsplit("_sf", 1)[-1].replace("_twin", "")
    by[r["op"]][tag] = r

print("| Operator | sf0.01 wall / shuffle / rows | sf0.1 wall / shuffle / rows | sf1 wall / shuffle / rows | growth sf0.1->sf1 (wall, shuffle) vs output |")
print("|---|---|---|---|---|")
for op, pts in by.items():
    def cell(t):
        r = pts.get(t)
        if not r:
            return "-"
        return f"{r['wall_sec']:.2f} s / {r['shuffle_mb']:.1f} MB / {r['rows']:,}"
    g = ""
    if "0.1" in pts and "1" in pts:
        a, b = pts["0.1"], pts["1"]
        wg = b["wall_sec"] / a["wall_sec"]
        sg = (b["shuffle_mb"] / a["shuffle_mb"]) if a["shuffle_mb"] else float("nan")
        og = b["rows"] / a["rows"] if a["rows"] else float("nan")
        g = f"wall x{wg:.1f}, shuffle x{sg:.1f} vs output x{og:.1f}"
    print(f"| `{op}` | {cell('0.01')} | {cell('0.1')} | {cell('1')} | {g} |")
