#!/usr/bin/env python3
"""Summarize run_scaling.sh output: per-query warm floor (min of
iterations 2..N — excludes per-plan first-compile) per core count, plus
speedup relative to the smallest core count in the file.

usage: tools/scaling_report.py /tmp/scaling_sf0.1.jsonl [more.jsonl ...]
"""
import json
import sys

for path in sys.argv[1:]:
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows.sort(key=lambda r: (r["cores"], r.get("shuffle", r["cores"])))
    qnames = [k for k in rows[0] if k not in ("sf", "cores", "shuffle", "iters")]
    print(f"== {path} (sf={rows[0]['sf']})")
    hdr = "query".ljust(22) + "".join(
        f"c{r['cores']}/p{r.get('shuffle', r['cores'])}".rjust(12) for r in rows)
    print(hdr + "   speedup(first->last)")
    for q in qnames:
        floors = [min(r[q][1:]) if len(r[q]) > 1 else r[q][0] for r in rows]
        sp = floors[0] / floors[-1] if floors[-1] > 0 else float("nan")
        print(q.ljust(22)
              + "".join(f"{f:12.3f}" for f in floors)
              + f"   {sp:6.2f}x")
