#!/usr/bin/env python3
"""Compare two bench_detail.json-style files: per-query ratio, sorted
by regression. Usage: bench_compare.py OLD NEW [threshold]"""
import json, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
oq, nq = old.get("queries", {}), new.get("queries", {})
rows = []
for name, nv in nq.items():
    sec_n = nv if isinstance(nv, (int, float)) else nv.get("sec")
    ov = oq.get(name)
    sec_o = ov if isinstance(ov, (int, float)) else (ov or {}).get("sec")
    if sec_o and sec_n and sec_o > 0:
        rows.append((sec_n / sec_o, name, sec_o, sec_n))
rows.sort(reverse=True)
regressed = [r for r in rows if r[0] > thresh and r[3] > 0.15]
print(f"comparable: {len(rows)}  new-only: {len(nq) - len(rows)}  "
      f"regressed(>{thresh}x, >0.15s): {len(regressed)}")
for ratio, name, so, sn in rows[:15]:
    flag = " <-- REGRESSED" if (ratio > thresh and sn > 0.15) else ""
    print(f"{ratio:5.2f}x  {name:28s} {so:7.3f} -> {sn:7.3f}{flag}")
tot_o = sum(r[2] for r in rows); tot_n = sum(r[3] for r in rows)
print(f"total over comparable: {tot_o:.2f} -> {tot_n:.2f} ({tot_n/tot_o:.2f}x)")
