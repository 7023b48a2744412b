#!/usr/bin/env python3
"""Round-17 bench analysis: compare the calm-window sf0.1 run against
the recorded per-query band mins (BASELINE_QUERIES.json) and the
round-16 final run — the verdict's q96/q302/q308 band-watch item."""
import json, sys

cur = json.load(open('/root/repo/bench_runs_r17/run1_sf01.json'))
prev = json.load(open('/root/repo/bench_runs_r16/run1_sf01.json'))
band = json.load(open('/root/repo/BASELINE_QUERIES.json'))['queries']

cq, cmin = cur['queries'], cur.get('queries_min', cur['queries'])
pq = prev['queries']

print(f"total={cur['value']:.1f}s  baseline62={cur['baseline62']:.1f}s "
      f"queries={len(cq)}  failed={cur.get('failed')}")
common = sorted(set(cq) & set(pq))
print(f"common-query sum vs r16: {sum(cq[k] for k in common):.1f} / "
      f"{sum(pq[k] for k in common):.1f} = "
      f"{sum(cq[k] for k in common)/sum(pq[k] for k in common):.3f}x "
      f"({len(common)} queries)")

print("\n-- verdict band-watch (q96/q302/q308): median | per-rep min | band-min | min-ratio")
for name in ('q96_tpcds18', 'q302_leakage_safe_split', 'q308_stream_window_join'):
    bm = band.get(name)
    print(f"{name}: {cq.get(name)} | {cmin.get(name)} | {bm} | "
          f"{(cmin.get(name)/bm):.2f}x" if bm else f"{name}: no band")

print("\n-- >3x band-min exceedances (per-rep min vs band min):")
n = 0
for k in sorted(cq):
    bm = band.get(k)
    if bm and cmin.get(k, 0) > 3 * bm and cmin[k] > 0.5:
        print(f"  {k}: min {cmin[k]:.2f} vs band {bm:.2f} ({cmin[k]/bm:.1f}x)")
        n += 1
print(f"  ({n} total)")

print("\n-- biggest movers vs r16 (|delta| > 1.5s):")
movers = sorted(((cq[k]-pq[k], k) for k in common), key=lambda t: -abs(t[0]))
for d, k in movers[:12]:
    if abs(d) > 1.5:
        print(f"  {k}: {pq[k]:.2f} -> {cq[k]:.2f} ({d:+.2f})")

print("\n-- new-gate costs (q360-q364):")
for k in sorted(cq):
    if k.startswith(('q360', 'q361', 'q362', 'q363', 'q364')):
        print(f"  {k}: {cq[k]:.2f}s")
