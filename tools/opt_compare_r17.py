#!/usr/bin/env python3
"""Optimization round 17: per-query before/after comparison.

Usage: python3 tools/opt_compare_r17.py <after.json|log>

BEFORE = bench_runs_r17opt/before_sf01.json (fresh HEAD-of-round run)
with bench_runs_r17/bench_sf01_closing2.json (calmer round-17 closing
run, same code) as the noise cross-check: a query only counts as
moved when both before-sources agree with the direction.
"""
import json, re, sys
from collections import defaultdict


def load(p):
    raw = open(p).read()
    m = re.search(r'\{"metric".*\}', raw)
    return json.loads(m.group(0))


after = load(sys.argv[1])
before = load('bench_runs_r17opt/before_sf01.json')
closing = load('bench_runs_r17/bench_sf01_closing2.json')

aq, bq, cq = after['queries'], before['queries'], closing['queries']
common = sorted(set(aq) & set(bq) & set(cq))
print(f"AFTER  total={after['value']:.1f}s baseline62={after['baseline62']:.2f} failed={after['failed']}")
print(f"BEFORE total={before['value']:.1f}s baseline62={before['baseline62']:.2f}")
print(f"CLOSING(r17 build) total={closing['value']:.1f}s baseline62={closing['baseline62']:.2f}")
sa, sb, sc = (sum(q[k] for k in common) for q in (aq, bq, cq))
print(f"common({len(common)}): after {sa:.1f} vs before {sb:.1f} ({sa/sb:.3f}x) vs closing {sc:.1f} ({sa/sc:.3f}x)")


def fam(k):
    if re.search(r'stream|q245|q25[0-9]|q26[0-9]|q27[4-6]|q28[29]|q30[3-8]', k):
        return 'streaming'
    if re.match(r'q(35[08]|36[0-9]|37[01])_', k):
        return 'sql-ddl/cdc gates'
    if 'tpch' in k:
        return 'tpch'
    if 'tpcds' in k:
        return 'tpcds'
    return 'batch-other'


f = defaultdict(lambda: [0.0, 0.0, 0.0, 0])
for k in common:
    e = f[fam(k)]
    e[0] += aq[k]; e[1] += bq[k]; e[2] += cq[k]; e[3] += 1
print("\nfamily: after / before / closing (n)")
for k in sorted(f):
    a, b, c, n = f[k]
    print(f"  {k:18s} {a:7.1f} / {b:7.1f} / {c:7.1f}  (n={n})")

print("\ntop improvements vs min(before, closing):")
rows = [(aq[k] - min(bq[k], cq[k]), k) for k in common]
for d, k in sorted(rows)[:25]:
    print(f"  {min(bq[k], cq[k]):6.2f} -> {aq[k]:6.2f} ({d:+.2f})  {k}")
print("\nregressions vs MAX(before, closing) (noise-robust):")
regs = [(aq[k] - max(bq[k], cq[k]), k) for k in common if aq[k] > max(bq[k], cq[k]) + 0.3]
for d, k in sorted(regs, reverse=True)[:15]:
    print(f"  {max(bq[k], cq[k]):6.2f} -> {aq[k]:6.2f} ({d:+.2f})  {k}")
