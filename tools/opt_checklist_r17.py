#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r17.md checklist table: every query with its
family, best-before (min of the two before anchors' per-rep mins),
best-after (min of the after runs' per-rep mins) and disposition."""
import json, re, sys
from collections import defaultdict


def load(p):
    raw = open(p).read()
    m = re.search(r'\{"metric".*\}', raw)
    return json.loads(m.group(0))


after_paths = sys.argv[1:] or ['bench_runs_r17opt/after2_sf01.json',
                               'bench_runs_r17opt/after3_sf01.json']
afts = [load(p) for p in after_paths]
befs = [load('bench_runs_r17opt/before_sf01.json'),
        load('bench_runs_r17/bench_sf01_closing2.json')]

CHANGED = {
    'q37_ngram_jaccard': 'C5 shingles materialized once',
    'q129_dup_clusters': 'C5 (dupClusterComp)',
    'q302_leakage_safe_split': 'C5 (dupClusterComp)',
    'q271_canonical_docs': 'C5 (dupClusterComp)',
    'q247_substring_dedup': 'C5 pos frame',
    'q149_winnow_pairs': 'C5 capped fingerprints',
    'q266_bigram_ppl': 'C5 pairs+perDoc',
    'q249_dsir_weights': 'C5 bg frame',
    'q248_bm25': 'C5 bm25 hits',
    'q298_rrf_fusion': 'C5 bm25 hits',
    'q140_decontaminate': 'C6 digest transport',
}
REVERTED = {'q312_sq8_recall', 'q327_pq_recall', 'q317_ivf_nprobe_sweep',
            'q168_ivf_recall', 'q334_pq_refine', 'q170_band_precision',
            'q137_dup_clusters_lsh'}


def fam(k):
    if re.search(r'stream|q245_|q25[0-9]_|q26[0-9]_|q27[4-6]_|q28[29]_|q30[3-8]_', k):
        return 'streaming gate (C1-C4 harness)'
    if re.match(r'q(35[08]|36[0-9]|37[01])_', k):
        return 'sql-ddl/cdc gate (C1-C4 harness)'
    if 'tpch' in k:
        return 'tpch (left alone)'
    if 'tpcds' in k:
        return 'tpcds (left alone)'
    return 'batch'


qs = set()
for r in afts + befs:
    qs |= set(r['queries_min'])
rows = []
for k in sorted(qs):
    b = min((r['queries_min'][k] for r in befs if k in r['queries_min']), default=None)
    a = min((r['queries_min'][k] for r in afts if k in r['queries_min']), default=None)
    if k in CHANGED:
        disp = CHANGED[k]
    elif k in REVERTED:
        disp = 'tried C5, reverted (measured slower)'
    else:
        f = fam(k)
        disp = f if 'alone' in f or 'harness' in f else 'examined, left alone'
    rows.append((k, b, a, disp))

agg = defaultdict(lambda: [0.0, 0.0, 0])
for k, b, a, disp in rows:
    if b and a:
        key = fam(k)
        agg[key][0] += b
        agg[key][1] += a
        agg[key][2] += 1
print('| family | before (union-of-mins) | after | n |')
print('|---|---|---|---|')
tot_b = tot_a = 0.0
for k in sorted(agg):
    b, a, n = agg[k]
    tot_b += b; tot_a += a
    print(f'| {k} | {b:.1f} s | {a:.1f} s ({a/b:.2f}x) | {n} |')
print(f'| **total** | **{tot_b:.1f} s** | **{tot_a:.1f} s ({tot_a/tot_b:.2f}x)** | |')
print()
print('Changed queries (before → after, union-of-mins):')
for k, b, a, disp in rows:
    if k in CHANGED or k in REVERTED:
        print(f'- {k}: {b:.2f} → {a:.2f} s — {disp}')
