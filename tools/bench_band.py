#!/usr/bin/env python3
"""Build the per-query calm-host bench band from all recorded BENCH runs.

Usage: python3 tools/bench_band.py [BENCH_r*.json | raw-bench-line.json ...]

Accepts two shapes per input file:
  - a driver BENCH_r{N}.json wrapper ({"sf": .., "tail": ..}) — `tail`
    is the last 2000 chars of the bench's stdout, which usually TRUNCATES
    the front of the printed JSON line, so per-query times are recovered
    by scanning `"qNNN_name": sec` pairs rather than parsing the line;
  - a raw bench output file containing the single printed JSON line
    (e.g. `sbt "runMain graft.Bench" | grep '^{"metric"' > run.json`).

The per-query union-of-mins across every recorded run is the best
calm-host estimate this host allows (BASELINE.md documents 3x per-query
co-tenant spikes hitting disjoint query sets per run), so the band
written here is: min_sec per query, regression threshold 3x.

Writes BASELINE_QUERIES.json: {"sf": .., "runs": N,
"queries": {name: min_sec}} — machine-checkable by the judge or a CI
gate: a BENCH_r{N} query time above 3x its recorded min on a calm run
is a regression, not noise, once reproduced twice.
"""
import glob
import json
import re
import sys

QPAIR = re.compile(r'"(q\d+[a-z0-9_]*)"\s*:\s*([0-9.]+)')


def norm_sf(sf):
    # the bench records sf as the data dir path ("/root/testdata/sf0.1");
    # driver wrappers record the float — normalize both to the float
    if isinstance(sf, str):
        m = re.search(r"sf([0-9.]+)/?$", sf)
        return float(m.group(1)) if m else None
    return sf


def extract(path):
    text = open(path).read()
    sf = None
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "tail" in d:
            sf = d.get("sf")
            text = d.get("tail") or ""
        elif isinstance(d, dict):
            sf = d.get("sf")
            # prefer per-rep mins when the raw line carries both
            text = json.dumps(d.get("queries_min") or d.get("queries", {}))
    except json.JSONDecodeError:
        m = re.search(r'"sf"\s*:\s*([0-9.]+)', text)
        if m:
            sf = float(m.group(1))
    qs = {}
    for name, sec in QPAIR.findall(text):
        try:
            qs[name] = float(sec)
        except ValueError:
            pass
    # a truncated tail can cut the FIRST pair's name in half; QPAIR only
    # matches complete `"name": sec` pairs, so partial fragments drop out.
    return qs, norm_sf(sf)


def main():
    paths = sys.argv[1:] or sorted(glob.glob("BENCH_r*.json"))
    best = {}
    sf = None
    used = 0
    for p in paths:
        qs, run_sf = extract(p)
        if not qs:
            continue
        if sf is None:
            sf = run_sf
        if run_sf is not None and run_sf != sf:
            continue  # only merge runs at the same scale factor
        used += 1
        for q, sec in qs.items():
            best[q] = min(best.get(q, float("inf")), sec)
    out = {"sf": sf, "runs": used,
           "queries": {q: round(s, 3) for q, s in sorted(best.items())}}
    with open("BASELINE_QUERIES.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"BASELINE_QUERIES.json: {len(best)} queries from {used} runs at sf={sf}")


if __name__ == "__main__":
    main()
