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


SMALL_SF = 0.01
# Fixed per-job overhead floor: below this an sf0.01 time measures Spark
# scheduling, not the operator, and the ratio would be meaningless.
SMALL_FLOOR = 0.05
# 10x data -> linear queries land near 10; 30 allows 3x constant-factor
# slack (partition-count effects, broadcast thresholds) before a query
# is flagged super-linear.
SCALING_OUTLIER = 30.0


def main():
    paths = sys.argv[1:] or sorted(glob.glob("BENCH_r*.json"))
    best = {}
    small = {}
    sf = None
    used = 0
    used_small = 0
    current = set()  # query names in the widest run = the live suite
    for p in paths:
        qs, run_sf = extract(p)
        if not qs:
            continue
        if len(qs) > len(current):
            current = set(qs)
        if run_sf == SMALL_SF:
            # small-sf runs feed the scaling denominator, not the band
            used_small += 1
            for q, sec in qs.items():
                small[q] = min(small.get(q, float("inf")), sec)
            continue
        if sf is None:
            sf = run_sf
        if run_sf is not None and run_sf != sf:
            continue  # only merge runs at the same scale factor
        used += 1
        for q, sec in qs.items():
            best[q] = min(best.get(q, float("inf")), sec)
    # Queries get renamed/renumbered across rounds; mins from old runs
    # under dead names would otherwise haunt the band forever. The run
    # with the widest coverage is the current full suite — keep only its
    # names.
    best = {q: s for q, s in best.items() if q in current}
    small = {q: s for q, s in small.items() if q in current}
    # sf0.01 -> sf0.1 scaling ratio per query: the cheap local proxy for
    # the 100x question. ratio >> 10 on a calm host = super-linear.
    scaling = {}
    for q, sec in sorted(best.items()):
        if q in small:
            scaling[q] = round(sec / max(small[q], SMALL_FLOOR), 2)
    out = {"sf": sf, "runs": used,
           "queries": {q: round(s, 3) for q, s in sorted(best.items())}}
    if scaling:
        out["small_sf"] = SMALL_SF
        out["runs_small"] = used_small
        out["queries_small"] = {q: round(s, 3) for q, s in sorted(small.items())}
        out["scaling"] = scaling
    with open("BASELINE_QUERIES.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"BASELINE_QUERIES.json: {len(best)} queries from {used} runs "
          f"at sf={sf}; scaling ratios for {len(scaling)} queries from "
          f"{used_small} sf={SMALL_SF} runs")
    outliers = {q: r for q, r in scaling.items() if r > SCALING_OUTLIER}
    for q, r in sorted(outliers.items(), key=lambda kv: -kv[1]):
        print(f"SCALING OUTLIER {q}: {r}x for 10x data "
              f"({small[q]}s -> {best[q]}s)")


if __name__ == "__main__":
    main()
