#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables as
DuckDB views, and for every query compares our parquet dump with the oracle
result: row count, column-name set, and sorted-row values (exact, then
1e-9-relative float fallback that reports which columns drift).
"""
import sys, os, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def approx_eq(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, (int, float)):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    try:
        import decimal
        if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
            return abs(float(a) - float(b)) <= 1e-9 * max(1.0, abs(float(a)))
    except Exception:
        pass
    return False


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
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            ours = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            our_cols = [d[0] for d in con.description]
            theirs = con.execute(sql).fetchall()
            their_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(our_cols) != sorted(their_cols):
            print(f"FAIL {name}: columns ours={sorted(our_cols)} oracle={sorted(their_cols)}")
            n_fail += 1
            continue
        # align column order by name, then sort rows
        oi = [our_cols.index(c) for c in sorted(our_cols)]
        ti = [their_cols.index(c) for c in sorted(their_cols)]
        a = sorted([tuple(norm(r[i]) for i in oi) for r in ours], key=repr)
        b = sorted([tuple(norm(r[i]) for i in ti) for r in theirs], key=repr)
        if len(a) != len(b):
            print(f"FAIL {name}: rows ours={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        if a == b:
            print(f"PASS {name} ({len(a)} rows, exact)")
            n_pass += 1
            continue
        # find first diff
        bad = None
        for i, (ra, rb) in enumerate(zip(a, b)):
            if ra != rb:
                if all(approx_eq(x, y) for x, y in zip(ra, rb)):
                    continue
                bad = (i, ra, rb)
                break
        if bad is None:
            print(f"PASS* {name} ({len(a)} rows, approx-only — RISKY for hash gate)")
            n_pass += 1
        else:
            i, ra, rb = bad
            cols = sorted(our_cols)
            diffs = [(cols[j], x, y) for j, (x, y) in enumerate(zip(ra, rb)) if x != y]
            print(f"FAIL {name}: row {i} differs: {diffs[:4]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
