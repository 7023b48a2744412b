#!/usr/bin/env python3
"""Fingerprint the driver's hash semantics.

Implements several candidate compare/hash functions over
(spark parquet dump, DuckDB oracle result) and reports, per candidate,
which queries mismatch. The candidate whose failure set equals the
round-3 driver set {q01,q03,q04,q05,q08,q16,q17,q18,q20,q21,q25,q27,
q30,q32,q56,q62,q63,q71,q72,q73,q74,q83} is (behaviorally) the
driver's algorithm.

Usage: python3 tools/hash_probe.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

R3_FAIL = {"q01_tpch1","q03_rollup","q04_cube","q05_grouping_sets",
           "q08_join_left","q16_running_sum","q17_leadlag","q18_range_frame",
           "q20_first_last","q21_toplimit","q25_tumble","q27_session",
           "q30_json_props","q32_scalar_math","q56_count_tumble",
           "q62_tpch18","q63_decimal","q71_tpch9","q72_tpch10","q73_tpch11",
           "q74_tpch12","q83_tpch22"}


def h_fetchall_str(rows, cols):
    """sorted(column-name) projection, rows sorted, str() every value."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(str(r[i]) for i in idx) for r in rows)
    return hashlib.md5(repr(data).encode()).hexdigest()


def h_fetchall_repr(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(repr(r[i]) for i in idx) for r in rows)
    return hashlib.md5(repr(data).encode()).hexdigest()


def h_float_str(rows, cols):
    """numerics coerced through float() before str()."""
    import decimal
    def f(v):
        if isinstance(v, (int, float, decimal.Decimal)) and not isinstance(v, bool):
            return str(float(v))
        return str(v)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(f(r[i]) for i in idx) for r in rows)
    return hashlib.md5(repr(data).encode()).hexdigest()


def h_pandas(df):
    """pandas path: sort columns by name, sort rows, to_csv, md5."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def h_pandas_astype_str(df):
    df = df[sorted(df.columns)].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    cands = {}  # name -> set of failing queries
    for c in ["fetchall_str", "fetchall_repr", "float_str", "pandas",
              "pandas_astype_str"]:
        cands[c] = set()
    checked = []
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            continue
        try:
            ours_rel = con.execute(
                f"SELECT * FROM read_parquet({files!r})")
            ours_rows = ours_rel.fetchall()
            ours_cols = [d[0] for d in ours_rel.description]
            orc_rel = con.execute(sql)
            orc_rows = orc_rel.fetchall()
            orc_cols = [d[0] for d in orc_rel.description]
        except Exception as e:
            print(f"ERR {name}: {e}")
            continue
        checked.append(name)
        for fn, key in [(h_fetchall_str, "fetchall_str"),
                        (h_fetchall_repr, "fetchall_repr"),
                        (h_float_str, "float_str")]:
            if fn(ours_rows, ours_cols) != fn(orc_rows, orc_cols):
                cands[key].add(name)
        try:
            odf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            qdf = con.execute(sql).df()
            if h_pandas(odf) != h_pandas(qdf):
                cands["pandas"].add(name)
            if h_pandas_astype_str(odf) != h_pandas_astype_str(qdf):
                cands["pandas_astype_str"].add(name)
        except Exception as e:
            cands["pandas"].add(name)
            cands["pandas_astype_str"].add(name)
    print(f"checked {len(checked)} queries")
    for c, fails in cands.items():
        extra = sorted(fails - R3_FAIL)
        missing = sorted(R3_FAIL - fails)
        mark = "<<< EXACT MATCH" if not extra and not missing else ""
        print(f"\n{c}: {len(fails)} fails {mark}")
        print(f"  fails-not-in-r3: {extra}")
        print(f"  r3-not-failing:  {missing}")


if __name__ == "__main__":
    main()
