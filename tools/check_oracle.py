#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing oracle_sql.json on the same testdata tables, then
compare sorted rows / sorted-by-name columns exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing/unreadable: {e}")
            n_bad += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(exp_cols)} spark={sorted(got_cols)}")
            n_bad += 1
            continue
        eperm = [exp_cols.index(c) for c in sorted(exp_cols)]
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        e_sorted = sorted(tuple(canon(r[i]) for i in eperm) for r in exp_rows)
        g_sorted = sorted(tuple(canon(r[i]) for i in gperm) for r in got_rows)
        if e_sorted != g_sorted:
            n_bad += 1
            print(f"FAIL {name}: rows differ (oracle {len(e_sorted)}, spark {len(g_sorted)})")
            diffs = [(a, b) for a, b in zip(e_sorted, g_sorted) if a != b]
            for a, b in diffs[:3]:
                print(f"   oracle: {a}\n   spark : {b}")
            if len(e_sorted) != len(g_sorted):
                eset, gset = set(e_sorted), set(g_sorted)
                for r in list(eset - gset)[:2]:
                    print(f"   only-oracle: {r}")
                for r in list(gset - eset)[:2]:
                    print(f"   only-spark : {r}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(e_sorted)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
