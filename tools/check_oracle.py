#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing oracle_sql.json on the same testdata tables, then
compare sorted rows / sorted-by-name columns exactly.

Beyond the row compare, enforces oracle rule 2 (type-width parity) at the
ARROW level: DuckDB coerces e.g. integer sum() to HUGEINT -> decimal128(38,0)
while Spark emits int64; Python fetchall() hides that (both coerce to int),
but any typed canonicalization (Arrow, parquet round-trip — the driver's)
hashes them differently. The r11 d60 red row was exactly this class.

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

def canon_type(t):
    """Canonical kind/width string for a pyarrow DataType.

    Width-bearing kinds (ints, floats, decimals, timestamps) keep their
    width — a mismatch there is a rule-2 violation. Storage-flavor
    variants that carry identical values (string vs large_string, list
    vs large_list) canonicalize together.
    """
    import pyarrow as pa
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{canon_type(t.field(i).type)}"
                         for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)},{canon_type(t.item_type)}>"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]" + (f"[tz={t.tz}]" if t.tz else "")
    return str(t)  # int8..int64, float/double, bool, date32, ...

def schema_mismatches(exp_tbl, got_tbl):
    """Name-sorted column-by-column canonical-type compare. Returns a list
    of (col, oracle_type, spark_type) mismatches."""
    e = {f.name: canon_type(f.type) for f in exp_tbl.schema}
    g = {f.name: canon_type(f.type) for f in got_tbl.schema}
    return [(c, e[c], g[c]) for c in sorted(e) if c in g and e[c] != g[c]]

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
            exp_tbl = con.execute(sql).arrow()
            exp_cols = exp_tbl.schema.names
            exp_rows = [tuple(r) for r in zip(*(exp_tbl.column(c).to_pylist()
                                                for c in exp_cols))] if exp_cols else []
            if not exp_rows and exp_tbl.num_rows:
                exp_rows = [()] * exp_tbl.num_rows
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_tbl = got.arrow()
            got_cols = got_tbl.schema.names
            got_rows = [tuple(r) for r in zip(*(got_tbl.column(c).to_pylist()
                                                for c in got_cols))] if got_cols else []
            if not got_rows and got_tbl.num_rows:
                got_rows = [()] * got_tbl.num_rows
        except Exception as e:
            print(f"FAIL {name}: spark result missing/unreadable: {e}")
            n_bad += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(exp_cols)} spark={sorted(got_cols)}")
            n_bad += 1
            continue
        mism = schema_mismatches(exp_tbl, got_tbl)
        if mism:
            n_bad += 1
            print(f"FAIL {name}: type-width mismatch (oracle rule 2):")
            for c, et, gt in mism:
                print(f"   {c}: oracle={et} spark={gt}")
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
