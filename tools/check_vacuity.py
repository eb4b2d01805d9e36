#!/usr/bin/env python3
"""Vacuity sweep over a graft.Verify dump: a query can be oracle-GREEN and
still assert nothing (the d49 lesson — both engines agree on a degenerate
empty result). Flags results that are suspicious on their face:

  - 0 rows total
  - a column that is entirely NULL
  - phase-style rows (phase/n columns) with n == 0

Run after `runMain graft.Verify <sfdir> <outdir>`:

    python3 tools/check_vacuity.py /tmp/verify_out

Findings are leads, not failures — a 0-count phase can be the point of the
query (e.g. an empty-intersection proof). Each flagged row needs a human
verdict; fix the constant or add an in-query `require` so the gate cannot
die silently (v01, q67 'range'/'v1', and the 1995-01-01 empty-target class
were all found by this sweep in round 10).
"""
import duckdb, os, glob, sys

def main(out: str) -> int:
    con = duckdb.connect()
    sus = []
    for d in sorted(os.listdir(out)):
        p = os.path.join(out, d)
        if not os.path.isdir(p) or not glob.glob(p + "/*.parquet"):
            continue
        try:
            df = con.execute(f"SELECT * FROM '{p}/*.parquet'").fetchdf()
        except Exception as e:
            sus.append((d, f"unreadable: {str(e)[:80]}"))
            continue
        if len(df) == 0:
            sus.append((d, "0 rows"))
            continue
        for c in df.columns:
            if df[c].isna().all():
                sus.append((d, f"column '{c}' entirely NULL"))
        if "n" in df.columns and "phase" in df.columns:
            for _, r in df[df["n"] == 0].iterrows():
                sus.append((d, f"phase '{r['phase']}' has n=0"))
    for name, why in sus:
        print(f"SUSPECT {name}: {why}")
    print(f"== {len(sus)} suspicious result(s) ==")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"))
