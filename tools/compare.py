#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads the parquet dumps Verify wrote to OUTDIR, runs each oracle SQL from
OUTDIR/oracle_sql.json in DuckDB against the SFDIR testdata tables, and
compares column-by-column (columns sorted by name, values hashed row-wise).

Usage: python3 tools/compare.py SFDIR OUTDIR
"""
import sys, os, json, glob
import duckdb

def canon(rows, cols):
    # columns sorted by name; rows as-is (queries carry a total ORDER BY)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, float):
        return ('f', v.hex())
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        res_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_bad += 1; continue
        try:
            o = con.execute(oracle[name])
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        oc, orows2 = canon(orows, ocols)
        sc, srows2 = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}"); n_bad += 1; continue
        if len(orows2) != len(srows2):
            print(f"FAIL {name}: rowcount spark={len(srows2)} oracle={len(orows2)}"); n_bad += 1; continue
        if orows2 != srows2:
            bad = next(i for i, (a, b) in enumerate(zip(srows2, orows2)) if a != b)
            print(f"FAIL {name}: first mismatch at row {bad}:")
            print(f"  cols   {oc}")
            print(f"  spark  {srows2[bad]}")
            print(f"  oracle {orows2[bad]}")
            n_bad += 1; continue
        print(f"OK   {name}: {len(srows2)} rows")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
