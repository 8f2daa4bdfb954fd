#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads the parquet dumps Verify wrote to OUTDIR, runs each oracle SQL from
OUTDIR/oracle_sql.json in DuckDB against the SFDIR testdata tables, and
compares the two sides THE WAY THE DRIVER DOES: both are materialized as
pandas DataFrames (DuckDB `.df()` for the oracle, `pandas.read_parquet` for
the Spark result), columns sorted by name, and cells compared with their
pandas dtype attached. This is dtype-sensitive on purpose — DuckDB quirks
like windowed SUM(BIGINT) → HUGEINT → pandas float64 must FAIL here, because
they fail the driver's hash even when the numeric values agree.

Usage: python3 tools/compare.py SFDIR OUTDIR
"""
import sys, os, json, glob
import duckdb
import numpy as np
import pandas as pd

def cell(v):
    # Tag every value with a dtype-class so int64(0) != float64(0.0), the way
    # the driver's pandas-based row hash distinguishes them. Floats compare
    # bitwise via hex; NaN/None normalize to a single null token.
    if v is None or (isinstance(v, float) and v != v):
        return ('null',)
    if isinstance(v, (np.floating, float)):
        return ('f', float(v).hex())
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ('i', int(v))
    if isinstance(v, (np.bool_, bool)):
        return ('b', bool(v))
    if isinstance(v, (np.ndarray, list, tuple)):
        # The driver's hash cannot handle array cells at all — treat as a
        # gate error so the query gets scalarized (concat_ws / array_to_string).
        raise TypeError("array-typed output column — scalarize for the gate")
    return ('s', str(v))

def canon(df):
    df = df[sorted(df.columns)]
    rows = [tuple(cell(v) for v in r)
            for r in df.itertuples(index=False, name=None)]
    return list(df.columns), [str(t) for t in df.dtypes], rows

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
        files = sorted(glob.glob(os.path.join(res_dir, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_bad += 1; continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            oc, odt, orows = canon(odf)
            sc, sdt, srows = canon(sdf)
        except TypeError as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if oc != sc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}"); n_bad += 1; continue
        if odt != sdt:
            print(f"FAIL {name}: dtype drift (driver hash WILL differ):")
            for c, a, b in zip(oc, sdt, odt):
                if a != b:
                    print(f"  {c}: spark={a} oracle={b}")
            n_bad += 1; continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}"); n_bad += 1; continue
        if orows != srows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL {name}: first mismatch at row {bad}:")
            print(f"  cols   {oc}")
            print(f"  spark  {srows[bad]}")
            print(f"  oracle {orows[bad]}")
            n_bad += 1; continue
        print(f"OK   {name}: {len(srows)} rows")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
