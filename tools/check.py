#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares row sets exactly (column-name-sorted, row-sorted).
Dev tool only — not part of the shipped library.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    names = sorted(x.split("/")[-1] for x in glob.glob(f"{outdir}/*") if not x.endswith(".json"))
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); fails += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "FAIL (0 rows)"
            if len(got) == 0: fails += 1
            print(f"{status} {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); fails += 1; continue
        if [str(t) for t in g.dtypes] != [str(t) for t in e.dtypes]:
            print(f"WARN {name}: dtypes {list(map(str, g.dtypes))} vs {list(map(str, e.dtypes))}")
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"OK   {name}: {len(g)} rows")
        except AssertionError as ex:
            msg = str(ex).splitlines()
            print(f"FAIL {name}: {' | '.join(msg[:4])}")
            fails += 1
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
