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

def main(outdir: str, sfdir: str, json_out: str | None = None) -> int:
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        # driver testdata are single files; Spark-written scale-ups are
        # directories of part files — glob those
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    board = {}
    names = sorted(x.split("/")[-1] for x in glob.glob(f"{outdir}/*") if not x.endswith(".json"))
    for name in names:
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        board[name] = rec
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); fails += 1
            rec["err"] = "no output parquet"; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        rec["spark_rows"] = len(got)
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "FAIL (0 rows)"
            if len(got) == 0:
                fails += 1
                rec["err"] = "0 rows (rows-only gate)"
            else:
                # only the rows>0 check actually ran — claiming
                # schema/hash verification would overstate oracle
                # coverage in any board built from this output
                rec.update(rows_match=True, schema_match=False,
                           hash_match=False, rows_only=True, err=None)
            print(f"{status} {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); fails += 1
            rec["err"] = f"oracle error: {e}"; continue
        rec["oracle_rows"] = len(exp)
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); fails += 1
            rec["err"] = "column mismatch"; continue
        rec["schema_match"] = True
        if [str(t) for t in g.dtypes] != [str(t) for t in e.dtypes]:
            print(f"WARN {name}: dtypes {list(map(str, g.dtypes))} vs {list(map(str, e.dtypes))}")
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1
            rec["err"] = "row-count mismatch"; continue
        rec["rows_match"] = True
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"OK   {name}: {len(g)} rows")
            rec["hash_match"] = True
        except AssertionError as ex:
            msg = str(ex).splitlines()
            print(f"FAIL {name}: {' | '.join(msg[:4])}")
            rec["err"] = msg[0] if msg else "value mismatch"
            fails += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(board, f, indent=2)
        print(f"board written: {json_out}")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
