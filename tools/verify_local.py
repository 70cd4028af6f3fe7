#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(parquet per query + oracle_sql.json), runs each oracle in DuckDB over the
same test tables, and compares rows/schema/values exactly (columns sorted by
name, rows sorted, exact equality).

Usage: python tools/verify_local.py <sfDir> <verifyOutDir>
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        pq = Path(out_dir) / name
        if not pq.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(pq)
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e).splitlines()[-1] if str(e) else e}")
            # show first few diffs
            neq = (g != w) & ~(g.isna() & w.isna())
            rows = neq.any(axis=1)
            print(pd.concat([g[rows].head(3).add_suffix("_spark"),
                             w[rows].head(3).add_suffix("_duck")], axis=1).to_string())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
