#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(parquet per query + oracle_sql.json), runs each oracle in DuckDB over the
same test tables, and compares rows/schema/values exactly (columns sorted by
name, rows sorted, exact equality).

Type parity (the r4 q_mix_sample lesson): the driver materializes the oracle
through Arrow, where DuckDB's HUGEINT/DECIMAL (e.g. `sum(CASE...)`) surface
as a NON-int64 dtype — float64 or object depending on the duckdb/pyarrow
version — while Spark emits int64; the driver's value hash then sees `8.0`
(or `'8'`) vs `8` and fails even though the values are identical. This
comparator therefore (a) materializes the oracle via .arrow() like the
driver, and (b) asserts column dtypes match the Spark parquet frame EXACTLY
— on the PRE-normalization frames, so two columns that both land on object
dtype for different reasons (HUGEINT vs string) still compare as their real
types before values are stringified for sorting. A local PASS requires int64
to stay int64 — no HUGEINT/DECIMAL leakage into final oracle projections
(wrap integer sums in CAST(... AS BIGINT), decimal arithmetic in ::DOUBLE).

Bitwise float parity (the r10 q_pca_cov / q_dsir_weight lesson): the driver's
value hash sees the BYTES of each float, so `0.0` (Spark round() via
BigDecimal — no signed zero) vs `-0.0` (DuckDB's C round()) hash-mismatches
even though `0.0 == -0.0` and `assert_frame_equal` passes. This comparator
therefore reinterprets every float column as its IEEE-754 bit pattern
(NaN canonicalized, signed zero preserved) BEFORE sorting/comparing, so a
local PASS is bit-equality — the same strength as the driver's hash.

Usage: python tools/verify_local.py <sfDir> <verifyOutDir>
       python tools/verify_local.py --selftest   # proves the dtype gate trips
"""
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def bits(col: pd.Series) -> pd.Series:
    """Reinterpret a float column as its IEEE-754 bit pattern (int64/int32)
    so comparison and sorting are BITWISE: 0.0 != -0.0, NaN canonicalized to
    one quiet-NaN payload. Non-float columns pass through unchanged."""
    if col.dtype == np.float64:
        a = col.to_numpy(dtype=np.float64, copy=True)
        a[np.isnan(a)] = np.float64("nan")  # canonical quiet NaN payload
        return pd.Series(a.view(np.int64), index=col.index, name=col.name)
    if col.dtype == np.float32:
        a = col.to_numpy(dtype=np.float32, copy=True)
        a[np.isnan(a)] = np.float32("nan")
        return pd.Series(a.view(np.int32), index=col.index, name=col.name)
    return col


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = bits(df[c])
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_of(col: pd.Series) -> str:
    """Pre-normalization type label: the pandas dtype, refined for object
    columns by the Python type of the first non-null value so that e.g. a
    HUGEINT that surfaced as object[int] never string-compares equal to a
    genuine object[str] column."""
    if col.dtype != object:
        return str(col.dtype)
    for v in col:
        if v is not None and not (isinstance(v, float) and pd.isna(v)):
            return f"object[{type(v).__name__}]"
    return "object[empty]"


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    """One query's comparison; returns True on pass, prints the verdict."""
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
        return False
    # Exact dtype parity — this is what predicts the driver's value hash.
    # Checked on the PRE-normalization frames: norm() stringifies object
    # columns, which would otherwise let two object columns with different
    # payload types compare as equal strings.
    bad = [(c, dtype_of(g[c]), dtype_of(w[c]))
           for c in g.columns if dtype_of(g[c]) != dtype_of(w[c])]
    g, w = norm(g), norm(w)
    if bad:
        detail = ", ".join(f"{c}: spark={sd} oracle={od}" for c, sd, od in bad)
        print(f"FAIL {name}: dtype mismatch ({detail}) — "
              f"CAST the oracle's final projection (BIGINT/DOUBLE) to match Spark")
        return False
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}")
        return False
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=True)
        print(f"PASS {name} ({len(g)} rows, bitwise)")
        return True
    except AssertionError as e:
        print(f"FAIL {name}: values differ (bitwise — float cols shown as "
              f"IEEE bit patterns): {str(e).splitlines()[-1] if str(e) else e}")
        neq = (g != w) & ~(g.isna() & w.isna())
        rows = neq.any(axis=1)
        print(pd.concat([g[rows].head(3).add_suffix("_spark"),
                         w[rows].head(3).add_suffix("_duck")], axis=1).to_string())
        return False


def oracle_df(con, sql: str) -> pd.DataFrame:
    # Through Arrow, like the driver — HUGEINT/DECIMAL surface as a
    # non-int64 dtype (float64 or object[int] depending on the
    # duckdb/pyarrow version); either way the parity gate trips.
    return con.execute(sql).arrow().to_pandas()


def selftest() -> int:
    """Regression test for the dtype gate itself: a HUGEINT-producing oracle
    against an int64 Spark frame must FAIL (this is the r4 q_mix_sample bug),
    and the CAST-fixed oracle must PASS."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, true), (2, true), (3, false)) v(id, keep)")
    spark_like = pd.DataFrame({"n_kept": pd.array([2], dtype="int64")})
    hugeint = oracle_df(con, "SELECT sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept FROM t")
    fixed = oracle_df(con, "SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept FROM t")
    print("-- selftest: HUGEINT oracle vs int64 spark (must FAIL):")
    tripped = not compare("selftest_hugeint", spark_like, hugeint)
    print("-- selftest: CAST AS BIGINT oracle (must PASS):")
    clean = compare("selftest_cast", spark_like, fixed)
    # Signed-zero gate (the r10 q_pca_cov / q_dsir_weight failure mode):
    # 0.0 vs -0.0 is == -equal and assert_frame_equal-equal, but the driver's
    # hash sees different bytes — the bitwise comparator MUST fail it.
    print("-- selftest: planted -0.0 oracle vs +0.0 spark (must FAIL):")
    pz = pd.DataFrame({"v": np.array([0.0, 1.5], dtype=np.float64)})
    nz = pd.DataFrame({"v": np.array([-0.0, 1.5], dtype=np.float64)})
    zero_tripped = not compare("selftest_signed_zero", pz, nz)
    print("-- selftest: bit-identical floats incl. NaN (must PASS):")
    nan_ok = compare(
        "selftest_nan",
        pd.DataFrame({"v": np.array([0.25, np.nan], dtype=np.float64)}),
        pd.DataFrame({"v": np.array([0.25, np.nan], dtype=np.float64)}))
    ok = tripped and clean and zero_tripped and nan_ok
    print(f"\nselftest {'OK' if ok else 'BROKEN'}: dtype gate "
          f"{'trips on HUGEINT, trips on -0.0, passes on BIGINT/bit-equal floats' if ok else 'did not behave as required'}")
    return 0 if ok else 1


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
            want = oracle_df(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if compare(name, got, want):
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
