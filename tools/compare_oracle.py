#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet result written by graft.Verify,
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB
(with every parquet table in <sfDir> registered as a view), sorts columns
by name and rows by all values, and reports per-query match/mismatch.
"""
import json
import math
import sys
import warnings

warnings.filterwarnings("ignore")

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize tz-aware → naive UTC for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64tz_dtype(df[c]):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), na_position="last")
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=0, abs_tol=0) or a == b
        except (TypeError, ValueError):
            return False
    return a == b


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracle:
            status = "ROWS_ONLY" + ("(EMPTY!)" if len(spark_df) == 0 else "")
            if len(spark_df) == 0:
                n_fail += 1
            else:
                n_rows_only += 1
            print(f"{name}: {status} rows={len(spark_df)}")
            continue
        try:
            ora_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE_SQL_ERROR {e}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(ora_df)
        if list(s.columns) != list(o.columns):
            print(f"{name}: COLUMN_MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"{name}: ROWCOUNT_MISMATCH spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        # Dtype strictness: the driver hashes rendered values, so a Spark
        # int64 column vs an oracle float64 column (e.g. DuckDB HUGEINT from
        # a windowed sum(BIGINT), pandas-rendered as 3.0 vs Spark's 3) is a
        # driver-level FAIL even when isclose says the values match. Enforce
        # the CAST-to-BIGINT convention here so it can't reach the driver.
        dt_bad = None
        for c in s.columns:
            si = pd.api.types.is_integer_dtype(s[c])
            oi = pd.api.types.is_integer_dtype(o[c])
            sf = pd.api.types.is_float_dtype(s[c])
            of = pd.api.types.is_float_dtype(o[c])
            if (si and of) or (sf and oi):
                dt_bad = (c, s[c].dtype, o[c].dtype)
                break
        if dt_bad:
            c, sd, od = dt_bad
            print(f"{name}: DTYPE_MISMATCH col={c} spark={sd} oracle={od}"
                  " (int-vs-float: the driver hash WILL differ; CAST the"
                  " oracle column to BIGINT)")
            n_fail += 1
            continue
        bad = None
        for c in s.columns:
            sv, ov = s[c].tolist(), o[c].tolist()
            for i, (x, y) in enumerate(zip(sv, ov)):
                if not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"{name}: VALUE_MISMATCH col={c} row={i} spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"{name}: PASS rows={len(s)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
