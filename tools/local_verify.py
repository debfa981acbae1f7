#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
scale-factor tables, loads the corresponding Spark result parquet written by
`graft.Verify`, sorts columns by name (mirroring the driver's compare), and
diffs values. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    import datetime
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_noracle = 0
    result_dirs = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in result_dirs:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark result files")
            n_fail += 1
            continue
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(spark_df)} rows)")
            n_noracle += 1
            continue
        try:
            oracle_df = norm(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(oracle_df.columns):
            print(f"FAIL  {name}: columns {list(spark_df.columns)} "
                  f"vs oracle {list(oracle_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(oracle_df):
            print(f"FAIL  {name}: {len(spark_df)} rows vs oracle {len(oracle_df)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(spark_df, oracle_df,
                                          check_dtype=False, check_exact=True)
            print(f"PASS  {name} ({len(spark_df)} rows)")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")[0:6]
            print(f"FAIL  {name}: value mismatch:\n  " + "\n  ".join(msg))
            # show first differing rows for debugging
            neq = (spark_df != oracle_df) & ~(spark_df.isna() & oracle_df.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  spark :", spark_df.loc[i].to_dict())
                print("  oracle:", oracle_df.loc[i].to_dict())
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
