#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query
result parquet dumped by graft.Verify, run the corresponding oracle SQL
in DuckDB over the same scale-factor tables and compare (columns sorted
by name, rows sorted, bit-exact after -0.0 -> +0.0). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def _canon_scalar(v):
    # -0.0 -> +0.0 so signed zero can't hide a bit-level mismatch the
    # driver's hash gate WOULD see (r6 lesson: emb_covariance).
    if isinstance(v, (float, np.floating)):
        return float(v) + 0.0
    if isinstance(v, (list, np.ndarray)):
        return tuple(_canon_scalar(x) for x in v)
    return v

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == np.float64 or df[c].dtype == np.float32:
            df[c] = df[c] + 0.0  # -0.0 -> +0.0, every other value identical
        # normalize timestamps to tz-naive us
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].apply(_canon_scalar)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "EMPTY_SPARK_OUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if list(spark_df.columns) == ["__verify_error"]:
            results[name] = "VERIFY_ERR " + str(spark_df.iloc[0, 0])[:200]
            continue
        if name not in oracle:
            results[name] = f"NO_ORACLE rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_ERR {str(e)[:120]}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"COLS spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"NROWS spark={len(a)} duck={len(b)}"
        else:
            try:
                # Bit-faithful, like the driver's hash gate: exact
                # equality after signed-zero canonicalization. The old
                # rtol=1e-6 compare masked the r6 -0.0 miss locally.
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                results[name] = "OK"
            except AssertionError as e:
                results[name] = "DIFF " + str(e).replace("\n", " | ")[:300]
    # Loss-proofing: every oracle key must have produced an output dir.
    if not only:
        for name in oracle:
            if name not in results:
                results[name] = "MISSING_SPARK_OUT"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "FAIL ") + k + ("" if v == "OK" else "  :: " + v))
    print(f"== {ok}/{len(results)} OK")

if __name__ == "__main__":
    main()
