#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
against the same testdata parquet tables and compare (columns sorted by name,
rows sorted, floats rounded).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # lists/arrays -> tuples so they sort/compare
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                              else (tuple(v) if isinstance(v, list) else v))
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. GenScale sf1)
            p = f"{p}/*.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, rtol=1e-6, atol=1e-9)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1]}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    # Type-parity gate (VERDICT r12 #2): the value compare above runs with
    # check_dtype=False, so an oracle whose OUTPUT TYPE diverges from the
    # Spark parquet (HUGEINT vs int64, decimal vs double) passes here yet
    # fails the driver's dtype-sensitive hash. Run the Arrow-schema gate on
    # the same dirs so certification can't miss the class.
    import check_types
    n_type_fail = check_types.check(out_dir, sf_dir)
    sys.exit(1 if (n_fail or n_type_fail) else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
