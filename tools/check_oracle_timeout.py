#!/usr/bin/env python3
"""check_oracle with a per-query timeout — for the full-suite sf1
certification (VERDICT r9 #5), where a handful of DuckDB oracles are
documented as quadratic-by-design at 10x scale (e.g. spatial_radius_join's
O(n^2) distance cross join) and must surface as named TIMEOUT/SKIP rows
instead of hanging the run.

Usage: python3 tools/check_oracle_timeout.py <verify_out_dir> <sf_dir>
         [timeout_sec] [skip1,skip2,...] [workers] [expected_timeout1,...]

Exit code is 0 only when FAIL == 0 AND every TIMEOUT row is named in the
expected-timeout allowlist (r10 ADVICE: a query regressing from PASS to
hanging must fail certification; only pre-declared quadratic-by-design
oracle formulations may time out without failing the run).

Each oracle runs in its own subprocess (DuckDB cannot be interrupted
mid-query from Python, so process kill is the only reliable timeout).
"""
import json, sys, glob, os, multiprocessing as mp


def one(name, out_dir, sf_dir, sql, q):
    # import inside the subprocess: a fresh DuckDB per query
    import duckdb, pandas as pd
    TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(lambda v: tuple(v.tolist())
                                  if hasattr(v, "tolist")
                                  else (tuple(v) if isinstance(v, list) else v))
            if str(df[c].dtype).startswith("float"):
                df[c] = df[c].round(6)
            if "datetime" in str(df[c].dtype):
                df[c] = df[c].astype("datetime64[us]")
        return df.sort_values(by=list(df.columns), kind="mergesort") \
                 .reset_index(drop=True)

    try:
        con = duckdb.connect()
        con.execute("SET threads TO 4")  # 8 workers x 4 threads = 32 cores
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            if glob.glob(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            q.put(("FAIL", "no spark result parquet")); return
        got = norm(con.execute(f"SELECT * FROM read_parquet({files!r})").df())
        want = norm(con.execute(sql).df())
        if list(got.columns) != list(want.columns):
            q.put(("FAIL", f"schema {list(got.columns)} != {list(want.columns)}"))
        elif len(got) != len(want):
            q.put(("FAIL", f"rows {len(got)} != {len(want)}"))
        else:
            try:  # same tolerance as tools/check_oracle.py
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=False,
                    rtol=1e-6, atol=1e-9)
                q.put(("PASS", f"{len(got)} rows"))
            except AssertionError as e:
                q.put(("FAIL", str(e).splitlines()[-1][:200]))
    except Exception as e:
        q.put(("FAIL", str(e)[:200]))


def run_one(args):
    name, out_dir, sf_dir, sql, timeout = args
    q = mp.Queue()
    p = mp.Process(target=one, args=(name, out_dir, sf_dir, sql, q))
    p.start()
    p.join(timeout)
    if p.is_alive():
        p.terminate(); p.join()
        return name, "TIMEOUT", f"oracle exceeded {timeout}s"
    status, msg = q.get() if not q.empty() else ("FAIL", "no result")
    return name, status, msg


def main(out_dir, sf_dir, timeout, skips, workers, expected_timeouts):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    counts = {"PASS": 0, "FAIL": 0, "TIMEOUT": 0, "SKIP": 0}
    unexpected_timeouts = []
    work = []
    for name in sorted(oracle):
        if name in skips:
            print(f"SKIP {name}: named skip", flush=True)
            counts["SKIP"] += 1
        else:
            work.append((name, out_dir, sf_dir, oracle[name], timeout))
    # a thread pool of process-babysitters: heavy/timeout oracles overlap
    # instead of serializing (the serial run projected to hours at sf1)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for name, status, msg in ex.map(run_one, work):
            if status == "TIMEOUT" and name not in expected_timeouts:
                unexpected_timeouts.append(name)
            print(f"{status} {name}: {msg}", flush=True)
            counts[status] += 1
    print(f"\n{counts['PASS']} pass / {counts['FAIL']} fail / "
          f"{counts['TIMEOUT']} timeout / {counts['SKIP']} skip")
    if unexpected_timeouts:
        print(f"UNEXPECTED TIMEOUTS (not in allowlist): "
              f"{','.join(sorted(unexpected_timeouts))}")
    return 0 if counts["FAIL"] == 0 and not unexpected_timeouts else 1


if __name__ == "__main__":
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    skips = set(s for s in (sys.argv[4].split(",") if len(sys.argv) > 4
                            else []) if s)
    workers = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    expected_timeouts = set(s for s in (sys.argv[6].split(",")
                            if len(sys.argv) > 6 else []) if s)
    sys.exit(main(out_dir, sf_dir, timeout, skips, workers,
                  expected_timeouts))
