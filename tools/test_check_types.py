#!/usr/bin/env python3
"""Self-test for check_types.py's divergence contract (r12 VERDICT #2):
the gate must FAIL a query whose oracle output type diverges from the
Spark result parquet in a way the driver's dtype-sensitive hash
distinguishes, and PASS matched ones.

Builds a throwaway verify dir with four queries:

  1. q_match     — BIGINT both sides                      -> pass
  2. q_hugeint   — oracle uncast sum() (HUGEINT/decimal)
                   vs an int64 "spark" parquet            -> FAIL
                   (the live eval_pr_curve class, r11–r12)
  3. q_decimal   — oracle DECIMAL(2,1) literal vs a double
                   parquet                                -> FAIL
                   (the latent dp_count_release class)
  4. q_list      — list<int> vs list<float>               -> FAIL
                   (the recursion case)

Run: python3 tools/test_check_types.py   (prints OK, exits 0)
"""
import os, sys, json, tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_types  # noqa: E402


def build(root):
    import duckdb
    sf_dir = os.path.join(root, "sf"); os.makedirs(sf_dir)
    out_dir = os.path.join(root, "out")
    con = duckdb.connect()
    con.execute(f"COPY (SELECT 1 AS r_regionkey) TO "
                f"'{sf_dir}/region.parquet' (FORMAT PARQUET)")
    cases = {
        # (oracle_sql, spark_result_sql)
        "q_match": ("SELECT CAST(7 AS BIGINT) AS v",
                    "SELECT CAST(7 AS BIGINT) AS v"),
        "q_hugeint": ("SELECT sum(CAST(7 AS BIGINT)) AS v",  # -> HUGEINT
                      "SELECT CAST(7 AS BIGINT) AS v"),
        "q_decimal": ("SELECT 1.0 AS v",                     # DECIMAL(2,1)
                      "SELECT CAST(1.0 AS DOUBLE) AS v"),
        "q_list": ("SELECT [1, 2] AS v",
                   "SELECT [CAST(1.0 AS DOUBLE), 2.0] AS v"),
    }
    for name, (_, spark_sql) in cases.items():
        d = os.path.join(out_dir, name); os.makedirs(d)
        con.execute(f"COPY ({spark_sql}) TO '{d}/part-0.parquet' "
                    f"(FORMAT PARQUET)")
    with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
        json.dump({k: v[0] for k, v in cases.items()}, f)
    return out_dir, sf_dir


def main():
    with tempfile.TemporaryDirectory() as root:
        out_dir, sf_dir = build(root)
        n_fail = check_types.check(out_dir, sf_dir)
        assert n_fail == 3, f"expected 3 divergences flagged, got {n_fail}"
        n_ok = check_types.check(out_dir, sf_dir, names={"q_match"})
        assert n_ok == 0, f"matched query flagged: {n_ok}"
    print("OK")


if __name__ == "__main__":
    main()
