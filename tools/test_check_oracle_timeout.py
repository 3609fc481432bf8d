#!/usr/bin/env python3
"""Self-test for check_oracle_timeout.py's exit-code contract
(r11 ADVICE medium / r11 VERDICT #3): a query that regresses from PASS
to *hanging* must fail certification (exit 1) unless it is named in the
expected-timeout allowlist.

Builds a throwaway verify dir with two oracles — one trivial PASS and
one injected hang (a 1e8 x 1e8 cross-join count DuckDB cannot finish
inside the 2 s limit) — plus matching "spark result" parquet written by
DuckDB itself, then asserts:

  1. hang NOT allowlisted  -> main() returns 1, TIMEOUT row printed
  2. hang allowlisted      -> main() returns 0

Run: python3 tools/test_check_oracle_timeout.py   (prints OK, exits 0)
"""
import json, os, sys, tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle_timeout as cot  # noqa: E402


def build_fixture(root):
    import duckdb
    sf_dir = os.path.join(root, "sf"); os.makedirs(sf_dir)
    out_dir = os.path.join(root, "out")
    con = duckdb.connect()
    # a minimal table so the view bootstrap has something to mount
    con.execute(f"COPY (SELECT 1 AS r_regionkey) TO "
                f"'{sf_dir}/region.parquet' (FORMAT PARQUET)")
    ok_sql = "SELECT CAST(1 AS BIGINT) AS one"
    hang_sql = ("SELECT count(*) AS c FROM range(100000000) a, "
                "range(100000000) b WHERE a.range + b.range > 1")
    for name, sql in [("q_ok", ok_sql), ("q_hang", hang_sql)]:
        d = os.path.join(out_dir, name); os.makedirs(d)
        # spark-result stand-in: the PASS query's own answer; the hanging
        # query never gets compared, so any 1-row parquet serves
        con.execute(f"COPY ({ok_sql}) TO '{d}/part-0.parquet' "
                    f"(FORMAT PARQUET)")
    with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
        json.dump({"q_ok": ok_sql, "q_hang": hang_sql}, f)
    return out_dir, sf_dir


def main():
    with tempfile.TemporaryDirectory() as root:
        out_dir, sf_dir = build_fixture(root)
        rc_unexpected = cot.main(out_dir, sf_dir, timeout=2, skips=set(),
                                 workers=2, expected_timeouts=set())
        assert rc_unexpected == 1, (
            f"hang outside allowlist must exit 1, got {rc_unexpected}")
        rc_expected = cot.main(out_dir, sf_dir, timeout=2, skips=set(),
                               workers=2, expected_timeouts={"q_hang"})
        assert rc_expected == 0, (
            f"allowlisted hang must exit 0, got {rc_expected}")
    print("OK: unexpected TIMEOUT -> 1, allowlisted TIMEOUT -> 0")
    return 0


if __name__ == "__main__":
    sys.exit(main())
